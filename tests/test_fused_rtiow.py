"""Fused RTIOW kernel (offline + NPPT stages) vs the XLA scan engine.

Same pcg4d streams per (pixel, sample, bounce), equal-spp semantics: the
fused result matches ``models.offline.render`` / ``models.nppt.render``
to fp-reassociation tolerance.
"""

import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import nppt, offline
from cpu_based_ray_tracer_tpu.ops import fused_rtiow
from cpu_based_ray_tracer_tpu.scenes import rtiow
from cpu_based_ray_tracer_tpu.utils import rng


def test_fused_offline_matches_scan():
    scene = rtiow.offline_two_sphere_scene()
    cam = rtiow.offline_camera(48 / 32)
    cfg = RenderConfig(width=48, height=32, spp=4, max_depth=8)
    key = rng.render_key(3)
    ref = np.asarray(offline.render(scene, cam, cfg, key))
    got = np.asarray(fused_rtiow.render_fused(scene, cam, cfg, key))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_fused_offline_dof_matches_scan():
    # aperture > 0 exercises the in-kernel lens-disk sample
    scene = rtiow.offline_two_sphere_scene()
    cam = rtiow.offline_camera(32 / 32, aperture=0.4)
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=6)
    key = rng.render_key(5)
    ref = np.asarray(offline.render(scene, cam, cfg, key))
    got = np.asarray(fused_rtiow.render_fused(scene, cam, cfg, key))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_fused_nppt_matches_scan():
    # NPPT scene: 6 spheres incl the hollow-glass bubble (negative radius),
    # perspective camera mode.
    scene = rtiow.nppt_scene()
    cam = rtiow.nppt_camera()
    cfg = RenderConfig(width=40, height=32, spp=3, max_depth=8)
    key = rng.render_key(7)
    ref = np.asarray(nppt.render(scene, cam, cfg, key))
    got = np.asarray(fused_rtiow.render_fused(scene, cam, cfg, key))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_fused_offline_diffuse_models_match_scan():
    # The IN_SPHERE / IN_HEMISPHERE static branches (Diffuse.h:29-35,
    # runtime-switchable in the NPPT stage).
    from cpu_based_ray_tracer_tpu.scene import (DIFFUSE_IN_HEMISPHERE,
                                                DIFFUSE_IN_SPHERE)

    scene = rtiow.offline_two_sphere_scene()
    cam = rtiow.offline_camera(1.0)
    key = rng.render_key(11)
    for model in (DIFFUSE_IN_SPHERE, DIFFUSE_IN_HEMISPHERE):
        cfg = RenderConfig(width=24, height=24, spp=2, max_depth=4,
                           diffuse_model=model)
        ref = np.asarray(offline.render(scene, cam, cfg, key))
        got = np.asarray(fused_rtiow.render_fused(scene, cam, cfg, key))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"diffuse model {model}")

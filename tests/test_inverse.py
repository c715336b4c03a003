"""Inverse rendering actually converges (VERDICT r2 item 7).

The gradient tests (test_grad.py) pin single-step correctness vs finite
differences; these pin the CAPABILITY: Adam through the differentiable MC
estimator recovers Cornell albedos / light emission from a target image —
loss drops >= 10x and the parameters land near truth.
"""

import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import inverse, monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def _setup(size=24, spp=2, depth=3):
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=size, height=size, spp=spp, max_depth=depth,
                       rr_survival=0.8)
    key = rng.render_key(0)
    target = monte_carlo.render(scene, cam, cfg, key)
    return scene, cam, cfg, key, target


def test_albedo_recovery_converges():
    scene, cam, cfg, key, target = _setup()
    res = inverse.recover_albedo(scene, cam, cfg, key, target, n_steps=60,
                                 lr=0.2)
    losses = np.asarray(res.losses)
    assert losses[-1] < losses[0] / 10.0, (losses[0], losses[-1])
    true_alb = np.asarray(scene.materials.albedo)
    got = np.asarray(res.params)
    free = ~np.asarray(scene.materials.emissive)
    # The red/green/white walls must come back (common-random-numbers make
    # the optimum exact; tolerance covers finite-step optimization).
    err = np.abs(true_alb - got)[free]
    assert err.max() < 0.08, f"albedo err {err.max():.3f}"


def test_emission_recovery_converges():
    scene, cam, cfg, key, target = _setup()
    res = inverse.recover_emission(scene, cam, cfg, key, target, n_steps=50,
                                   lr=0.3)
    losses = np.asarray(res.losses)
    assert losses[-1] < losses[0] / 10.0
    true_em = np.asarray(scene.materials.emission)
    got = np.asarray(res.params)
    em = np.asarray(scene.materials.emissive)
    rel = (np.abs(true_em - got) / np.maximum(true_em, 1.0))[em]
    assert rel.max() < 0.15, f"emission rel err {rel.max():.3f}"

"""Initial-framework + NPPT stage renders."""

import jax
import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import initial, nppt
from cpu_based_ray_tracer_tpu.scenes import initial_scene, rtiow
from cpu_based_ray_tracer_tpu.utils import rng


def test_initial_stage_render():
    scene, cam = initial_scene.initial_scene(), initial_scene.initial_camera()
    cfg = RenderConfig(width=64, height=48, spp=2)
    img = np.asarray(jax.jit(
        lambda k: initial.render(scene, cam, cfg, k))(rng.render_key(0)))
    assert np.isfinite(img).all()
    # Sky corners (0.6, 0.7, 0.9).
    np.testing.assert_allclose(img[0, 0], (0.6, 0.7, 0.9), atol=1e-5)
    # Magenta sphere in the center: red+blue dominate green.
    c = img[24, 32]
    assert c[0] > c[1] and c[2] > c[1]


def test_initial_energy_bounded():
    """Energy halves each bounce; 5 bounces of full albedo + sky cap the
    pixel value at sum(0.5^k) + 0.5^4 * |sky| < 3."""
    scene, cam = initial_scene.initial_scene(), initial_scene.initial_camera()
    cfg = RenderConfig(width=32, height=24, spp=1)
    img = np.asarray(initial.render(scene, cam, cfg, rng.render_key(1)))
    assert img.max() < 3.0


def test_nppt_stage_render():
    scene, cam = rtiow.nppt_scene(), rtiow.nppt_camera()
    cfg = RenderConfig(width=64, height=48, spp=4, max_depth=8)
    img = np.asarray(jax.jit(
        lambda k: nppt.render(scene, cam, cfg, k))(rng.render_key(0)))
    assert np.isfinite(img).all()
    # Sky gradient at the top corner (white->blue lerp on ray.y; the top
    # CENTER hits the floating glass sphere at the reference's vfov 35).
    assert img[0, 2, 2] >= img[0, 2, 0]
    u8 = np.asarray(nppt.render_u8(scene, cam, cfg, rng.render_key(0)))
    assert u8.dtype == np.uint8


def test_nppt_progressive_matches_oneshot():
    """Two 2-sample progressive passes == one 4-sample render (the
    accumulation counter semantics, Renderer.cpp:118-134)."""
    import jax.numpy as jnp
    scene, cam = rtiow.nppt_scene(), rtiow.nppt_camera()
    key = rng.render_key(3)
    cfg4 = RenderConfig(width=24, height=18, spp=4, max_depth=4)
    cfg2 = cfg4.replace(spp=2)
    one = np.asarray(nppt.render(scene, cam, cfg4, key))
    acc = jnp.zeros((18, 24, 3), jnp.float32)
    acc, nxt = nppt.render_progressive(scene, cam, cfg2, key, acc, 0)
    acc, nxt = nppt.render_progressive(scene, cam, cfg2, key, acc, nxt)
    np.testing.assert_allclose(np.asarray(acc) / 4.0, one, atol=1e-6)

"""End-to-end offline prototype slice: render, PPM round-trip, convergence."""

import io

import jax
import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import offline
from cpu_based_ray_tracer_tpu.scenes import rtiow
from cpu_based_ray_tracer_tpu.utils import image as image_io
from cpu_based_ray_tracer_tpu.utils import rng


def _render(scene, cam, cfg, seed=0):
    key = rng.render_key(seed)
    fn = jax.jit(lambda: offline.render(scene, cam, cfg, key))
    return np.asarray(fn())


def test_offline_two_sphere_smoke():
    cfg = RenderConfig(width=80, height=45, spp=4, max_depth=8)
    img = _render(rtiow.offline_two_sphere_scene(), rtiow.offline_camera(80 / 45),
                  cfg)
    assert img.shape == (45, 80, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # Sky gradient at the top, sphere colors visible: blue on the left half,
    # red on the right half (main.cpp scene).
    h, w, _ = img.shape
    left = img[h // 2, w // 4]
    right = img[h // 2, 3 * w // 4]
    assert left[2] > left[0]    # blue sphere dominates blue channel
    assert right[0] > right[2]  # red sphere dominates red channel


def test_offline_deterministic():
    cfg = RenderConfig(width=40, height=24, spp=2, max_depth=4)
    scene, cam = rtiow.rtiow_classic_scene(), rtiow.offline_camera(40 / 24)
    a = _render(scene, cam, cfg, seed=7)
    b = _render(scene, cam, cfg, seed=7)
    np.testing.assert_array_equal(a, b)


def test_offline_spp_convergence():
    """More samples converge toward the high-SPP mean (MC consistency)."""
    scene, cam = rtiow.offline_two_sphere_scene(), rtiow.offline_camera(1.0)
    base = RenderConfig(width=24, height=24, max_depth=6)
    ref = _render(scene, cam, base.replace(spp=256), seed=1)
    lo = _render(scene, cam, base.replace(spp=8), seed=2)
    hi = _render(scene, cam, base.replace(spp=64), seed=3)
    err_lo = np.abs(lo - ref).mean()
    err_hi = np.abs(hi - ref).mean()
    assert err_hi < err_lo


def test_ppm_roundtrip(tmp_path):
    cfg = RenderConfig(width=16, height=9, spp=1, max_depth=2)
    key = rng.render_key(0)
    u8 = np.asarray(offline.render_u8(rtiow.offline_two_sphere_scene(),
                                      rtiow.offline_camera(16 / 9), cfg, key))
    p = tmp_path / "out.ppm"
    image_io.write_ppm(p, u8)
    back = image_io.read_ppm(p)
    np.testing.assert_array_equal(u8, back)
    # Header matches the reference's exactly (main.cpp:130-132).
    buf = io.StringIO()
    image_io.write_ppm(buf, u8)
    assert buf.getvalue().startswith("P3\n16 9\n255\n")


def test_dielectric_bubble_scene_finite():
    cfg = RenderConfig(width=32, height=18, spp=4, max_depth=16)
    img = _render(rtiow.rtiow_classic_scene(), rtiow.offline_camera(32 / 18),
                  cfg)
    assert np.isfinite(img).all()
    assert img.max() <= 1.5  # sky-lit scene stays near [0,1]

"""Parity gates: the fused Pallas wavefront kernel vs the XLA stepper.

The fused kernel (``ops.fused``) re-implements ``monte_carlo._bounce_step``
+ ``wavefront_steps`` inside one Pallas program.  Because both consume the
same counter-based pcg4d streams, every *decision* (hit, RR coin, sample
advance) must agree lane-for-lane: the integer state (sample index, bounce
index, completed-sample count) and the honest ray counter are compared
EXACTLY; float state only differs by fp reassociation.

Runs on the CPU backend through the Pallas interpreter (``interpret=True``
is the kernel's off-TPU default) — same kernel semantics, no TPU needed.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def _parity(cfg: RenderConfig, n_steps: int, seed: int = 7):
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    key = rng.render_key(seed)
    fs = fused.pack_scene(scene)
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    ref = mc.wavefront_steps(scene, cam, cfg, key, st0, n_steps)
    got = fused.wavefront_steps_fused(fs, cam, cfg, key, st0, n_steps)
    for name in ("s", "b", "n_done"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_array_equal(a, b, err_msg=f"integer state {name}")
    assert int(ref.nrays) == int(got.nrays)
    for name in ("tp", "cur", "acc"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=f"float state {name}")
    return ref, got


def test_fused_parity_cornell():
    cfg = RenderConfig(width=48, height=48, spp=4, max_depth=4,
                       rr_survival=0.8)
    _parity(cfg, n_steps=6)


def test_fused_parity_padded_lanes():
    # 41x37 = 1517 lanes — not a multiple of the 4096-lane tile: the wrapper
    # pads with out-of-range pixels whose lanes must not perturb counters.
    cfg = RenderConfig(width=41, height=37, spp=2, max_depth=3,
                       rr_survival=0.5)
    ref, got = _parity(cfg, n_steps=4)
    assert int(got.nrays) > 0


def test_fused_image_converges_like_xla():
    # Equal-step runs of both engines produce the same progressive image.
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=6,
                       rr_survival=0.8)
    key = rng.render_key(3)
    fs = fused.pack_scene(scene)
    st = mc.wavefront_init(scene, cam, cfg, key)
    st_x = mc.wavefront_steps(scene, cam, cfg, key, st, 12)
    st_f = fused.wavefront_steps_fused(fs, cam, cfg, key, st, 12)
    np.testing.assert_array_equal(np.asarray(st_x.n_done),
                                  np.asarray(st_f.n_done))
    a = np.asarray(mc.wavefront_image(st_x, cfg))
    b = np.asarray(mc.wavefront_image(st_f, cfg))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_fused_rejects_soft_shadow_mode():
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, soft_shadow_beta=0.05)
    key = rng.render_key(0)
    fs = fused.pack_scene(scene)
    st = mc.wavefront_init(scene, cam, cfg, key)
    with pytest.raises(NotImplementedError):
        fused.wavefront_steps_fused(fs, cam, cfg, key, st, 1)


def test_pack_scene_light_subset_matches_sampler():
    # The packed emissive CDF/total must equal the full-N masked cumsum the
    # XLA sampler uses (fp-exact; see pack_scene docstring).
    scene = cornell.cornell_scene()
    fs = fused.pack_scene(scene)
    tr, mats = scene.triangles, scene.materials
    emissive_tri = np.asarray(mats.emissive)[np.asarray(tr.material)]
    areas = np.where(emissive_tri, np.asarray(tr.area), np.float32(0.0))
    cdf_full = np.cumsum(areas.astype(np.float32), dtype=np.float32)
    assert fs.n_light == int(emissive_tri.sum())
    np.testing.assert_array_equal(
        np.asarray(fs.light[:, 15]), cdf_full[emissive_tri])
    np.testing.assert_array_equal(np.asarray(fs.sky[6]), cdf_full[-1])


def test_fused_single_sample_gbuffer_parity():
    """Single-path mode = the scan engine's equal-spp 1-sample estimator +
    the Denoiser G-buffer, from the fused kernel (VERDICT r3 next #3)."""
    import jax.numpy as jnp

    from cpu_based_ray_tracer_tpu.models import denoiser as dn

    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=48, height=48, spp=1, max_depth=6,
                       rr_survival=0.8)
    key = rng.render_key(5)
    fs = fused.pack_scene(scene)
    c, p, n, pid, con = fused.single_sample_gbuffer(fs, cam, cfg, key, 3)
    g = dn.render_gbuffer(scene, cam, cfg, key, 3, immediate_clamping=False)
    h = w = 48
    np.testing.assert_allclose(np.asarray(c).reshape(h, w, 3),
                               np.asarray(g.color), rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(pid).reshape(h, w),
                                  np.asarray(g.prim_id))
    np.testing.assert_array_equal(np.asarray(con).reshape(h, w),
                                  np.asarray(g.contributor))
    np.testing.assert_allclose(np.asarray(p).reshape(h, w, 3),
                               np.asarray(g.world_pos), rtol=1e-4, atol=1e-4)
    # Normals only matter where the contributor flag is set (the fused
    # kernel zeroes them on miss; assemble_hit leaves a defined-but-unused
    # value there; every consumer masks by contributor).
    mask = np.asarray(g.contributor)
    np.testing.assert_allclose(
        np.asarray(n).reshape(h, w, 3)[mask],
        np.asarray(g.normal)[mask], rtol=1e-4, atol=1e-4)
    # Equal-spp: exactly one completed sample per pixel.
    # (n_done is internal; the color parity above is the observable gate.)


def test_fused_single_sample_distinct_frames_differ():
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=1, max_depth=5,
                       rr_survival=0.8)
    key = rng.render_key(1)
    fs = fused.pack_scene(scene)
    c0, *_ = fused.single_sample_gbuffer(fs, cam, cfg, key, 0)
    c1, *_ = fused.single_sample_gbuffer(fs, cam, cfg, key, 1)
    assert np.abs(np.asarray(c0) - np.asarray(c1)).max() > 1e-3


def test_fused_equal_spp_matches_scan_engine():
    """stop_after mode: the fused kernel's EXACT fixed-spp estimator
    (advisor r3: render_turbo's equal-time stop rule carries a small
    stopping-time bias; this mode has none)."""
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=3, max_depth=5,
                       rr_survival=0.8)
    key = rng.render_key(8)
    ref = np.asarray(mc.render(scene, cam, cfg, key))
    got = np.asarray(mc.render_turbo_exact(scene, cam, cfg, key))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

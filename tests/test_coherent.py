"""Parity gates for the shortlist intersector (ops.coherent) and the
method="fused" Whitted mesh route.

The shortlist machinery (mask pass -> per-tile cluster work list ->
scalar-prefetched sweep) must agree with exact dense brute force on every
ray — a cluster missing from a shortlist would show up as a hole in the
image, so the gate is exact winner agreement, not a tolerance.
"""

import numpy as np

import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model
from cpu_based_ray_tracer_tpu.ops import coherent, intersect
from cpu_based_ray_tracer_tpu.scenes import meshes


def _scene():
    return meshes.bvh_stage_scene(subdivisions=2)


def test_nearest_matches_brute():
    scene = _scene()
    pack = coherent.pack_coherent(scene, cluster_size=64)
    cam = meshes.bvh_stage_camera()
    cfg = RenderConfig(width=40, height=30)
    d = cam_mod.perspective_rays(cam, cfg.width, cfg.height).reshape(-1, 3)
    o = jnp.broadcast_to(cam.position, d.shape)
    tt, idx = coherent.nearest(pack.tri, pack.aabb, o, d,
                               n_cl=pack.aabb.shape[0], cs=pack.cs,
                               t_min=1e-3, interpret=True)
    tm = intersect.triangle_t_matrix(o, d, scene.triangles.v0,
                                     scene.triangles.e1,
                                     scene.triangles.e2,
                                     1e-3, np.inf)
    t_ref = np.asarray(jnp.min(tm, -1))
    idx_ref = np.asarray(jnp.argmin(tm, -1))
    hit = t_ref < 1e30
    np.testing.assert_allclose(np.asarray(tt)[hit], t_ref[hit], rtol=2e-6)
    assert (np.asarray(tt)[~hit] >= intersect.NO_HIT_T).all()
    # winner identity (modulo exact ties, which argmin breaks differently)
    got_idx = np.asarray(idx)
    diff = hit & (got_idx != idx_ref)
    assert diff.mean() < 0.002, f"winner mismatch on {diff.sum()} rays"


def test_fused_render_matches_packet():
    scene = _scene()
    cam = meshes.bvh_stage_camera()
    cfg = RenderConfig(width=48, height=36, whitted_depth=3)
    img_f = np.asarray(mesh_model.render(
        mesh_model.prepare(scene, method="fused", cluster_size=64),
        cam, cfg))
    img_p = np.asarray(mesh_model.render(
        mesh_model.prepare(scene, method="brute"), cam, cfg))
    np.testing.assert_allclose(img_f, img_p, rtol=1e-4, atol=1e-5)


def test_fused_capacity_guard():
    scene = _scene()
    pack = coherent.pack_coherent(scene, cluster_size=128)
    assert coherent.fits_resident(pack)
    big = pack._replace(
        tri=jnp.zeros((4000, 128 * 16 // 128, 128), jnp.float32),
        aabb=jnp.zeros((4000, 8), jnp.float32))
    assert not coherent.fits_resident(big)

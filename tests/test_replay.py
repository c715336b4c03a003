"""Record/replay differentiable rendering (``monte_carlo.render_replay``).

The replay engine must be a *drop-in* for ``render`` on the forward pass
(bit-identical image — the hit reconstruction twins are arithmetic-exact)
while its gradient graph contains no (R, N) intersection producer.  Its
gradients must EQUAL the standard detached-traversal gradients: the
standard path's min/argmin VJP routes each lane's cotangent to exactly the
winner's t-matrix entry, which is the same function of the same winner data
the replay differentiates (reference estimator: Monte Carlo Path Tracer
Renderer.cpp:136-214 — forward-only there; gradients are ours).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh, monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


CFG = RenderConfig(width=48, height=48, spp=2, max_depth=6)
KEY = rng.render_key(7)


@pytest.fixture(scope="module")
def scene_cam():
    return cornell.cornell_scene(), cornell.cornell_camera()


def _assert_images_match(a, b):
    """Bit-exact on TPU.  On XLA:CPU the two programs' *shading* math gets
    different fma-contraction choices (the reconstruction itself is exact —
    see test_replay_hit_reconstruction_bit_exact), leaving last-ulp drift;
    gate at ulp-level tolerance there."""
    a, b = np.asarray(a), np.asarray(b)
    if jax.default_backend() == "cpu":
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=4e-6)
    else:
        np.testing.assert_array_equal(a, b)


def test_replay_image_bit_exact(scene_cam):
    """Forward replay == standard render (Cornell: triangles + the bubble
    sphere exercise both winner-t recompute twins)."""
    scene, camera = scene_cam
    a = monte_carlo.render(scene, camera, CFG, KEY)
    b = monte_carlo.render_replay(scene, camera, CFG, KEY)
    _assert_images_match(a, b)


def test_replay_hit_reconstruction_bit_exact(scene_cam):
    """hit_from_record reconstructs intersect_scene's Hit exactly from the
    (prim, is_triangle, hit) trio — every field, including the recomputed
    winner t."""
    from cpu_based_ray_tracer_tpu.ops import intersect

    scene, camera = scene_cam
    cfg = CFG
    seed = rng.seed_from_key(KEY)
    o, d, pixel = monte_carlo._primary_rays(camera, cfg, seed, 0)
    live = intersect.intersect_scene(scene, o, d, t_min=cfg.t_min)
    rec = intersect.hit_from_record(scene, o, d, live.prim, live.is_triangle,
                                    live.hit, cfg.t_min)
    for f in ("t", "hit", "is_triangle", "prim", "material", "point",
              "geom_normal", "front", "uv"):
        np.testing.assert_array_equal(
            np.asarray(getattr(live, f)), np.asarray(getattr(rec, f)), err_msg=f)


def _grad_pair(scene, camera, field_path, value_fn):
    """(standard grad, replay grad) of mean-square image w.r.t. one leaf."""
    def make_loss(render_fn):
        def loss(x):
            s = value_fn(scene, x)
            return jnp.mean(render_fn(s, camera, CFG, KEY) ** 2)
        return loss
    x0 = field_path(scene)
    g_std = jax.grad(make_loss(monte_carlo.render))(x0)
    g_rep = jax.grad(make_loss(monte_carlo.render_replay))(x0)
    return np.asarray(g_std), np.asarray(g_rep)


def test_replay_grads_equal_materials(scene_cam):
    scene, camera = scene_cam
    g_std, g_rep = _grad_pair(
        scene, camera, lambda s: s.materials.albedo,
        lambda s, x: dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, albedo=x)))
    assert np.any(g_std != 0.0)
    np.testing.assert_allclose(g_rep, g_std, rtol=1e-5, atol=1e-8)


def test_replay_grads_equal_emission(scene_cam):
    scene, camera = scene_cam
    g_std, g_rep = _grad_pair(
        scene, camera, lambda s: s.materials.emission,
        lambda s, x: dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, emission=x)))
    assert np.any(g_std != 0.0)
    np.testing.assert_allclose(g_rep, g_std, rtol=1e-5, atol=1e-8)


def test_replay_grads_equal_geometry(scene_cam):
    """Triangle-vertex gradients (light + walls move): the winner-t
    recompute twin must carry the same geometry cotangents the t-matrix
    min VJP does."""
    scene, camera = scene_cam
    g_std, g_rep = _grad_pair(
        scene, camera, lambda s: s.triangles.v0,
        lambda s, x: dataclasses.replace(
            s, triangles=dataclasses.replace(s.triangles, v0=x)))
    assert np.any(g_std != 0.0)
    scale = np.max(np.abs(g_std))
    np.testing.assert_allclose(g_rep, g_std, rtol=1e-4, atol=1e-6 * scale)


def test_replay_grads_equal_sphere(scene_cam):
    """Sphere-center gradients through the near/far-root recompute twin
    (Cornell's only sphere is the unhittable radius-0 pad, so add a real
    diffuse sphere where the tall box stands)."""
    from cpu_based_ray_tracer_tpu import scene as scene_mod

    scene, camera = scene_cam
    scene = dataclasses.replace(scene, spheres=scene_mod.make_spheres(
        [[3.7, 1.2, 3.5]], [1.2], [int(scene.triangles.material[0])]))
    g_std, g_rep = _grad_pair(
        scene, camera, lambda s: s.spheres.center,
        lambda s, x: dataclasses.replace(
            s, spheres=dataclasses.replace(s.spheres, center=x)))
    assert np.any(g_std != 0.0)
    scale = np.max(np.abs(g_std))
    np.testing.assert_allclose(g_rep, g_std, rtol=1e-4, atol=1e-6 * scale)


def test_replay_fd_validates_albedo(scene_cam):
    """Finite differences on a single albedo channel through the REPLAY
    engine itself (not just equality with the standard path)."""
    scene, camera = scene_cam

    def loss(a_scalar):
        albedo = scene.materials.albedo.at[2, 0].set(a_scalar)
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials,
                                                 albedo=albedo))
        return jnp.mean(monte_carlo.render_replay(s, camera, CFG, KEY))

    x0 = scene.materials.albedo[2, 0]
    g = jax.grad(loss)(x0)
    eps = 1e-3
    fd = (loss(x0 + eps) - loss(x0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd),
                               rtol=2e-2, atol=1e-7)


def test_replay_mesh_record_pass():
    """The index pass can run through the accelerated mesh intersectors —
    even the NON-differentiable production kernels, since it is stop-grad —
    while the replay stays O(R): image equals the standard accelerated
    render bit-exactly and material grads flow through the replay."""
    from cpu_based_ray_tracer_tpu.scenes import meshes

    msc = cornell.cornell_mesh_scene(meshes.icosphere(1, radius=1.0))
    mcam = cornell.cornell_camera()
    bundle = mesh.prepare(msc, method="packet", cluster_size=64)
    isect = mesh.make_intersect_fn(bundle)
    near = mesh.make_nearest_t_fn(bundle)
    cfg = RenderConfig(width=32, height=32, spp=1, max_depth=4)
    a = monte_carlo.render(msc, mcam, cfg, KEY,
                           intersect_fn=isect, nearest_t_fn=near)
    b = monte_carlo.render_replay(msc, mcam, cfg, KEY,
                                  intersect_fn=isect, nearest_t_fn=near)
    _assert_images_match(a, b)

    def loss(albedo):
        s = dataclasses.replace(
            msc, materials=dataclasses.replace(msc.materials, albedo=albedo))
        return jnp.mean(monte_carlo.render_replay(
            s, mcam, cfg, KEY, intersect_fn=isect, nearest_t_fn=near) ** 2)

    g = jax.grad(loss)(msc.materials.albedo)
    assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)


def test_replay_guards():
    scene, camera = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = dataclasses.replace(CFG, soft_shadow_beta=0.05)
    with pytest.raises(AssertionError):
        monte_carlo.render_replay(scene, camera, cfg, KEY)

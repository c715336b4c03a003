"""Unit tests: intersection kernels vs closed form and brute-force numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.ops import intersect
from cpu_based_ray_tracer_tpu.scene import (LAMBERT, MaterialBuilder,
                                            make_scene, make_spheres,
                                            make_triangles)


def test_sphere_hit_closed_form():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect.intersect_spheres(o, d, jnp.array([[0.0, 0.0, -3.0]]),
                                    jnp.array([1.0]), 1e-3, jnp.inf)
    np.testing.assert_allclose(np.asarray(t)[0, 0], 2.0, rtol=1e-6)


def test_sphere_inside_far_root():
    # Ray starting inside the sphere must take the far root
    # (Sphere.cpp near-then-far selection).
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect.intersect_spheres(o, d, jnp.array([[0.0, 0.0, -3.0]]),
                                    jnp.array([1.0]), 1e-3, jnp.inf)
    np.testing.assert_allclose(np.asarray(t)[0, 0], 1.0, rtol=1e-6)


def test_sphere_zero_radius_never_hits():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect.intersect_spheres(o, d, jnp.array([[0.0, 0.0, -3.0]]),
                                    jnp.array([0.0]), 1e-3, jnp.inf)
    assert np.asarray(t)[0, 0] == intersect.NO_HIT_T


def test_triangle_hit_barycentric():
    v = np.array([[[0, 0, -1], [1, 0, -1], [0, 1, -1]]], np.float64)
    tr = make_triangles(v, np.array([0]))
    o = jnp.array([[0.2, 0.3, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, 1e-3, jnp.inf)
    _, b1, b2 = intersect.moller_trumbore_single(o, d, tr.v0, tr.e1, tr.e2)
    np.testing.assert_allclose(np.asarray(t)[0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b1)[0], 0.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2)[0], 0.3, atol=1e-6)


def test_triangle_miss_outside():
    v = np.array([[[0, 0, -1], [1, 0, -1], [0, 1, -1]]], np.float64)
    tr = make_triangles(v, np.array([0]))
    o = jnp.array([[0.9, 0.9, 0.0]])  # outside the hypotenuse
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, 1e-3, jnp.inf)
    assert np.asarray(t)[0, 0] == intersect.NO_HIT_T


def _random_scene(rng, n_sph=6, n_tri=8):
    mb = MaterialBuilder()
    m = mb.add(LAMBERT, albedo=(0.5, 0.5, 0.5))
    centers = rng.uniform(-3, 3, (n_sph, 3))
    radii = rng.uniform(0.2, 1.0, n_sph)
    tris = rng.uniform(-3, 3, (n_tri, 3, 3))
    scene = make_scene(
        triangles=make_triangles(tris, np.full(n_tri, m)),
        spheres=make_spheres(centers, radii, np.full(n_sph, m)),
        materials=mb.build())
    return scene, centers, radii, tris


def _numpy_nearest(centers, radii, tris, o, d, t_min):
    """Scalar reference intersector (mirrors CompositeHittable.cpp:11-28)."""
    best = np.inf
    for c, r in zip(centers, radii):
        oc = o - c
        a = d @ d
        hb = oc @ d
        cc = oc @ oc - r * r
        disc = hb * hb - a * cc
        if disc <= 0:
            continue
        sq = np.sqrt(disc)
        for t in ((-hb - sq) / a, (-hb + sq) / a):
            if t_min < t < best:
                best = t
                break
    for v in tris:
        e1, e2 = v[1] - v[0], v[2] - v[0]
        s1 = np.cross(d, e2)
        det = s1 @ e1
        if abs(det) < 1e-12:
            continue
        s = o - v[0]
        s2 = np.cross(s, e1)
        t = (s2 @ e2) / det
        b1 = (s1 @ s) / det
        b2 = (s2 @ d) / det
        if t > t_min and b1 >= 0 and b2 >= 0 and 1 - b1 - b2 >= 0 and t < best:
            best = t
    return best


def test_scene_nearest_matches_numpy(rng_np):
    scene, centers, radii, tris = _random_scene(rng_np)
    n_rays = 64
    o = rng_np.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = jax.jit(lambda oo, dd: intersect.intersect_scene(
        scene, oo, dd, t_min=1e-3))(jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(hit.t)
    for i in range(n_rays):
        ref = _numpy_nearest(centers, radii, tris,
                             o[i].astype(np.float64), d[i].astype(np.float64),
                             1e-3)
        if np.isinf(ref):
            assert not bool(hit.hit[i])
        else:
            np.testing.assert_allclose(t[i], ref, rtol=2e-3, atol=2e-4)


def test_hit_normals_unit_and_facing(rng_np):
    scene, *_ = _random_scene(rng_np)
    o = rng_np.uniform(-4, 4, (32, 3)).astype(np.float32)
    d = rng_np.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect.intersect_scene(scene, jnp.asarray(o), jnp.asarray(d),
                                    t_min=1e-3)
    n = np.asarray(hit.facing_normal)
    mask = np.asarray(hit.hit)
    np.testing.assert_allclose(np.linalg.norm(n[mask], axis=-1), 1.0,
                               atol=1e-5)
    cosines = np.sum(n[mask] * d[mask], -1)
    assert (cosines <= 1e-6).all()


def test_nearest_t_matches_intersect_scene(rng_np):
    # Pins the shadow fast path to the main path (ADVICE r1): nearest_t must
    # be bit-equal to intersect_scene().t on a mixed triangle+sphere scene.
    scene, *_ = _random_scene(rng_np)
    o = rng_np.uniform(-4, 4, (128, 3)).astype(np.float32)
    d = rng_np.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hit = jax.jit(lambda: intersect.intersect_scene(scene, o, d, t_min=1e-3))()
    nt = jax.jit(lambda: intersect.nearest_t(scene, o, d, t_min=1e-3))()
    assert bool(jnp.all(nt == hit.t))

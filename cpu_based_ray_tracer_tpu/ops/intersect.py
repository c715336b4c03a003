"""Batched ray-primitive intersection.

The reference intersects one ray against one primitive at a time behind
virtual calls (``Sphere::is_hit_by`` at ``offline prototype/.../Sphere.cpp:
13-43``, Möller-Trumbore at ``BVH Ray Tracer/.../TriangleMesh.h:19-45``,
nearest-hit scan at ``CompositeHittable.cpp:11-28``).  TPU-first design:

1. a dense (R rays x N primitives) *t-matrix* reduced with min/argmin — the
   producer is a pure elementwise chain that XLA fuses into the reduction, so
   no (R, N) tensor ever hits HBM;
2. hit *attributes* (point, normal, barycentrics, uv) are then **recomputed
   per ray** from the winning primitive index — O(R) gathers + math.

Step 2 is also the differentiability story ("detached traversal, attached
shading"): the integer indices are non-differentiable, but the recomputed
t/point/normal are differentiable functions of the gathered vertex data and
the ray, so geometry/camera gradients flow.

Brute force is *exact* and is the fastest choice for the reference's own
scenes (Cornell box = 32 triangles); large meshes go through ``ops.bvh``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.ops import gather, vec
from cpu_based_ray_tracer_tpu.scene import Scene, _pytree

INF = jnp.inf
# Sentinel "no hit": reference IntersectionRecord defaults t to DBL_MAX
# (Monte Carlo Path Tracer/.../IntersectionRecord.h:24).  A numpy (not jnp)
# scalar: creating a device array at import time would initialize the XLA
# backend and break jax.distributed.initialize in multi-process runs.
NO_HIT_T = np.float32(np.finfo(np.float32).max)
_DET_EPS = 1e-12


@_pytree
class Hit:
    """Hit-record SoA over a batch of rays (reference ``HitRecord.h`` /
    ``IntersectionRecord.h`` as arrays).

    ``geom_normal`` is the *outward* geometric normal: for spheres
    ``(p - c) / radius`` so a negative radius flips it (the hollow-bubble
    trick, ``offline prototype/.../Dielectric.h:36-42``); for triangles the
    precomputed face normal.  ``front`` is True when the ray arrived from the
    side the geometric normal points to (``HitRecord.h:26-31``).
    """

    t: jax.Array            # (R,) distance, NO_HIT_T when miss
    hit: jax.Array          # (R,) bool
    is_triangle: jax.Array  # (R,) bool (False: sphere)
    prim: jax.Array         # (R,) i32 primitive index within its SoA
    material: jax.Array     # (R,) i32 material id
    point: jax.Array        # (R, 3) hit location
    geom_normal: jax.Array  # (R, 3) outward unit geometric normal
    front: jax.Array        # (R,) bool
    uv: jax.Array           # (R, 2) interpolated texture coords (triangles)

    @property
    def facing_normal(self) -> jax.Array:
        """Normal flipped to oppose the incident ray (RTIOW ``set_normal``,
        ``HitRecord.h:26-31``; MC flips with dot(n, W_out) < 0 at
        ``Monte Carlo Path Tracer/.../Renderer.cpp:163-166`` — equivalent)."""
        return jnp.where(self.front[..., None], self.geom_normal,
                         -self.geom_normal)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def intersect_spheres(origin, direction, centers, radii, t_min, t_max):
    """Ray-sphere t-matrix (R, S) with NO_HIT_T for miss.

    Half-b quadratic with near-then-far root selection exactly as the
    reference (``offline prototype/.../Sphere.cpp:13-43``): if the near root
    falls outside (t_min, t_max) the far root is tried.
    """
    oc = origin[:, None, :] - centers[None, :, :]           # (R, S, 3)
    a = jnp.sum(direction * direction, -1)[:, None]          # (R, 1)
    half_b = jnp.sum(oc * direction[:, None, :], -1)         # (R, S)
    c = jnp.sum(oc * oc, -1) - (radii * radii)[None, :]      # (R, S)
    disc = half_b * half_b - a * c
    ok = disc > 0.0
    # where(ok, disc, 1): sqrt'(0) = inf would NaN the backward pass on
    # masked lanes (0 cotangent x inf); the substitute value is never read.
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    t_near = (-half_b - sq) / a
    t_far = (-half_b + sq) / a
    near_ok = ok & (t_near > t_min) & (t_near < t_max)
    far_ok = ok & (t_far > t_min) & (t_far < t_max)
    return jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, NO_HIT_T))


def triangle_t_matrix(origin, direction, v0, e1, e2, t_min, t_max):
    """Möller-Trumbore t-matrix (R, N), NO_HIT_T on miss
    (``BVH Ray Tracer/.../TriangleMesh.h:19-45``).  Component-wise so the
    whole producer fuses into the min/argmin reduction (no (R, N, 3)
    intermediates).  Accept iff t, b1, b2, (1 - b1 - b2) all >= 0 (and
    t > t_min), as the reference; degenerate triangles never hit."""
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]    # (R, 1)
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]  # (1, N)
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]
    v0x, v0y, v0z = v0[None, :, 0], v0[None, :, 1], v0[None, :, 2]

    # s1 = d x e2
    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    det = _dot3(s1x, s1y, s1z, e1x, e1y, e1z)                # (R, N)
    ok_det = jnp.abs(det) > _DET_EPS
    # Substitute det=1 on degenerate lanes BEFORE dividing: grad(1/det) at
    # det ~ 0 is -1/det^2 ~ inf, and 0-cotangent x inf = NaN in the backward
    # pass even though a forward mask would hide it.  No outer where: the
    # garbage t/b1/b2 on such lanes are discarded by the final `ok` mask, and
    # this keeps the hot (R, N) producer one select cheaper.
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
    # s = o - v0
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    # s2 = s x e1
    s2x = sy * e1z - sz * e1y
    s2y = sz * e1x - sx * e1z
    s2z = sx * e1y - sy * e1x
    t = _dot3(s2x, s2y, s2z, e2x, e2y, e2z) * inv_det
    b1 = _dot3(s1x, s1y, s1z, sx, sy, sz) * inv_det
    b2 = _dot3(s2x, s2y, s2z, dx, dy, dz) * inv_det
    ok = (ok_det & (t > t_min) & (t < t_max)
          & (b1 >= 0.0) & (b2 >= 0.0) & (1.0 - b1 - b2 >= 0.0))
    return jnp.where(ok, t, NO_HIT_T)


def moller_trumbore_single(origin, direction, v0, e1, e2):
    """Differentiable MT for one (ray, triangle) pair per lane: all inputs
    (R, 3).  Returns (t, b1, b2) each (R,) — used to *recompute* attributes
    at the winning index (attached shading)."""
    s1 = vec.cross(direction, e2)
    det = jnp.sum(s1 * e1, -1)
    ok_det = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)  # callers mask degenerates
    s = origin - v0
    s2 = vec.cross(s, e1)
    t = jnp.sum(s2 * e2, -1) * inv_det
    b1 = jnp.sum(s1 * s, -1) * inv_det
    b2 = jnp.sum(s2 * direction, -1) * inv_det
    return t, b1, b2


def nearest_triangle(scene: Scene, origin, direction, t_min, t_max):
    """(t, idx) of the nearest triangle per ray — the min/argmin reduction."""
    tr = scene.triangles
    tmat = triangle_t_matrix(origin, direction, tr.v0, tr.e1, tr.e2,
                             t_min, t_max)
    return jnp.min(tmat, -1), jnp.argmin(tmat, -1).astype(jnp.int32)


def intersect_scene(scene: Scene, origin, direction,
                    t_min: float = 0.0, t_max: float = INF) -> Hit:
    """Nearest hit of each ray against every primitive (the reference's
    ``CompositeHittable``/BVH nearest-hit semantics, t_max shrink included).

    origin/direction: (R, 3).  Exact brute force; intended for scenes up to a
    few thousand primitives (all reference scenes qualify).  BVH-backed
    scenes go through ``models.mesh`` / ``ops.bvh`` which reuse
    ``assemble_hit``.
    """
    tt, best_t = nearest_triangle(scene, origin, direction, t_min, t_max)
    return assemble_hit(scene, origin, direction, tt, best_t, t_min, t_max)


def assemble_hit(scene: Scene, origin, direction, tt, best_t,
                 t_min: float, t_max: float = INF) -> Hit:
    """Build the full Hit record given the nearest-*triangle* result
    (tt (R,), best_t (R,) — any intersector: brute force or BVH), adding the
    sphere brute-force pass and recomputing attributes at the winner."""
    sp, tr = scene.spheres, scene.triangles
    t_s_mat = intersect_spheres(origin, direction, sp.center, sp.radius,
                                t_min, t_max)                   # (R, S)
    ts = jnp.min(t_s_mat, -1)
    best_s = jnp.argmin(t_s_mat, -1)
    best_t = jnp.clip(best_t, 0, tr.count - 1)

    is_tri = tt < ts
    t = jnp.minimum(ts, tt)
    hit = t < NO_HIT_T
    return _winner_hit(scene, origin, direction, best_t, best_s, is_tri, t,
                       hit)


def _winner_hit(scene: Scene, origin, direction, best_t, best_s, is_tri, t,
                hit, tri_g=None, sph_g=None) -> Hit:
    """Hit record from per-lane *winner* data only (O(R), differentiable):
    triangle index ``best_t``, sphere index ``best_s``, the winner flags and
    the winner distance ``t``.  Shared by ``assemble_hit`` (which derives the
    winners from the (R, N)/(R, S) reductions) and ``hit_from_record`` (which
    reconstructs them from a recorded index trace — the replay path).
    ``tri_g``/``sph_g``: the already-gathered attribute packs, for callers
    that needed them earlier (one contraction per primitive type total)."""
    sp, tr = scene.spheres, scene.triangles
    prim = jnp.where(is_tri, best_t, best_s)

    # Miss lanes keep t = NO_HIT_T in the record, but the POINT is computed
    # with t = 1 there: o + 3.4e38 * d overflows downstream squares to inf
    # and NaNs the backward pass (consumers always mask misses anyway).
    point = origin + jnp.where(hit, t, 1.0)[:, None] * direction

    # --- Recompute attributes from the winning primitive (O(R)). ---
    # All per-winner lookups go through ONE one-hot contraction per primitive
    # type (ops.gather): dynamic gathers at R ~ 1M are slower than the whole
    # intersection pass on TPU.
    if tri_g is None:
        tri_g = gather.take_packed(
            best_t, tr.normal, tr.v0, tr.e1, tr.e2, tr.uv0, tr.uv1, tr.uv2,
            tr.material.astype(jnp.float32))
    if sph_g is None:
        sph_g = gather.take_packed(
            best_s, sp.center, sp.radius, sp.material.astype(jnp.float32))
    (n_tri, tv0, te1, te2, tuv0, tuv1, tuv2, tmat_f) = tri_g
    (c_hit, r_hit, smat_f) = sph_g

    # Sphere geometric normal: (p - c) / radius — sign of radius flips it
    # (Sphere.cpp:36; Dielectric.h bubble trick).
    n_sphere = (point - c_hit) / jnp.where(r_hit == 0.0, 1.0, r_hit)[:, None]
    geom_n = jnp.where(is_tri[:, None], n_tri, n_sphere)
    geom_n = vec.normalize(geom_n)

    front = jnp.sum(geom_n * direction, -1) < 0.0

    # Triangle barycentrics recomputed once at the winning index
    # (differentiable; the (R, N) matrices above stay fused into the reduce).
    _, b1, b2 = moller_trumbore_single(origin, direction, tv0, te1, te2)
    # Barycentric uv interpolation as in GetHitInfo
    # (Whitted Style Ray Tracer/.../TriangleMesh.h:120-149).
    uv_hit = (tuv0 * (1.0 - b1 - b2)[:, None]
              + tuv1 * b1[:, None]
              + tuv2 * b2[:, None])
    uv_hit = jnp.where(is_tri[:, None], uv_hit, 0.0)

    mat = jnp.where(is_tri, tmat_f, smat_f).astype(jnp.int32)

    return Hit(t=jnp.where(hit, t, NO_HIT_T), hit=hit, is_triangle=is_tri,
               prim=prim.astype(jnp.int32), material=mat,
               point=point, geom_normal=geom_n, front=front, uv=uv_hit)


def triangle_t_single(origin, direction, v0, e1, e2, t_min, t_max=INF,
                      miss=NO_HIT_T):
    """Per-lane twin of ``triangle_t_matrix`` for ONE triangle per ray (all
    inputs (R, 3)) with the *identical* component arithmetic, so the value at
    a recorded winner index is bit-exact to its (R, N) matrix entry — the
    replay path's differentiable t recompute.

    ``miss``: the sentinel for non-accepted lanes.  Callers that mask misses
    themselves (the replay, via the recorded hit flag) pass a benign value:
    a 3.4e38 sentinel flowing into downstream arithmetic invites
    0-cotangent-times-inf NaNs when XLA fuses the selects."""
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    e1x, e1y, e1z = e1[:, 0], e1[:, 1], e1[:, 2]
    e2x, e2y, e2z = e2[:, 0], e2[:, 1], e2[:, 2]
    v0x, v0y, v0z = v0[:, 0], v0[:, 1], v0[:, 2]
    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    det = _dot3(s1x, s1y, s1z, e1x, e1y, e1z)
    ok_det = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    s2x = sy * e1z - sz * e1y
    s2y = sz * e1x - sx * e1z
    s2z = sx * e1y - sy * e1x
    t = _dot3(s2x, s2y, s2z, e2x, e2y, e2z) * inv_det
    b1 = _dot3(s1x, s1y, s1z, sx, sy, sz) * inv_det
    b2 = _dot3(s2x, s2y, s2z, dx, dy, dz) * inv_det
    ok = (ok_det & (t > t_min) & (t < t_max)
          & (b1 >= 0.0) & (b2 >= 0.0) & (1.0 - b1 - b2 >= 0.0))
    return jnp.where(ok, t, miss)


def sphere_t_single(origin, direction, center, radius, t_min, t_max=INF,
                    miss=NO_HIT_T):
    """Per-lane twin of ``intersect_spheres`` for ONE sphere per ray
    (center (R, 3), radius (R,)) — identical arithmetic, bit-exact at a
    recorded winner index (near-then-far root selection included).
    ``miss``: see ``triangle_t_single``."""
    oc = origin - center
    a = jnp.sum(direction * direction, -1)
    half_b = jnp.sum(oc * direction, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = half_b * half_b - a * c
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    t_near = (-half_b - sq) / a
    t_far = (-half_b + sq) / a
    near_ok = ok & (t_near > t_min) & (t_near < t_max)
    far_ok = ok & (t_far > t_min) & (t_far < t_max)
    return jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, miss))


def hit_from_record(scene: Scene, origin, direction, prim, is_tri, hitflag,
                    t_min: float, t_max: float = INF) -> Hit:
    """Differentiable Hit reconstruction from a RECORDED winner (the replay
    path of ``models.monte_carlo.render_replay``).

    Given the discrete outcome of a nearest-hit query — winner primitive
    index ``prim`` (i32, within its SoA), ``is_tri`` and the raw ``hitflag``
    — the full Hit is recomputed in O(R) from the winner's gathered data:
    no (R, N) intersection producer enters the computation, so reverse-mode
    AD through the result is O(R) too.  Values are bit-exact to
    ``intersect_scene`` on the same rays (the t recomputes are arithmetic
    twins of the matrix producers), and gradients are *equal* to the
    detached-traversal gradients of the standard path: there, the min/argmin
    VJP routes each lane's cotangent to exactly the winner entry — the same
    function of the same winner data that is differentiated here.
    """
    tr, sp = scene.triangles, scene.spheres
    best_t = jnp.where(is_tri, prim, 0)
    best_s = jnp.where(is_tri, 0, prim)
    # ONE contraction per primitive type: the t-recompute inputs ride the
    # same pack as the attribute recompute inputs of _winner_hit.
    tri_g = gather.take_packed(
        best_t, tr.normal, tr.v0, tr.e1, tr.e2, tr.uv0, tr.uv1, tr.uv2,
        tr.material.astype(jnp.float32))
    sph_g = gather.take_packed(
        best_s, sp.center, sp.radius, sp.material.astype(jnp.float32))
    # miss=1.0: on replayed lanes every miss/deselected branch is masked by
    # the RECORDED flags, so the recompute never needs the 3.4e38 sentinel —
    # keeping it out of the graph prevents 0-cotangent x inf NaNs when the
    # backward pass fuses these selects (seen on the TPU backend).
    t_tri = triangle_t_single(origin, direction, tri_g[1], tri_g[2],
                              tri_g[3], t_min, t_max, miss=1.0)
    t_sph = sphere_t_single(origin, direction, sph_g[0], sph_g[1],
                            t_min, t_max, miss=1.0)
    t = jnp.where(is_tri, t_tri, t_sph)
    t = jnp.where(hitflag, t, 1.0)  # Hit.t re-sentinels misses itself
    return _winner_hit(scene, origin, direction, best_t, best_s, is_tri, t,
                       hitflag, tri_g=tri_g, sph_g=sph_g)


def nearest_t(scene: Scene, origin, direction,
              t_min: float = 0.0, t_max: float = INF) -> jax.Array:
    """Nearest-hit distance only, (R,) — the shadow/occlusion fast path.

    Shadow rays never need the winning index or hit attributes (the
    reference's shadow test reads only ``occlusion.t``, ``Monte Carlo Path
    Tracer/.../Renderer.cpp:183-186``), so this skips the argmin and the
    whole ``assemble_hit`` recompute — a pure fused min-reduce.
    """
    tr, sp = scene.triangles, scene.spheres
    tt = jnp.min(triangle_t_matrix(origin, direction, tr.v0, tr.e1, tr.e2,
                                   t_min, t_max), -1)
    ts = jnp.min(intersect_spheres(origin, direction, sp.center, sp.radius,
                                   t_min, t_max), -1)
    return jnp.minimum(tt, ts)


def soft_visibility(scene: Scene, origin, direction, max_dist,
                    t_min: float, beta: float,
                    tolerance: float = 0.01) -> jax.Array:
    """Differentiable shadow-ray visibility in [0, 1] (R,).

    The binary test (``occluded``) is a step function of occluder GEOMETRY:
    its gradient is zero a.e. and undefined exactly at penumbra boundaries —
    the one place inverse rendering needs it (SURVEY §7 hard part (c)).
    Here each potential occluder contributes a *soft* coverage instead:

    - triangles: coverage = sigmoid(margin / beta) where margin is the
      world-space distance of the ray's plane-intersection point to the
      triangle's nearest edge (barycentric margin x the triangle's height
      scale sqrt(2A)) — smooth in the vertices, so silhouette motion
      produces real gradients;
    - spheres: coverage = sigmoid((radius - impact_parameter) / beta);
    - coverage counts only within the occlusion window
      ``t in (t_min, max_dist - tolerance)`` (the reference's +tolerance
      keeps the light from shadowing its own sample, Renderer.cpp:183-186);
    - total visibility = prod(1 - coverage) over all primitives.

    beta -> 0 recovers the binary test (up to the measure-zero edge set).
    O(R x N) like the brute-force intersector — the differentiable-mode
    estimator for reference-scale scenes, not the production shadow path.
    """
    tr, sp = scene.triangles, scene.spheres
    return (soft_visibility_tris(tr.v0, tr.e1, tr.e2, tr.area, origin,
                                 direction, max_dist, t_min, beta,
                                 tolerance)
            * soft_visibility_spheres(sp.center, sp.radius, origin,
                                      direction, max_dist, t_min, beta,
                                      tolerance))


def soft_visibility_tris(v0, e1, e2, area, origin, direction, max_dist,
                         t_min: float, beta: float,
                         tolerance: float) -> jax.Array:
    """``prod(1 - soft_cover)`` over an explicit triangle set, (R,).  The
    array-level core of ``soft_visibility`` — the mesh path gates it over
    a compacted ray subset (``models.mesh.make_soft_vis_fn``)."""
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    e1x, e1y, e1z = e1[None, :, 0], e1[None, :, 1], e1[None, :, 2]
    e2x, e2y, e2z = e2[None, :, 0], e2[None, :, 1], e2[None, :, 2]
    v0x, v0y, v0z = v0[None, :, 0], v0[None, :, 1], v0[None, :, 2]

    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    det = _dot3(s1x, s1y, s1z, e1x, e1y, e1z)
    ok_det = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)  # in_window masks degenerates
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    s2x = sy * e1z - sz * e1y
    s2y = sz * e1x - sx * e1z
    s2z = sx * e1y - sy * e1x
    t = _dot3(s2x, s2y, s2z, e2x, e2y, e2z) * inv_det
    b1 = _dot3(s1x, s1y, s1z, sx, sy, sz) * inv_det
    b2 = _dot3(s2x, s2y, s2z, dx, dy, dz) * inv_det

    in_window = (ok_det & (t > t_min)
                 & (t < max_dist[:, None] - tolerance))       # (R, N)
    bary_margin = jnp.minimum(jnp.minimum(b1, b2), 1.0 - b1 - b2)
    height_scale = jnp.sqrt(jnp.maximum(2.0 * area, 1e-12))[None, :]
    margin = bary_margin * height_scale                        # ~world units
    cover_t = jax.nn.sigmoid(jnp.clip(margin / beta, -30.0, 30.0))
    cover_t = jnp.where(in_window, cover_t, 0.0)
    return jnp.prod(1.0 - cover_t, -1)


def soft_visibility_spheres(center, radius, origin, direction, max_dist,
                            t_min: float, beta: float,
                            tolerance: float) -> jax.Array:
    oc = center[None, :, :] - origin[:, None, :]               # (R, S, 3)
    proj = jnp.sum(oc * direction[:, None, :], -1)             # (R, S)
    d2 = jnp.maximum(jnp.sum(oc * oc, -1) - proj * proj, 1e-12)
    impact = jnp.sqrt(d2)
    r_abs = jnp.abs(radius)[None, :]
    in_win_s = ((proj > t_min) & (proj < max_dist[:, None] - tolerance)
                & (r_abs > 0.0))
    cover_s = jax.nn.sigmoid(jnp.clip((r_abs - impact) / beta, -30.0, 30.0))
    cover_s = jnp.where(in_win_s, cover_s, 0.0)
    return jnp.prod(1.0 - cover_s, -1)


def occluded(scene: Scene, origin, direction, max_dist,
             t_min: float = 0.0, tolerance: float = 0.01) -> jax.Array:
    """Shadow-ray test: True when something blocks before ``max_dist``.

    Mirrors the MC shadow test `|to_sample| < occlusion.t + 0.01`
    (``Monte Carlo Path Tracer/.../Renderer.cpp:183-186``): the +tolerance
    keeps the light itself from shadowing its own sample.
    """
    return ~(max_dist < nearest_t(scene, origin, direction, t_min=t_min)
             + tolerance)

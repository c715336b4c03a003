"""BVH mesh stage: Whitted shading over accelerated triangle meshes.

The reference's BVH stage (``BVH Ray Tracer/8599RayTracerGUI/src/``) is the
Whitted integrator re-pointed at ``ray_BVH_intersection_record`` for every
ray including shadow rays (``Renderer.cpp:195-198``).  Here likewise: the
renderer IS ``models.whitted`` with the intersector swapped for an
accelerated one.

Three interchangeable intersectors (all return the same nearest hit):

- ``packet``  — the packet-culled Pallas kernel (``ops.packet``): the TPU
  path, 2.7x dense brute force for camera rays at 11k triangles and the
  only option past VMEM scale (204k-tri receipt) — numbers in
  PERF_PASSES.json / PERF.md §4;
- ``brute``   — exact dense scan (``ops.intersect``): fastest below a few
  hundred triangles, any backend;
- ``sparse``  — per-lane skip-link BVH walk (``ops.bvh.traverse``): the
  literal translation of the reference's traversal; kept as a correctness
  oracle, not a production path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import whitted
from cpu_based_ray_tracer_tpu.ops import bvh as bvh_ops
from cpu_based_ray_tracer_tpu.ops import intersect
from cpu_based_ray_tracer_tpu.ops import packet as packet_ops
from cpu_based_ray_tracer_tpu.scene import Scene

# Below this many triangles dense brute force wins over the packet kernel
# (measured crossover on v5e is in the few-hundreds).
PACKET_MIN_TRIS = 512


class MeshBundle(NamedTuple):
    """Scene + its acceleration structures (built host-side, device arrays)."""

    scene: Scene
    clusters: Optional[packet_ops.Clusters]  # packet kernel (None: brute)
    bvh: Optional[bvh_ops.FlatBVH]           # sparse oracle walk
    pv0: Optional[jax.Array]                 # leaf-order triangles (sparse)
    pe1: Optional[jax.Array]
    pe2: Optional[jax.Array]
    method: str                    # "packet" | "brute" | "sparse" | "fused"
    bounds: Optional[tuple] = None           # ((lo xyz), (hi xyz)) floats
    coherent: Optional[object] = None        # ops.coherent.CoherentPack


def prepare(scene: Scene, method: str = "auto", leaf_size: int = 4,
            cluster_size: int = 128) -> MeshBundle:
    """Host-side acceleration build over the scene's triangles.

    method: "auto" picks packet for >= PACKET_MIN_TRIS triangles else brute;
    "sparse" builds the skip-link BVH walked per lane (oracle only).
    """
    import numpy as np

    n = scene.triangles.count
    if method == "auto":
        method = "packet" if n >= PACKET_MIN_TRIS else "brute"

    if method == "packet":
        v0 = np.asarray(scene.triangles.v0, np.float64)
        e1 = np.asarray(scene.triangles.e1, np.float64)
        e2 = np.asarray(scene.triangles.e2, np.float64)
        verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
        clusters = packet_ops.build_clusters(verts, cluster_size=cluster_size)
        pts = verts.reshape(-1, 3)
        bounds = (tuple(map(float, pts.min(0))),
                  tuple(map(float, pts.max(0))))
        return MeshBundle(scene=scene, clusters=clusters, bvh=None,
                          pv0=None, pe1=None, pe2=None, method="packet",
                          bounds=bounds)

    if method == "fused":
        # r5 shortlist intersector (ops.coherent): per-tile exact cluster
        # work lists + SMEM-resident table — the real-time path for the
        # BVH stage's coherent primary/shadow rays.  Requires SMEM
        # residency; larger meshes stay on the streaming packet path.
        from cpu_based_ray_tracer_tpu.ops import coherent

        pack = coherent.pack_coherent(scene, cluster_size=cluster_size)
        if not coherent.fits_resident(pack):
            raise ValueError(
                "mesh too large for the SMEM-resident fused intersector "
                f"({pack.aabb.shape[0]} clusters); use method='packet'")
        return MeshBundle(scene=scene, clusters=None, bvh=None, pv0=None,
                          pe1=None, pe2=None, method="fused",
                          coherent=pack)

    if method == "sparse":
        v0 = np.asarray(scene.triangles.v0, np.float64)
        e1 = np.asarray(scene.triangles.e1, np.float64)
        e2 = np.asarray(scene.triangles.e2, np.float64)
        verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
        from cpu_based_ray_tracer_tpu.utils import native
        flat = native.build_bvh_native(verts, leaf_size)
        if flat is None:
            flat = bvh_ops.build_bvh(verts, leaf_size)
        order = flat.order
        return MeshBundle(scene=scene, clusters=None, bvh=flat,
                          pv0=scene.triangles.v0[order],
                          pe1=scene.triangles.e1[order],
                          pe2=scene.triangles.e2[order], method="sparse")

    return MeshBundle(scene=scene, clusters=None, bvh=None,
                      pv0=None, pe1=None, pe2=None, method="brute")


def _sort_order(bundle: MeshBundle, origin, direction):
    """Coherence-restoring ray order: direction octant then 4x4x4 origin
    cell over the mesh bounds.  The packet kernel's per-block cluster cull
    collapses on spatially incoherent rays (diffuse bounces); sorting
    restores locality within blocks (~1.9x the bounce-ray pass, measured
    r3 on v5e — PERF.md par.4).  Per-ray results are exact regardless of
    grouping, so any order is legal."""
    import jax.numpy as jnp

    lo, hi = bundle.bounds
    oct_ = ((direction[:, 0] > 0).astype(jnp.int32)
            + 2 * (direction[:, 1] > 0).astype(jnp.int32)
            + 4 * (direction[:, 2] > 0).astype(jnp.int32))
    cell = 0
    for a in range(3):
        span = max(hi[a] - lo[a], 1e-6)
        cell = cell * 4 + jnp.clip(
            ((origin[:, a] - lo[a]) / span * 4).astype(jnp.int32), 0, 3)
    return jnp.argsort(oct_ * 64 + cell)


def make_intersect_fn(bundle: MeshBundle, sort_rays: bool = False,
                      differentiable: bool = False, hw=None):
    """An ``intersect_fn(scene, o, d, t_min) -> Hit`` backed by the bundle's
    intersector (plus the brute-force sphere pass inside ``assemble_hit``).

    ``sort_rays``: reorder rays for block coherence before the packet
    kernel (for incoherent bounce rays — the MC path sets it).
    ``differentiable``: recompute the winning triangle's t with the
    differentiable Möller-Trumbore at the (detached) winner index so the
    Pallas kernel's output never carries gradient — detached traversal,
    attached shading (SURVEY §7 step 6) through the ACCELERATED path
    (VERDICT r3 next #5).  Adds one R-row gather; off on the forward-only
    production path."""

    if bundle.method == "packet":
        clusters = bundle.clusters

        def fn(scene, origin, direction, t_min):
            import jax
            import jax.numpy as jnp

            from cpu_based_ray_tracer_tpu.ops import gather

            # Detached traversal: the kernel picks the winner; gradients
            # flow only through the recomputed shading quantities.  (A
            # structurally-nonzero tangent on the rays would otherwise ask
            # JAX for the pallas_call's JVP, which does not exist.)
            origin_k = jax.lax.stop_gradient(origin)
            direction_k = jax.lax.stop_gradient(direction)
            if sort_rays:
                order = _sort_order(bundle, origin_k, direction_k)
                tt_s, idx_s = packet_ops.nearest(
                    clusters, origin_k[order], direction_k[order], t_min)
                inv = jnp.zeros_like(order).at[order].set(
                    jnp.arange(order.shape[0]))
                tt, idx = tt_s[inv], idx_s[inv]
            else:
                tt, idx = packet_ops.nearest(clusters, origin_k,
                                             direction_k, t_min)
            if differentiable:
                tr = scene.triangles
                j = jax.lax.stop_gradient(jnp.clip(idx, 0, tr.count - 1))
                v0, e1, e2 = gather.take_packed(j, tr.v0, tr.e1, tr.e2)
                t_rec, _, _ = intersect.moller_trumbore_single(
                    origin, direction, v0, e1, e2)
                # Same formulation as the kernel -> same value to fp
                # rounding; the kernel's t then feeds nothing downstream.
                tt = jnp.where(idx >= 0, t_rec, intersect.NO_HIT_T)
            return intersect.assemble_hit(scene, origin, direction, tt, idx,
                                          t_min)

        return fn

    if bundle.method == "fused":
        pack = bundle.coherent

        def fn(scene, origin, direction, t_min):
            import jax

            from cpu_based_ray_tracer_tpu.ops import coherent

            o = jax.lax.stop_gradient(origin)     # detached traversal
            d = jax.lax.stop_gradient(direction)
            tt, idx = coherent.nearest(
                pack.tri, pack.aabb, o, d, n_cl=pack.aabb.shape[0],
                cs=pack.cs, t_min=float(t_min), hw=hw,
                interpret=jax.default_backend() == "cpu")
            return intersect.assemble_hit(scene, origin, direction, tt, idx,
                                          t_min)

        return fn

    if bundle.method == "sparse":
        def fn(scene, origin, direction, t_min):
            tt, idx = bvh_ops.traverse(bundle.bvh, bundle.pv0, bundle.pe1,
                                       bundle.pe2, origin, direction, t_min)
            return intersect.assemble_hit(scene, origin, direction, tt, idx,
                                          t_min)

        return fn

    return lambda scene, o, d, t_min: intersect.intersect_scene(
        scene, o, d, t_min=t_min)


def make_nearest_t_fn(bundle: MeshBundle, sort_rays: bool = False, hw=None):
    """A ``nearest_t_fn(scene, o, d, t_min) -> t (R,)`` shadow/occlusion fast
    path through the bundle's intersector (triangles) + the brute sphere min
    (``ops.intersect.nearest_t`` semantics)."""
    import jax.numpy as jnp

    if bundle.method == "packet":
        clusters = bundle.clusters

        def fn(scene, origin, direction, t_min):
            import jax

            # Hard-visibility occlusion feeds a comparison only; detach so
            # ray tangents never reach the pallas_call (no JVP defined).
            origin = jax.lax.stop_gradient(origin)
            direction = jax.lax.stop_gradient(direction)
            if sort_rays:
                order = _sort_order(bundle, origin, direction)
                tt_s, _ = packet_ops.nearest(clusters, origin[order],
                                             direction[order], t_min)
                inv = jnp.zeros_like(order).at[order].set(
                    jnp.arange(order.shape[0]))
                tt = tt_s[inv]
            else:
                tt, _ = packet_ops.nearest(clusters, origin, direction,
                                           t_min)
            sp = scene.spheres
            ts = jnp.min(intersect.intersect_spheres(
                origin, direction, sp.center, sp.radius, t_min, jnp.inf), -1)
            return jnp.minimum(tt, ts)

        return fn

    if bundle.method == "fused":
        pack = bundle.coherent

        def fn(scene, origin, direction, t_min):
            import jax

            from cpu_based_ray_tracer_tpu.ops import coherent

            origin = jax.lax.stop_gradient(origin)
            direction = jax.lax.stop_gradient(direction)
            tt, _ = coherent.nearest(
                pack.tri, pack.aabb, origin, direction,
                n_cl=pack.aabb.shape[0], cs=pack.cs, t_min=float(t_min),
                hw=hw, interpret=jax.default_backend() == "cpu")
            sp = scene.spheres
            ts = jnp.min(intersect.intersect_spheres(
                origin, direction, sp.center, sp.radius, t_min, jnp.inf), -1)
            return jnp.minimum(tt, ts)

        return fn

    return lambda scene, o, d, t_min: intersect.nearest_t(scene, o, d,
                                                          t_min=t_min)


def make_soft_vis_fn(scene: Scene, gate_mask=None, cap: int | None = None):
    """Mesh-scale differentiable shadow visibility (SURVEY §7 hard part (c)
    through the ACCELERATED route, VERDICT r4 next #5).

    ``intersect.soft_visibility`` is O(R x N) over every scene triangle;
    at mesh scale that is the one remaining brute-force term of the
    differentiable path.  This gates the mesh triangles behind the same
    AABB predicate the fused shadow pass uses: soft coverage runs on the
    COMPACTED subset of lanes whose shadow segment crosses the (beta-
    inflated) mesh AABB — the small room primitives stay brute for every
    lane.  Fully differentiable (jnp.nonzero compaction; gathers/scatters
    carry the cotangents); results match the brute estimator to the
    sigmoid tail cut at the inflated AABB (< sigmoid(-10) per occluder).

    ``gate_mask``: (N,) bool, True = mesh triangle (default: the
    ``fused_mesh.pack_mesh_scene`` size heuristic).  ``cap``: max compacted
    lanes per call (default R, i.e. exact; tighten for speed)."""
    import jax.numpy as jnp
    import numpy as np

    from cpu_based_ray_tracer_tpu.ops import fused_mesh
    from cpu_based_ray_tracer_tpu.ops import intersect as isect

    tr0 = scene.triangles
    v0 = np.asarray(tr0.v0, np.float64)
    e1 = np.asarray(tr0.e1, np.float64)
    e2 = np.asarray(tr0.e2, np.float64)
    verts = np.stack([v0, v0 + e1, v0 + e2], 1)
    if gate_mask is None:
        emissive = np.asarray(scene.materials.emissive)[
            np.asarray(tr0.material)]
        lo_all = verts.reshape(-1, 3).min(0)
        hi_all = verts.reshape(-1, 3).max(0)
        scene_diag = float(np.linalg.norm(hi_all - lo_all))
        tri_diag = np.linalg.norm(verts.max(1) - verts.min(1), axis=-1)
        gate_mask = (tri_diag < 0.15 * scene_diag) & ~emissive
    gate_mask = np.asarray(gate_mask, bool)
    gidx = jnp.asarray(np.flatnonzero(gate_mask))
    sidx = jnp.asarray(np.flatnonzero(~gate_mask))
    gpts = verts[gate_mask].reshape(-1, 3)
    glo = jnp.asarray(gpts.min(0), jnp.float32)
    ghi = jnp.asarray(gpts.max(0), jnp.float32)
    hmax = float(np.sqrt(np.maximum(
        2.0 * np.asarray(tr0.area)[gate_mask], 1e-12).max()))

    def fn(scene_rt, p, w, dist, t_min, beta, tol):
        import jax

        tr = scene_rt.triangles
        sp = scene_rt.spheres
        vis = (isect.soft_visibility_tris(
                   tr.v0[sidx], tr.e1[sidx], tr.e2[sidx], tr.area[sidx],
                   p, w, dist, t_min, beta, tol)
               * isect.soft_visibility_spheres(
                   sp.center, sp.radius, p, w, dist, t_min, beta, tol))
        r = p.shape[0]
        c = cap or r
        # beta-inflated AABB: keeps the cut sigmoid tail below e^-10
        pad = 10.0 * beta * hmax
        pred = fused_mesh._slab_crosses(
            jax.lax.stop_gradient(p), jax.lax.stop_gradient(w),
            glo - pad, ghi + pad, t_min, jax.lax.stop_gradient(dist))
        idx = jnp.nonzero(pred, size=c, fill_value=r)[0]
        gi = jnp.clip(idx, 0, r - 1)
        sub = isect.soft_visibility_tris(
            tr.v0[gidx], tr.e1[gidx], tr.e2[gidx], tr.area[gidx],
            p[gi], w[gi], dist[gi], t_min, beta, tol)
        sub = jnp.where(idx < r, sub, 1.0)
        vis_mesh = jnp.ones((r,), vis.dtype).at[idx].set(sub, mode="drop")
        return vis * vis_mesh

    return fn


def render(bundle: MeshBundle, camera: cam_mod.PerspectiveCamera,
           cfg: RenderConfig) -> jax.Array:
    """Whitted render of the mesh scene through the bundle's intersector."""
    hw = None
    if bundle.method == "fused":
        # The shortlist intersector tiles 32x128 PIXEL rectangles — it
        # needs whole-image ray sets (no row-strip chunking) and the image
        # shape threaded through.
        import dataclasses

        hw = (cfg.height, cfg.width)
        cfg = dataclasses.replace(cfg, ray_chunk=cfg.height * cfg.width)
    return whitted.render(bundle.scene, camera, cfg,
                          intersect_fn=make_intersect_fn(bundle, hw=hw),
                          nearest_t_fn=make_nearest_t_fn(bundle, hw=hw))


def render_mc(bundle: MeshBundle, camera: cam_mod.PerspectiveCamera,
              cfg: RenderConfig, key) -> jax.Array:
    """Monte Carlo path trace (NEE + RR) through the bundle's accelerated
    intersector — the architecture of the reference's MC stage, whose every
    path AND shadow ray is BVH-backed (``Monte Carlo Path Tracer/.../
    Renderer.cpp:41`` builds the BVH; shadow test at 183-184).  Equal-spp
    scan engine; mean linear radiance (H, W, 3)."""
    from cpu_based_ray_tracer_tpu.models import monte_carlo

    return monte_carlo.render(
        bundle.scene, camera, cfg, key,
        intersect_fn=make_intersect_fn(bundle, sort_rays=True),
        nearest_t_fn=make_nearest_t_fn(bundle, sort_rays=True))


def wavefront_mc_steps(bundle: MeshBundle, camera, cfg: RenderConfig, key,
                       state, n_steps: int):
    """Persistent-wavefront MC stepper over the bundle's intersector (the
    mesh-MC throughput engine; see ``monte_carlo.wavefront_steps``)."""
    from cpu_based_ray_tracer_tpu.models import monte_carlo

    return monte_carlo.wavefront_steps(
        bundle.scene, camera, cfg, key, state, n_steps,
        intersect_fn=make_intersect_fn(bundle, sort_rays=True),
        nearest_t_fn=make_nearest_t_fn(bundle, sort_rays=True))

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

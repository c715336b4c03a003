"""BVH mesh stage: Whitted shading over BVH-accelerated triangle meshes.

The reference's BVH stage (``BVH Ray Tracer/8599RayTracerGUI/src/``) is the
Whitted integrator re-pointed at ``ray_BVH_intersection_record`` for every
ray including shadow rays (``Renderer.cpp:195-198``).  Here likewise: the
renderer IS ``models.whitted`` with the intersector swapped for the
flattened-BVH traversal of ``ops.bvh``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import whitted
from cpu_based_ray_tracer_tpu.ops import bvh as bvh_ops
from cpu_based_ray_tracer_tpu.ops import intersect
from cpu_based_ray_tracer_tpu.scene import Scene


class MeshBundle(NamedTuple):
    """Scene + its flattened BVH + leaf-order triangle copies."""

    scene: Scene
    bvh: bvh_ops.FlatBVH
    pv0: jax.Array  # (N, 3) triangles permuted into leaf order
    pe1: jax.Array
    pe2: jax.Array


def prepare(scene: Scene, leaf_size: int = 4,
            builder: str = "auto") -> MeshBundle:
    """Host-side BVH build over the scene's triangles (numpy or the native
    C++ builder — identical flattened contract)."""
    import numpy as np

    v0 = np.asarray(scene.triangles.v0, np.float64)
    e1 = np.asarray(scene.triangles.e1, np.float64)
    e2 = np.asarray(scene.triangles.e2, np.float64)
    verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    if builder == "native" or builder == "auto":
        from cpu_based_ray_tracer_tpu.utils import native
        flat = native.build_bvh_native(verts, leaf_size)
        if flat is None:
            if builder == "native":
                raise RuntimeError("native BVH builder unavailable")
            flat = bvh_ops.build_bvh(verts, leaf_size)
    else:
        flat = bvh_ops.build_bvh(verts, leaf_size)
    order = flat.order
    return MeshBundle(scene=scene, bvh=flat,
                      pv0=scene.triangles.v0[order],
                      pe1=scene.triangles.e1[order],
                      pe2=scene.triangles.e2[order])


def make_intersect_fn(bundle: MeshBundle):
    """An ``intersect_fn(scene, o, d, t_min) -> Hit`` backed by BVH traversal
    (plus the brute-force sphere pass inside ``assemble_hit``)."""

    def fn(scene, origin, direction, t_min):
        tt, idx = bvh_ops.traverse(bundle.bvh, bundle.pv0, bundle.pe1,
                                   bundle.pe2, origin, direction, t_min)
        return intersect.assemble_hit(scene, origin, direction, tt, idx,
                                      t_min)

    return fn


def render(bundle: MeshBundle, camera: cam_mod.PerspectiveCamera,
           cfg: RenderConfig) -> jax.Array:
    """Whitted render of the mesh scene through the BVH intersector."""
    return whitted.render(bundle.scene, camera, cfg,
                          intersect_fn=make_intersect_fn(bundle))

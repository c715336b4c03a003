"""Bounding-volume hierarchy: host-side builder + device traversal.

The reference builds a pointer-based binary BVH by recursive median split on
the longest axis of the centroid AABB with one entity per leaf
(``BVH Ray Tracer/.../BVH.h:106-185``) and traverses it recursively
(``BVH.h:81-100``) with the slab test of ``BoundingVolume.h:173-215``.
SAH is an unimplemented enum there (BVH.h:47-51).

TPU-first redesign:
- build on the host in numpy (or the native C++ builder in ``csrc/`` — same
  flattened contract), with a configurable leaf size (default 4; the
  reference's leaf=1 wastes nodes on a vector machine);
- flatten to **preorder + skip links**: visiting node i on an AABB hit
  continues at i+1, on a miss jumps to ``skip[i]`` — traversal is a single
  ``while_loop`` with no stack;
- the per-ray traversal is vmapped; triangles are reordered so each leaf is
  a contiguous [first, first+count) slice;
- the reference's two-level BVH (scene over meshes, mesh over triangles,
  ``TriangleMesh.h:110-216``) is flattened into ONE global BVH — same hits,
  fewer indirections (SURVEY.md §7 step 4 decision).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.ops import vec
from cpu_based_ray_tracer_tpu.ops.intersect import (NO_HIT_T,
                                                    triangle_t_matrix)


class FlatBVH(NamedTuple):
    """Flattened preorder BVH over triangles (device arrays)."""

    node_min: jax.Array    # (M, 3) f32
    node_max: jax.Array    # (M, 3) f32
    node_skip: jax.Array   # (M,) i32 — next node when this subtree is done
    leaf_first: jax.Array  # (M,) i32 — first triangle (reordered); -1 internal
    leaf_count: jax.Array  # (M,) i32 — 0 for internal nodes
    order: jax.Array       # (N,) i32 — leaf-contiguous triangle permutation
    max_leaf: int          # static python int: widest leaf

    @property
    def n_nodes(self) -> int:
        return self.node_min.shape[0]


def build_bvh(tri_vertices: np.ndarray, leaf_size: int = 4) -> FlatBVH:
    """Median-split build (the reference's rule: split index = count/2 on the
    longest axis of the *centroid* AABB, BVH.h:142-176) over per-triangle
    AABBs, flattened to preorder+skip."""
    tris = np.asarray(tri_vertices, np.float64).reshape(-1, 3, 3)
    n = len(tris)
    tmin = tris.min(1)
    tmax = tris.max(1)
    centroid = 0.5 * (tmin + tmax)

    node_min, node_max, node_skip = [], [], []
    leaf_first, leaf_count = [], []
    order: list[int] = []

    def emit(idx: np.ndarray) -> None:
        me = len(node_min)
        node_min.append(tmin[idx].min(0))
        node_max.append(tmax[idx].max(0))
        node_skip.append(-1)   # patched after children are emitted
        if len(idx) <= leaf_size:
            leaf_first.append(len(order))
            leaf_count.append(len(idx))
            order.extend(int(i) for i in idx)
        else:
            leaf_first.append(-1)
            leaf_count.append(0)
            c = centroid[idx]
            axis = int(np.argmax(c.max(0) - c.min(0)))  # longest centroid axis
            split = np.argsort(c[:, axis], kind="stable")
            half = len(idx) // 2                         # BVH.h:170 median
            emit(idx[split[:half]])
            emit(idx[split[half:]])
        node_skip[me] = len(node_min)

    emit(np.arange(n))
    return FlatBVH(
        node_min=jnp.asarray(np.asarray(node_min), jnp.float32),
        node_max=jnp.asarray(np.asarray(node_max), jnp.float32),
        node_skip=jnp.asarray(node_skip, jnp.int32),
        leaf_first=jnp.asarray(leaf_first, jnp.int32),
        leaf_count=jnp.asarray(leaf_count, jnp.int32),
        order=jnp.asarray(order, jnp.int32),
        max_leaf=leaf_size,
    )


def slab_test(o, inv_d, bmin, bmax, t_best):
    """AABB slab test with reciprocal directions and per-axis sign swap
    (``BoundingVolume.h:173-215``): hit iff t_out >= 0 and t_in <= t_out,
    plus the nearer-than-current-best cull the recursive reference gets from
    its nearest-hit comparison."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    t_in = jnp.max(t_near)
    t_out = jnp.min(t_far)
    return (t_out >= 0.0) & (t_in <= t_out) & (t_in <= t_best)


def traverse(bvh: FlatBVH, v0, e1, e2, origin, direction,
             t_min: float, t_max: float = jnp.inf):
    """Nearest-hit traversal for a batch of rays.

    v0/e1/e2: triangle SoA **already permuted by ``bvh.order``**.
    origin/direction: (R, 3).  Returns (t (R,), tri_index (R,) into the
    *original* triangle order).
    """
    n_nodes = bvh.n_nodes
    max_leaf = bvh.max_leaf

    def one_ray(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                                jnp.where(d < 0, -1e-20, 1e-20), d)

        def cond(state):
            i, _, _ = state
            return i < n_nodes

        def body(state):
            i, best_t, best_i = state
            hit_box = slab_test(o, inv_d, bvh.node_min[i], bvh.node_max[i],
                                best_t)
            first = bvh.leaf_first[i]
            count = bvh.leaf_count[i]
            is_leaf = count > 0

            def test_leaf(args):
                best_t, best_i = args

                def tri_body(k, bt_bi):
                    bt, bi = bt_bi
                    j = first + k
                    valid = k < count
                    tj = jnp.where(valid, j, 0)
                    t, b1, b2 = _mt_scalar(o, d, v0[tj], e1[tj], e2[tj])
                    ok = (valid & (t > t_min) & (t < t_max) & (b1 >= 0.0)
                          & (b2 >= 0.0) & (1.0 - b1 - b2 >= 0.0) & (t < bt))
                    return (jnp.where(ok, t, bt),
                            jnp.where(ok, bvh.order[tj], bi))

                return jax.lax.fori_loop(0, max_leaf, tri_body,
                                         (best_t, best_i))

            best_t, best_i = jax.lax.cond(
                hit_box & is_leaf, test_leaf, lambda a: a, (best_t, best_i))
            nxt = jnp.where(hit_box & ~is_leaf, i + 1, bvh.node_skip[i])
            return nxt, best_t, best_i

        _, best_t, best_i = jax.lax.while_loop(
            cond, body, (jnp.int32(0), NO_HIT_T, jnp.int32(-1)))
        return best_t, best_i

    return jax.vmap(one_ray)(origin, direction)


def _mt_scalar(o, d, v0, e1, e2):
    """Möller-Trumbore for one ray & one triangle (all (3,))."""
    s1 = vec.cross(d, e2)
    det = jnp.dot(s1, e1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o - v0
    s2 = vec.cross(s, e1)
    t = jnp.dot(s2, e2) * inv_det
    b1 = jnp.dot(s1, s) * inv_det
    b2 = jnp.dot(s2, d) * inv_det
    t = jnp.where(jnp.abs(det) > 1e-12, t, NO_HIT_T)
    return t, b1, b2


def nearest_triangle_bruteforce(v0, e1, e2, origin, direction,
                                t_min: float, t_max: float = jnp.inf):
    """Reference oracle for traversal tests: exact all-triangles scan."""
    tmat = triangle_t_matrix(origin, direction, v0, e1, e2, t_min, t_max)
    t = jnp.min(tmat, -1)
    idx = jnp.argmin(tmat, -1).astype(jnp.int32)
    return t, jnp.where(t < NO_HIT_T, idx, -1)

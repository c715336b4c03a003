"""Shortlist-driven mesh intersection for COHERENT ray sets (r5).

The BVH stage renders bunny+teapot (11,288 triangles) interactively on the
reference CPU (``/root/reference/BVH Ray Tracer/.../Renderer.cpp:121-233``);
the r4 TPU answer was the packet kernel at 5.5 fps.  The r5 finding
(PERF.md): per-cluster ``lax.cond`` culling and box sorting are dead ends
for *incoherent* rays, but Whitted primaries and point-light shadow rays
are COHERENT — a compact pixel block's rays cross only a handful of the
mesh's clusters.

So instead of conds, the work list is computed exactly, per tile, ahead of
the sweep:

  mask pass    per-lane cluster-AABB crossing bitmasks (u32 planes,
  (Pallas)     ~20 ops per cluster per lane);
  XLA          OR-reduce the masks over each tile -> per-tile cluster
               SHORTLIST (ids + count; ~200 x C bools, trivial);
  sweep pass   the whole cluster table SMEM-resident (one bulk DMA at the
  (Pallas)     first tile, <= SMEM_RESIDENT_BUDGET), each tile loops over
               ONLY its shortlist via scalar-prefetched ids
               (``pltpu.PrefetchScalarGridSpec``) — zero conds, zero
               wasted clusters.

Tiling is 2-D over 32 x 128 PIXEL rectangles when the caller passes the
image shape (``hw=``): row-major lanes make a (SUB, 128) tile a full-width
strip that crosses most of the scene, while a 32 x 128 rectangle hugs it —
measured 4.9 -> 20+ fps on the bunny+teapot frame.  Flat ray sets (no hw)
degenerate to the strip tiling, no data movement either way.

Returns (t, triangle-index) like ``ops.packet.nearest``, so the Whitted /
BVH-stage model reuses ``intersect.assemble_hit`` and the whole shading
path unchanged (``models/mesh.py`` method="fused").  Capacity: bounded by
SMEM residency (~90 clusters x 128 triangles); larger meshes stay on the
streaming packet path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_based_ray_tracer_tpu.ops.fused import NO_HIT, SUB, _DET_EPS
from cpu_based_ray_tracer_tpu.ops.fused_mesh import (
    MESH_NF, SMEM_RESIDENT_BUDGET, build_smem_clusters)


class CoherentPack(NamedTuple):
    """Cluster table + AABBs for the shortlist intersector."""

    tri: jax.Array     # (C, CS*MESH_NF//128, 128) f32 rows (idx in slot 13)
    aabb: jax.Array    # (C, 8) f32
    cs: int
    n_tri: int


def pack_coherent(scene, cluster_size: int = 128) -> CoherentPack:
    """Cluster the scene's full triangle set (BVH preorder, packed full
    clusters) for the shortlist kernels."""
    tr = scene.triangles
    v0 = np.asarray(tr.v0, np.float64)
    e1 = np.asarray(tr.e1, np.float64)
    e2 = np.asarray(tr.e2, np.float64)
    verts = np.stack([v0, v0 + e1, v0 + e2], 1)
    smc = build_smem_clusters(verts, np.asarray(tr.normal, np.float32),
                              np.asarray(tr.material, np.float32),
                              cluster_size=cluster_size)
    return CoherentPack(tri=smc.tri, aabb=smc.aabb, cs=smc.cs,
                        n_tri=int(tr.count))


def fits_resident(pack: CoherentPack) -> bool:
    c = pack.aabb.shape[0]
    return c * pack.cs * MESH_NF * 4 <= SMEM_RESIDENT_BUDGET


# --------------------------------------------------------------------------
# Mask pass
# --------------------------------------------------------------------------

def _mask_kernel(caabb_ref, rays_ref, m_out, *, n_cl: int, t_min: float,
                 has_lim: bool):
    f32 = jnp.float32
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    lim = rays_ref[6] if has_lim else None

    def sinv(v):
        tiny = jnp.where(v < 0.0, f32(-1e-20), f32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    ivx, ivy, ivz = sinv(dx), sinv(dy), sinv(dz)
    t_lo = jnp.minimum(f32(t_min), 0.0)
    if has_lim:
        hi_bound = lim * 1.000001 + 1e-5
    words = [jnp.zeros(ox.shape, jnp.uint32)
             for _ in range((n_cl + 31) // 32)]
    for b in range(n_cl):
        bx0, by0, bz0 = caabb_ref[b, 0], caabb_ref[b, 1], caabb_ref[b, 2]
        bx1, by1, bz1 = caabb_ref[b, 3], caabb_ref[b, 4], caabb_ref[b, 5]
        tx0 = (bx0 - ox) * ivx
        tx1 = (bx1 - ox) * ivx
        ty0 = (by0 - oy) * ivy
        ty1 = (by1 - oy) * ivy
        tz0 = (bz0 - oz) * ivz
        tz1 = (bz1 - oz) * ivz
        t_in = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        t_out = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
        crossed = (t_out >= t_lo) & (t_in <= t_out)
        if has_lim:
            crossed = crossed & (t_in <= hi_bound)
        words[b // 32] = words[b // 32] | jnp.where(
            crossed, jnp.uint32(1 << (b % 32)), jnp.uint32(0))
    for w in range(len(words)):
        m_out[w] = words[w]


@functools.partial(jax.jit, static_argnames=("n_cl", "t_min", "interpret"))
def _shortlists(caabb, rays, *, n_cl: int, t_min: float, interpret: bool):
    """(gh*gw*C,) shortlist ids + (gh*gw,) counts for a (P, Hp, Wp)
    ray-plane set (P=6, or 7 with a lim plane)."""
    p, hp, wp = rays.shape
    gh, gw = hp // SUB, wp // 128
    b32 = (n_cl + 31) // 32
    masks = pl.pallas_call(
        functools.partial(_mask_kernel, n_cl=n_cl, t_min=t_min,
                          has_lim=(p == 7)),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(caabb.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((p, SUB, 128), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b32, SUB, 128), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b32, hp, wp), jnp.uint32),
        interpret=interpret,
    )(caabb, rays)
    tile_bits = jax.lax.reduce(
        masks.reshape(b32, gh, SUB, gw, 128), jnp.uint32(0),
        jax.lax.bitwise_or, (2, 4))                        # (b32, gh, gw)
    tile_bits = tile_bits.reshape(b32, gh * gw)
    c_idx = jnp.arange(n_cl, dtype=jnp.uint32)
    word = tile_bits[c_idx // 32]                          # (C, T)
    bset = ((word >> (c_idx % 32)[:, None]) & 1).astype(jnp.int32)
    cnts = jnp.sum(bset, axis=0).astype(jnp.int32)         # (T,)
    ids = jnp.argsort(1 - bset, axis=0, stable=True)       # set bits first
    return ids.T.astype(jnp.int32).reshape(-1), cnts


# --------------------------------------------------------------------------
# Shortlist sweep
# --------------------------------------------------------------------------

def _sweep_kernel(cnts_ref, ids_ref, rays_ref, tri_hbm, out_ref, tri_smem,
                  sem, *, n_cl: int, cs: int, t_min: float, gw: int):
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * gw + j

    @pl.when(tile == 0)
    def _():
        dma = pltpu.make_async_copy(tri_hbm, tri_smem, sem)
        dma.start()
        dma.wait()

    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

    def at(c, k, jj):
        f = k * MESH_NF + jj
        return tri_smem[c, f // 128, f % 128]

    def body(c, carry):
        cid = ids_ref[tile * n_cl + c]
        best_t, bidx = carry
        for k in range(cs):
            v0x, v0y, v0z = at(cid, k, 0), at(cid, k, 1), at(cid, k, 2)
            e1x, e1y, e1z = at(cid, k, 3), at(cid, k, 4), at(cid, k, 5)
            e2x, e2y, e2z = at(cid, k, 6), at(cid, k, 7), at(cid, k, 8)
            tix = at(cid, k, 13)
            s1x = dy * e2z - dz * e2y
            s1y = dz * e2x - dx * e2z
            s1z = dx * e2y - dy * e2x
            det = s1x * e1x + s1y * e1y + s1z * e1z
            okd = jnp.abs(det) > _DET_EPS
            inv = 1.0 / jnp.where(okd, det, f32(1.0))
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            t = (s2x * e2x + s2y * e2y + s2z * e2z) * inv
            b1 = (s1x * sx + s1y * sy + s1z * sz) * inv
            b2 = (s2x * dx + s2y * dy + s2z * dz) * inv
            ok = (okd & (t > t_min) & (b1 >= 0.0) & (b2 >= 0.0)
                  & (1.0 - b1 - b2 >= 0.0) & (t < best_t))
            best_t = jnp.where(ok, t, best_t)
            bidx = jnp.where(ok, tix, bidx)
        return best_t, bidx

    z = jnp.zeros(ox.shape, f32)
    carry = jax.lax.fori_loop(0, cnts_ref[tile],
                              body, (jnp.full(ox.shape, f32(NO_HIT)),
                                     z - 1.0))
    out_ref[0] = carry[0]
    out_ref[1] = carry[1]


def _to_planes(origin, direction, hw: Optional[tuple]):
    """(R, 3) x2 -> (6, Hp, Wp) padded planes + the (h, w, r) to recover.

    With ``hw`` and a full-image ray set, tiles are 32 x 128 PIXEL
    rectangles; otherwise row-major 4096-lane strips."""
    r = origin.shape[0]
    if hw is not None and hw[0] * hw[1] == r:
        h, w = hw
    else:
        w = 128
        h = -(-r // w)
    hp = -(-h // SUB) * SUB
    wp = -(-w // 128) * 128
    rays = jnp.concatenate([origin.T, direction.T], 0)          # (6, R)
    if h * w != r:
        rays = jnp.concatenate(
            [rays, jnp.zeros((6, h * w - r), jnp.float32)
             .at[3:6].set(1.0)], 1)
    rays = rays.reshape(6, h, w)
    if (hp, wp) != (h, w):
        rays = jnp.pad(rays, ((0, 0), (0, hp - h), (0, wp - w)))
        rays = rays.at[3:6, h:, :].set(1.0)
        rays = rays.at[3:6, :, w:].set(1.0)
    return rays, (h, w, r)


def _from_planes(out, shape):
    h, w, r = shape
    return out[:, :h, :w].reshape(out.shape[0], h * w)[:, :r]


@functools.partial(jax.jit,
                   static_argnames=("n_cl", "cs", "t_min", "hw",
                                    "interpret"))
def nearest(pack_tri, pack_aabb, origin, direction, *, n_cl: int, cs: int,
            t_min: float, hw: Optional[tuple] = None,
            interpret: bool = False):
    """Nearest (t, triangle-index) per ray for a coherent ray set.

    origin/direction: (R, 3).  ``hw=(h, w)``: the rays are a row-major
    h x w image — tile over 32 x 128 pixel rectangles (the fast path).
    Misses: (NO_HIT_T, -1)."""
    rays, shape = _to_planes(origin, direction, hw)
    _, hp, wp = rays.shape
    gh, gw = hp // SUB, wp // 128
    ids, cnts = _shortlists(pack_aabb, rays, n_cl=n_cl, t_min=t_min,
                            interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec((6, SUB, 128), lambda i, j, c, d: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, SUB, 128), lambda i, j, c, d: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((n_cl, cs * MESH_NF // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sweep_kernel, n_cl=n_cl, cs=cs, t_min=t_min,
                          gw=gw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(cnts, ids, rays, pack_tri)
    out = _from_planes(out, shape)
    from cpu_based_ray_tracer_tpu.ops import intersect
    tt = jnp.where(out[0] < NO_HIT, out[0], intersect.NO_HIT_T)
    return tt, out[1].astype(jnp.int32)

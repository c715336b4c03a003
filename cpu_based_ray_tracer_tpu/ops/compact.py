"""In-kernel stream compaction primitives for Pallas TPU kernels (r5).

The r4 fused mesh engine compacted its mesh-crossing lanes through XLA
(cumsum -> scatter -> gather), measured at ~5.5 ms per round-trip over an
896^2 wavefront on the v5e — ~40% of the whole bounce step
(tools/exp_inkernel_compact.py).  These helpers implement the same
lane-packing INSIDE a kernel, in ~0.9 ms standalone (and ~0.3 ms fused into
a producer kernel that already holds the planes in registers):

- ``tile_prefix_pos``: exclusive prefix sum of a (SUB, 128) 0/1 mask over
  the row-major flattened lane order, via Hillis-Steele ``pltpu.roll`` adds
  (Mosaic has no cumsum lowering).
- ``funnel_pack``: classic compaction-by-binary-shifts.  Each set lane must
  move left by d = flat_index - prefix, which is nondecreasing over the set
  lanes, so moving the bit-k movers left by 2^k (LSB to MSB) never
  collides.  12 stages for a 4096-lane tile.

Packed lanes are appended 128-row-aligned to a shared output block whose
BlockSpec index_map is constant (the block is revisited by every grid
step); the running row offset lives in SMEM scratch, which persists across
the sequential grid (``dimension_semantics=("arbitrary",)``).

These run identically under the Pallas interpreter (tests) and on
hardware; see tests/test_compact.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def flat_shift_left(x, r: int):
    """y[i] = x[i + r] of the row-major flattened (S, 128) plane (r static,
    0 <= r < S*128).  The trailing r lanes receive circular garbage — mask
    them at the call site (``funnel_pack`` does)."""
    if r == 0:
        return x
    row, lane = divmod(r, 128)
    sub = x.shape[0]
    a = pltpu.roll(x, (sub - row) % sub, 0) if row else x
    if lane == 0:
        return a
    lo = pltpu.roll(a, 128 - lane, 1)                 # lanes < 128 - lane
    hi = pltpu.roll(pltpu.roll(a, sub - 1, 0), 128 - lane, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(li < 128 - lane, lo, hi)


def tile_prefix_pos(pred_i32):
    """Exclusive prefix sum of the row-major flattened (S, 128) 0/1 mask."""
    sub = pred_i32.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 1)
    inc = pred_i32
    for k in range(7):                                      # within rows
        r = 1 << k
        inc = inc + jnp.where(li >= r, pltpu.roll(inc, r, 1), 0)
    row_tot = jax.lax.broadcast_in_dim(inc[:, 127], pred_i32.shape, (0,))
    si = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 0)
    off = row_tot
    for k in range(max(sub.bit_length() - 1, 0)):           # across rows
        r = 1 << k
        off = off + jnp.where(si >= r, pltpu.roll(off, r, 0), 0)
    return inc - pred_i32 + (off - row_tot)                 # exclusive flat


def funnel_unpack(planes, target_i32, valid_i32):
    """Inverse of ``funnel_pack``: move the first elements of each (S, 128)
    plane (flattened order, positions where ``valid``) RIGHT to their
    per-element ``target`` lane (0 <= target < S*128, strictly increasing
    over the valid elements — e.g. the packed global-lane ids minus the
    tile base).

    Returns (unpacked_planes, landed_i32) where ``landed`` marks lanes that
    received an element; all other lanes hold garbage.  Same
    compaction-by-binary-shifts argument as the pack (d = target - position
    is nondecreasing over the valid elements), mirrored."""
    sub = target_i32.shape[0]
    lanes = sub * 128
    si = jax.lax.broadcasted_iota(jnp.int32, target_i32.shape, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, target_i32.shape, 1)
    flat = si * 128 + li
    live = valid_i32
    rem = jnp.where(valid_i32 != 0, target_i32 - flat, 0)
    out = list(planes)
    # MSB -> LSB: moving RIGHT with nondecreasing distances, the big moves
    # must clear space ahead first (the LSB-first order of the left-pack
    # would collide: el at 1 staying while el at 0 moves onto it).
    for k in reversed(range((lanes - 1).bit_length())):
        r = 1 << k
        in_live = _flat_shift_right(live, r)
        in_rem = _flat_shift_right(rem, r)
        take = ((in_live != 0) & ((in_rem & r) != 0)
                & (flat - r >= 0))              # mask the circular head
        stay = (live != 0) & ((rem & r) == 0)
        rem = jnp.where(take, in_rem - r, rem)
        for j in range(len(out)):
            out[j] = jnp.where(take, _flat_shift_right(out[j], r), out[j])
        live = (take | stay).astype(jnp.int32)
    return out, live


def _flat_shift_right(x, r: int):
    """y[i] = x[i - r] of the row-major flattened (S, 128) plane (r static).
    The leading r lanes receive circular garbage — mask at the call site."""
    if r == 0:
        return x
    row, lane = divmod(r, 128)
    sub = x.shape[0]
    a = pltpu.roll(x, row % sub, 0) if row else x
    if lane == 0:
        return a
    hi = pltpu.roll(a, lane, 1)                      # lanes >= lane
    lo = pltpu.roll(pltpu.roll(a, 1, 0), lane, 1)    # lanes < lane
    li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(li >= lane, hi, lo)


def funnel_pack(planes, pred_i32):
    """Pack the lanes where pred to the flattened front of each (S, 128)
    plane.  Returns (packed_planes, count); lanes >= count hold garbage
    (stale or duplicated values) that the caller must mask."""
    sub = pred_i32.shape[0]
    lanes = sub * 128
    pos = tile_prefix_pos(pred_i32)
    count = pos[sub - 1, 127] + pred_i32[sub - 1, 127]
    si = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 1)
    flat = si * 128 + li
    live = pred_i32
    rem = jnp.where(pred_i32 != 0, flat - pos, 0)
    out = list(planes)
    for k in range((lanes - 1).bit_length()):               # LSB -> MSB
        r = 1 << k
        in_live = flat_shift_left(live, r)
        in_rem = flat_shift_left(rem, r)
        take = ((in_live != 0) & ((in_rem & r) != 0)
                & (flat + r < lanes))           # mask the circular tail
        stay = (live != 0) & ((rem & r) == 0)
        rem = jnp.where(take, in_rem - r, rem)
        for j in range(len(out)):
            out[j] = jnp.where(take, flat_shift_left(out[j], r), out[j])
        live = (take | stay).astype(jnp.int32)
    return out, count

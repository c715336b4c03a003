"""Prototype: IN-KERNEL stream compaction on TPU (r5 experiment).

Goal (VERDICT r4 next #1a): replace the per-step XLA compaction round-trip
(cumsum -> scatter idx -> gather 6 planes, ~2.5 ms + dispatch) with an
in-kernel pack: each sequential grid step packs its tile's predicated lanes
(monotone funnel shift) and appends them, 128-row-aligned, to a shared
output block at a running offset carried in SMEM scratch.

Techniques validated here before they land in ops/fused_mesh.py:
  1. flattened (SUB, 128) left-shift by r via two pltpu.rolls + lane select;
  2. monotone funnel pack: lanes move left by d = i - prefix(pred), one
     bit-plane per stage (d nondecreasing over set lanes -> collision-free);
  3. output BlockSpec with constant index_map (the whole buffer revisited
     every grid step) + dynamic sublane-offset writes;
  4. SMEM scratch carrying the running row offset across sequential grid
     steps (dimension_semantics=("arbitrary",)).

Run: PYTHONPATH=.:/root/.axon_site python tools/exp_inkernel_compact.py
     [--interpret] [--bench]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32          # sublane rows per tile
LANES = SUB * 128


def _flat_shift_left(x, r):
    """y[i] = x[i + r] of the row-major flattened (SUB, 128) plane.

    r static.  Tail garbage (the last r lanes) is arbitrary (circular)."""
    if r == 0:
        return x
    row, lane = divmod(r, 128)
    sub = x.shape[0]
    a = pltpu.roll(x, (sub - row) % sub, 0) if row else x
    if lane == 0:
        return a
    lo = pltpu.roll(a, 128 - lane, 1)            # correct for l < 128-lane
    hi = pltpu.roll(pltpu.roll(a, sub - 1, 0), 128 - lane, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(li < 128 - lane, lo, hi)


def _tile_prefix_pos(pred_i32):
    """Exclusive prefix sum of the row-major flattened (SUB, 128) mask.

    Hillis-Steele roll-adds (Mosaic has no cumsum lowering)."""
    sub = pred_i32.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 1)
    inc = pred_i32
    for k in range(7):                                      # within rows
        r = 1 << k
        inc = inc + jnp.where(li >= r, pltpu.roll(inc, r, 1), 0)
    row_tot = jax.lax.broadcast_in_dim(inc[:, 127], pred_i32.shape, (0,))
    si = jax.lax.broadcasted_iota(jnp.int32, pred_i32.shape, 0)
    off = row_tot
    for k in range(sub.bit_length() - 1):                   # across rows
        r = 1 << k
        off = off + jnp.where(si >= r, pltpu.roll(off, r, 0), 0)
    row_off = off - row_tot                                 # exclusive rows
    return inc - pred_i32 + row_off                         # exclusive flat


def _funnel_pack(planes, pred):
    """Pack lanes where pred to the flattened front of each (SUB, 128) plane.

    Classic compaction-by-binary-shifts: each set lane must move left by
    d = flat_index - exclusive_prefix(pred), which is nondecreasing over the
    set lanes, so shifting the bit-k movers left by 2^k (LSB to MSB) is
    collision-free.  Returns (packed_planes, count); lanes >= count hold
    garbage (stale / duplicated values) that the caller must mask.

    pred: (SUB, 128) int32 0/1."""
    pos = _tile_prefix_pos(pred)
    count = pos[SUB - 1, 127] + pred[SUB - 1, 127]
    si = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
    flat = si * 128 + li
    live = pred
    rem = jnp.where(pred != 0, flat - pos, 0)
    out = list(planes)
    nbits = (LANES - 1).bit_length()
    for k in range(nbits):                     # LSB -> MSB
        r = 1 << k
        in_live = _flat_shift_left(live, r)
        in_rem = _flat_shift_left(rem, r)
        # the flattened shift wraps circularly at the tile end: lanes whose
        # source index >= LANES carry garbage and must not be taken
        take = ((in_live != 0) & ((in_rem & r) != 0)
                & (flat + r < LANES))
        stay = (live != 0) & ((rem & r) == 0)
        rem = jnp.where(take, in_rem - r, rem)
        for j in range(len(out)):
            mv = _flat_shift_left(out[j], r)
            out[j] = jnp.where(take, mv, out[j])
        live = (take | stay).astype(jnp.int32)
    return out, count


def _compact_kernel(x_ref, pred_ref, out_ref, cnt_ref, off_sm, *,
                    cap_rows: int, n_planes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        off_sm[0] = 0

    pred = pred_ref[0]
    planes = [x_ref[j] for j in range(n_planes)]
    packed, count = _funnel_pack(planes, pred)
    # mask the garbage tail of the id plane (plane n_planes-1 by convention)
    li = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
    si = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 0)
    flat = si * 128 + li
    packed[n_planes - 1] = jnp.where(flat < count,
                                     packed[n_planes - 1],
                                     jnp.float32(-1.0))
    off = off_sm[0]

    @pl.when(off + SUB <= cap_rows)
    def _():
        for j in range(n_planes):
            out_ref[j, pl.ds(off, SUB), :] = packed[j]

    used = (count + 127) // 128          # 128-aligned append
    off_sm[0] = off + used

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = off_sm[0]


@functools.partial(jax.jit, static_argnames=("cap_rows", "interpret"))
def compact(x, pred, *, cap_rows: int, interpret: bool):
    n_planes, rows, _ = x.shape
    g = rows // SUB
    out, cnt = pl.pallas_call(
        functools.partial(_compact_kernel, cap_rows=cap_rows,
                          n_planes=n_planes),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n_planes, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_planes, cap_rows, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_planes, cap_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, pred)
    return out, cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--rows", type=int, default=6272)   # 896*896/128
    ap.add_argument("--density", type=float, default=0.115)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    rows = args.rows
    n_planes = 7
    lanes = rows * 128
    x = rng.standard_normal((n_planes - 1, rows, 128)).astype(np.float32)
    ids = np.arange(lanes, dtype=np.float32).reshape(1, rows, 128)
    x = np.concatenate([x, ids], 0)
    pred = (rng.random((1, rows, 128)) < args.density).astype(np.int32)
    cap_rows = rows // 4

    out, cnt = compact(jnp.asarray(x), jnp.asarray(pred),
                       cap_rows=cap_rows, interpret=args.interpret)
    out = np.asarray(out)
    cnt = int(np.asarray(cnt)[0, 0])

    # reference: per-tile 128-aligned append
    exp_chunks = []
    off = 0
    predf = pred[0]
    for t in range(rows // SUB):
        sl = slice(t * SUB, (t + 1) * SUB)
        m = predf[sl].reshape(-1) != 0
        vals = x[:, sl].reshape(n_planes, -1)[:, m]
        k = vals.shape[1]
        used = -(-k // 128)
        buf = np.full((n_planes, used * 128), -1.0, np.float32)
        buf[:, :k] = vals
        buf[:n_planes - 1, k:] = 0  # garbage data lanes unchecked
        exp_chunks.append((off, k, vals))
        off += used
    print(f"population: {int(predf.sum())}  packed rows: {cnt} "
          f"(expect {off})  cap_rows: {cap_rows}")
    assert cnt == off, (cnt, off)
    ok = True
    for off_r, k, vals in exp_chunks:
        got = out[:, off_r:, :].reshape(n_planes, -1)[:, :k]
        if not np.array_equal(got, vals):
            ok = False
            bad = np.nonzero(~np.isclose(got, vals))[1][:5]
            print(f"MISMATCH at chunk off={off_r} k={k} lanes {bad}")
            break
    # id-plane garbage tail must be -1 within each chunk's tail
    print("packed values:", "OK" if ok else "FAIL")

    if args.bench and not args.interpret:
        xj = jnp.asarray(x)
        pj = jnp.asarray(pred)
        compact(xj, pj, cap_rows=cap_rows, interpret=False)[0].block_until_ready()
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            o, c = compact(xj, pj, cap_rows=cap_rows, interpret=False)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"in-kernel compact ({lanes} lanes, {n_planes} planes): "
              f"{dt*1e3:.3f} ms")

        # XLA reference compaction for comparison
        cap = cap_rows * 128

        @jax.jit
        def xla_compact(x2, pred2):
            p = pred2.reshape(-1).astype(bool)
            k = p.astype(jnp.int32)
            csum = jnp.cumsum(k)
            pos = jnp.where(p, csum - 1, cap)
            idx = jnp.full((cap,), lanes, jnp.int32).at[pos].set(
                jnp.arange(lanes, dtype=jnp.int32), mode="drop")
            gi = jnp.clip(idx, 0, lanes - 1)
            return x2.reshape(n_planes, -1)[:, gi], csum[-1]

        xla_compact(xj, pj)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            o2, c2 = xla_compact(xj, pj)
        jax.block_until_ready(o2)
        dt2 = (time.perf_counter() - t0) / n
        print(f"XLA compact round-trip: {dt2*1e3:.3f} ms")


if __name__ == "__main__":
    main()

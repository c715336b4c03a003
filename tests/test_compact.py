"""Unit gates for the in-kernel compaction primitives (ops.compact).

Run through the Pallas interpreter on the CPU backend: a full
sequential-grid kernel appends each tile's packed lanes 128-row-aligned at
a running SMEM offset — the exact pattern the fused mesh engine uses.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_based_ray_tracer_tpu.ops import compact as cp

SUB = 8


def _pack_kernel(x_ref, pred_ref, out_ref, cnt_ref, off_sm, *,
                 cap_rows, n_planes):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        off_sm[0] = 0
        out_ref[n_planes - 1] = jnp.full(
            (cap_rows, 128), -1.0, jnp.float32)

    planes = [x_ref[j] for j in range(n_planes)]
    packed, count = cp.funnel_pack(planes, pred_ref[0])
    li = jax.lax.broadcasted_iota(jnp.int32, packed[0].shape, 1)
    si = jax.lax.broadcasted_iota(jnp.int32, packed[0].shape, 0)
    flat = si * 128 + li
    packed[n_planes - 1] = jnp.where(flat < count, packed[n_planes - 1],
                                     jnp.float32(-1.0))
    off = off_sm[0]

    @pl.when(off + SUB <= cap_rows)
    def _():
        for j in range(n_planes):
            out_ref[j, pl.ds(off, SUB), :] = packed[j]

    off_sm[0] = off + (count + 127) // 128

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = off_sm[0]


def _run(x, pred, cap_rows):
    n_planes, rows, _ = x.shape
    return pl.pallas_call(
        functools.partial(_pack_kernel, cap_rows=cap_rows,
                          n_planes=n_planes),
        grid=(rows // SUB,),
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
        interpret=True,
    )(x, pred)


def _reference(x, pred, cap_rows):
    """Per-tile 128-aligned append, numpy."""
    n_planes, rows, _ = x.shape
    chunks, off = [], 0
    for t in range(rows // SUB):
        m = pred[0, t * SUB:(t + 1) * SUB].reshape(-1) != 0
        vals = x[:, t * SUB:(t + 1) * SUB].reshape(n_planes, -1)[:, m]
        chunks.append((off, vals))
        off += -(-vals.shape[1] // 128)
    return chunks, off


def test_funnel_pack_density_sweep(rng_np):
    for density in (0.0, 0.03, 0.115, 0.5, 1.0):
        rows = 4 * SUB
        n_planes = 3
        x = rng_np.standard_normal((n_planes, rows, 128)).astype(np.float32)
        x[-1] = np.arange(rows * 128, dtype=np.float32).reshape(rows, 128)
        pred = (rng_np.random((1, rows, 128)) < density).astype(np.int32)
        cap = rows
        out, cnt = _run(jnp.asarray(x), jnp.asarray(pred), cap)
        out, cnt = np.asarray(out), int(np.asarray(cnt)[0, 0])
        chunks, off = _reference(x, pred, cap)
        assert cnt == off, density
        for off_r, vals in chunks:
            got = out[:, off_r:].reshape(n_planes, -1)[:, :vals.shape[1]]
            np.testing.assert_array_equal(got, vals, err_msg=f"d={density}")
        # id-plane garbage must be -1 everywhere beyond each chunk's data
        for (off_r, vals), (nxt, _) in zip(chunks, chunks[1:] + [(off, 0)]):
            k = vals.shape[1]
            tail = out[-1, off_r:].reshape(-1)[k:(nxt - off_r) * 128]
            assert (tail == -1.0).all()


def test_funnel_pack_overflow_skips_whole_tiles(rng_np):
    rows = 4 * SUB
    x = rng_np.standard_normal((2, rows, 128)).astype(np.float32)
    pred = np.ones((1, rows, 128), np.int32)
    cap = SUB  # only the first tile fits
    out, cnt = _run(jnp.asarray(x), jnp.asarray(pred), cap)
    assert int(np.asarray(cnt)[0, 0]) == rows          # demand reported
    np.testing.assert_array_equal(np.asarray(out)[0, :SUB], x[0, :SUB])


def test_funnel_unpack_inverts_pack(rng_np):
    for density in (0.0, 0.05, 0.3, 1.0):
        n_planes = 2
        x = rng_np.standard_normal((n_planes, SUB, 128)).astype(np.float32)
        x[-1] = np.arange(SUB * 128, dtype=np.float32).reshape(SUB, 128)
        pred = (rng_np.random((SUB, 128)) < density).astype(np.int32)

        def kern(x_ref, p_ref, o_ref, m_ref):
            planes = [x_ref[j] for j in range(n_planes)]
            packed, count = cp.funnel_pack(planes, p_ref[:, :])
            # round-trip: targets are the packed id plane (exact ints)
            tgt = packed[-1].astype(np.int32)
            si = jax.lax.broadcasted_iota(jnp.int32, tgt.shape, 0)
            li = jax.lax.broadcasted_iota(jnp.int32, tgt.shape, 1)
            flat = si * 128 + li
            un, landed = cp.funnel_unpack(packed, tgt,
                                          (flat < count).astype(jnp.int32))
            for j in range(n_planes):
                o_ref[j] = un[j]
            m_ref[0] = landed.astype(jnp.float32)

        out, mask = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((n_planes, SUB, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, SUB, 128), jnp.float32),
            ],
            interpret=True,
        )(jnp.asarray(x), jnp.asarray(pred))
        out, mask = np.asarray(out), np.asarray(mask)[0] != 0
        np.testing.assert_array_equal(mask, pred != 0, err_msg=f"{density}")
        for j in range(n_planes):
            np.testing.assert_array_equal(out[j][mask], x[j][pred != 0],
                                          err_msg=f"d={density} plane {j}")


def test_tile_prefix_pos_matches_numpy(rng_np):
    pred = (rng_np.random((SUB, 128)) < 0.3).astype(np.int32)

    def kern(p_ref, o_ref):
        o_ref[:, :] = cp.tile_prefix_pos(p_ref[:, :])

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((SUB, 128), jnp.int32),
        interpret=True,
    )(jnp.asarray(pred))
    flat = pred.reshape(-1)
    exp = np.cumsum(flat) - flat
    np.testing.assert_array_equal(np.asarray(out).reshape(-1), exp)

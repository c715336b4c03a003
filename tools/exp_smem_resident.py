"""Probe: SMEM-resident cluster table for the fused mesh kernels (r5).

Q1: how much SMEM scratch can one kernel allocate on the v5e (the whole
    5k-tri bunny = 40 clusters x 8 KB = 327 KB)?
Q2: cost of the nearest-hit cluster stream per (msub x 128)-lane tile when
    (a) every cluster is DMA'd double-buffered per tile (r4 engine),
    (b) one bulk DMA at tile 0 loads ALL clusters into persistent SMEM
        scratch and every tile reads from it (no per-cluster DMA, no conds),
    (c) same as (b) plus a per-tile skip on a dynamic row count (models the
        tail tiles beyond the packed population).

Run: PYTHONPATH=.:/root/.axon_site python tools/exp_smem_resident.py
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_based_ray_tracer_tpu.ops.fused import NO_HIT, _DET_EPS
from cpu_based_ray_tracer_tpu.ops.fused_mesh import MESH_NF

SUB = 32


def _mt_tri(carry, ox, oy, oz, dx, dy, dz, tri9, t_min):
    (best_t, bnx, bny, bnz, bmid) = carry
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, mid) = tri9
    f32 = jnp.float32
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
    return (jnp.where(ok, t, best_t), jnp.where(ok, nx, bnx),
            jnp.where(ok, ny, bny), jnp.where(ok, nz, bnz),
            jnp.where(ok, mid, bmid))


def _resident_kernel(cnt_ref, rays_ref, tri_hbm, out_ref, tri_smem, sem, *,
                     n_clusters: int, cs: int, t_min: float,
                     skip_by_count: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dma = pltpu.make_async_copy(tri_hbm, tri_smem, sem)
        dma.start()
        dma.wait()

    def body():
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

        def at(c, k, j):
            f = k * MESH_NF + j
            return tri_smem[c, f // 128, f % 128]

        def cluster(c, carry):
            for k in range(cs):
                tri9 = tuple(at(c, k, j) for j in range(13))
                carry = _mt_tri(carry, ox, oy, oz, dx, dy, dz, tri9, t_min)
            return carry

        z = jnp.zeros(ox.shape, jnp.float32)
        carry = (jnp.full(ox.shape, jnp.float32(NO_HIT)), z, z, z, z - 1.0)
        carry = jax.lax.fori_loop(0, n_clusters, cluster, carry)
        for p in range(5):
            out_ref[p] = carry[p]

    if skip_by_count:
        @pl.when(i * SUB < cnt_ref[0])
        def _():
            body()

        @pl.when(i * SUB >= cnt_ref[0])
        def _():
            for p in range(5):
                out_ref[p] = jnp.zeros(rays_ref[0].shape, jnp.float32)
    else:
        body()


def _stream_kernel(cnt_ref, rays_ref, tri_hbm, out_ref, tri_smem, sem, *,
                   n_clusters: int, cs: int, t_min: float,
                   skip_by_count: bool):
    """(a): per-cluster double-buffered DMA, no conds."""
    del skip_by_count
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

    def get_dma(slot, c):
        return pltpu.make_async_copy(tri_hbm.at[c], tri_smem.at[slot],
                                     sem.at[slot])

    def at(slot, k, j):
        f = k * MESH_NF + j
        return tri_smem[slot, f // 128, f % 128]

    get_dma(0, 0).start()

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_clusters)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        for k in range(cs):
            tri9 = tuple(at(slot, k, j) for j in range(13))
            carry = _mt_tri(carry, ox, oy, oz, dx, dy, dz, tri9, t_min)
        return carry

    z = jnp.zeros(ox.shape, jnp.float32)
    carry = (jnp.full(ox.shape, jnp.float32(NO_HIT)), z, z, z, z - 1.0)
    carry = jax.lax.fori_loop(0, n_clusters, body, carry)
    for p in range(5):
        out_ref[p] = carry[p]


@functools.partial(jax.jit, static_argnames=("mode", "n_clusters", "cs"))
def run(tri, rays, cnt, *, mode, n_clusters, cs):
    rows = rays.shape[1]
    g = rows // SUB
    if mode == "stream":
        kern, scratch = _stream_kernel, pltpu.SMEM(
            (2, cs * MESH_NF // 128, 128), jnp.float32)
        sems = pltpu.SemaphoreType.DMA((2,))
    else:
        kern, scratch = _resident_kernel, pltpu.SMEM(
            (n_clusters, cs * MESH_NF // 128, 128), jnp.float32)
        sems = pltpu.SemaphoreType.DMA(())
    out = pl.pallas_call(
        functools.partial(kern, n_clusters=n_clusters, cs=cs, t_min=1e-3,
                          skip_by_count=(mode == "skip")),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((6, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((5, SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, rows, 128), jnp.float32),
        scratch_shapes=[scratch, sems],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(cnt, rays, tri)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=40)
    ap.add_argument("--cs", type=int, default=128)
    ap.add_argument("--rows", type=int, default=768)  # ~98k lanes
    ap.add_argument("--count-rows", type=int, default=576)  # ~74k live
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    c, cs = args.clusters, args.cs
    tri = rng.standard_normal((c, cs * MESH_NF // 128, 128)).astype(
        np.float32)
    rays = rng.standard_normal((6, args.rows, 128)).astype(np.float32)
    tri_j, rays_j = jnp.asarray(tri), jnp.asarray(rays)
    cnt = jnp.asarray([args.count_rows], jnp.int32)

    smem_kb = c * cs * MESH_NF * 4 / 1024
    print(f"clusters={c} cs={cs} resident SMEM = {smem_kb:.0f} KB; "
          f"rows={args.rows} ({args.rows*128} lanes)")
    # numpy reference for a handful of rays (random "triangles" are junk
    # geometry but the winner-select math is exercised all the same)
    rows_f = tri.reshape(c * cs, MESH_NF)
    v0r, e1r, e2r = rows_f[:, 0:3], rows_f[:, 3:6], rows_f[:, 6:9]
    o_chk = rays[0:3, :2, :4].reshape(3, -1).T
    d_chk = rays[3:6, :2, :4].reshape(3, -1).T
    best_ref = []
    for o1, d1 in zip(o_chk, d_chk):
        s1 = np.cross(np.broadcast_to(d1, e2r.shape), e2r)
        det = (s1 * e1r).sum(-1)
        okd = np.abs(det) > _DET_EPS
        inv = 1.0 / np.where(okd, det, 1.0)
        sv = o1 - v0r
        s2 = np.cross(sv, e1r)
        t = (s2 * e2r).sum(-1) * inv
        b1 = (s1 * sv).sum(-1) * inv
        b2 = (s2 * np.broadcast_to(d1, e2r.shape)).sum(-1) * inv
        ok = okd & (t > 1e-3) & (b1 >= 0) & (b2 >= 0) & (1 - b1 - b2 >= 0)
        best_ref.append(t[ok].min() if ok.any() else NO_HIT)
    best_ref = np.float32(best_ref)

    for mode in ("stream", "resident", "skip"):
        try:
            out = run(tri_j, rays_j, cnt, mode=mode, n_clusters=c, cs=cs)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED — {str(e)[:300]}")
            continue
        got = np.asarray(out)[0, :2, :4].reshape(-1)
        match = np.allclose(got, best_ref, rtol=1e-4)
        print(f"{mode}: correctness {'OK' if match else 'FAIL'} "
              f"got={got[:3]} ref={best_ref[:3]}")
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(tri_j, rays_j, cnt, mode=mode, n_clusters=c, cs=cs)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        per_ct = dt / (args.rows // SUB) / c * 1e6
        print(f"{mode:9s}: {dt*1e3:7.3f} ms/pass   "
              f"{per_ct:6.2f} us per cluster-tile")


if __name__ == "__main__":
    main()

"""On-chip probes for the fused mesh-MC kernel design (round 4).

Validates the Mosaic primitives the planned ops/fused_mesh.py depends on:

P1. A Pallas kernel that keeps cluster triangle data in HBM (ANY memory
    space), and per fori_loop iteration conditionally (pl.when on a vector
    any()) DMAs one (CS, 16) cluster block into SMEM scratch, then reads
    per-triangle scalars from the scratch with static indices to drive
    (SUB, 128) vector math — the exact inner-loop structure of the planned
    kernel.
P2. Timing of the XLA stable-partition machinery: predicate -> cumsum ->
    scatter -> gather of a (19, 802816) plane stack (the per-step lane
    compaction cost).
P3. Timing of conditional skipping: the same kernel with the predicate
    always-false vs always-true tiles (does lax.cond/pl.when actually skip
    the DMA + triangle work per tile?).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
CS = 64          # triangles per cluster
C = 80           # clusters
NF = 16          # floats per triangle row


def kernel(thresh_ref, rays_ref, tri_hbm, out_ref, tri_smem, sem):
    """Per tile: loop clusters; if tile passes a fake cull (ox mean >
    thresh[c]), DMA cluster c into SMEM and run CS unrolled MT-ish ops."""
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    best = jnp.full(ox.shape, jnp.float32(1e30))

    def body(c, best):
        live = jnp.any(ox > thresh_ref[c])

        @pl.when(live)
        def _():
            dma = pltpu.make_async_copy(tri_hbm.at[c], tri_smem, sem)
            dma.start()
            dma.wait()

        def hit(best):
            b = best

            def at(k, j):
                f = k * NF + j
                return tri_smem[f // 128, f % 128]

            for k in range(CS):
                v0x = at(k, 0)
                v0y = at(k, 1)
                v0z = at(k, 2)
                e1x = at(k, 3)
                e1y = at(k, 4)
                e1z = at(k, 5)
                # a stand-in for ~12 fused MT ops
                t = (ox - v0x) * e1x + (oy - v0y) * e1y + (oz - v0z) * e1z
                b = jnp.minimum(b, t * t)
            return b

        return jax.lax.cond(live, hit, lambda b: b, best)

    best = jax.lax.fori_loop(0, C, body, best)
    out_ref[0] = best


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(thresh, rays, tri, interpret=False):
    g = rays.shape[1] // SUB
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, SUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, rays.shape[1], 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((CS * NF // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(thresh, rays, tri)


def bench(f, *args, n=20):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else \
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    print("backend:", jax.default_backend())
    L = 802816            # 896*896 lanes
    rows = L // 128
    rays = jnp.asarray(np.random.rand(3, rows, 128), jnp.float32)
    tri = jnp.asarray(np.random.rand(C, CS * NF // 128, 128), jnp.float32)

    # P1: compile + correctness smoke (all clusters pass)
    thresh = jnp.full((C,), -1.0, jnp.float32)
    out = run(thresh, rays, tri)
    print("P1 ok, out shape", out.shape, float(out[0, 0, 0]))

    # P3: all-pass vs none-pass timing
    t_all = bench(lambda: run(thresh, rays, tri))
    thresh_none = jnp.full((C,), 2.0, jnp.float32)
    t_none = bench(lambda: run(thresh_none, rays, tri))
    print(f"P3: all-pass {t_all*1e3:.3f} ms   none-pass {t_none*1e3:.3f} ms "
          f"(skip ratio {t_all/max(t_none,1e-9):.1f}x)")
    # op estimate for all-pass: C*CS*8 ops/lane
    ops = C * CS * 8 * L
    print(f"    all-pass implied {ops/t_all/1e12:.2f} Top/s")

    # P2: partition timing
    P = 19
    planes = jnp.asarray(np.random.rand(P, L).astype(np.float32))
    pred = jnp.asarray(np.random.rand(L) < 0.12)

    @jax.jit
    def partition(planes, pred):
        k = pred.astype(jnp.int32)
        csum = jnp.cumsum(k)
        total = csum[-1]
        lane = jnp.arange(L, dtype=jnp.int32)
        pos = jnp.where(pred, L - total + csum - 1, lane - csum)
        src = jnp.zeros((L,), jnp.int32).at[pos].set(lane)
        return planes[:, src], total

    t_part = bench(lambda: partition(planes, pred)[0])
    print(f"P2: partition of ({P},{L}) = {t_part*1e3:.3f} ms")

    @jax.jit
    def sortperm(planes, key):
        src = jnp.argsort(key)
        return planes[:, src]

    key = jnp.asarray(np.random.randint(0, 512, size=L).astype(np.int32))
    t_sort = bench(lambda: sortperm(planes, key))
    print(f"P2b: argsort+gather of ({P},{L}) = {t_sort*1e3:.3f} ms")


if __name__ == "__main__":
    main()

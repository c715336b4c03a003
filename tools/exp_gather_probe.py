"""XLA gather/scatter throughput probes for the compaction design."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, n=20):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    L = 802816
    CAP = 131072
    P = 6
    planes = jnp.asarray(np.random.rand(P, L).astype(np.float32))
    rows = jnp.asarray(np.ascontiguousarray(
        np.random.rand(L, 8).astype(np.float32)))
    idx_sorted = jnp.asarray(
        np.sort(np.random.choice(L, CAP, replace=False)).astype(np.int32))
    idx_rand = jnp.asarray(
        np.random.choice(L, CAP, replace=False).astype(np.int32))
    vals = jnp.asarray(np.random.rand(P, CAP).astype(np.float32))

    g1 = jax.jit(lambda: planes[:, idx_sorted])
    print(f"gather (P,L)[:, idx_sorted] {P}x{CAP}: {bench(g1)*1e3:.3f} ms")
    g1b = jax.jit(lambda: planes[:, idx_rand])
    print(f"gather (P,L)[:, idx_rand]:   {bench(g1b)*1e3:.3f} ms")
    g2 = jax.jit(lambda: rows[idx_sorted, :])
    print(f"gather (L,8)[idx_sorted]:    {bench(g2)*1e3:.3f} ms")
    g3 = jax.jit(lambda: jnp.take(planes[0], idx_sorted))
    print(f"take 1D (L,)[idx_sorted]:    {bench(g3)*1e3:.3f} ms")

    sc = jax.jit(lambda: jnp.full((P, L), 3.0).at[:, idx_sorted].set(vals))
    print(f"scatter (P,L)[:, idx] set:   {bench(sc)*1e3:.3f} ms")
    sc1 = jax.jit(lambda: jnp.full((L,), 3.0).at[idx_sorted].set(vals[0]))
    print(f"scatter 1D (L,) set:         {bench(sc1)*1e3:.3f} ms")

    pred = jnp.asarray(np.random.rand(L) < 0.13)

    @jax.jit
    def build_idx(pred):
        k = pred.astype(jnp.int32)
        csum = jnp.cumsum(k)
        pos = jnp.where(pred, csum - 1, CAP)  # overflow lanes -> dropped
        pos = jnp.minimum(pos, CAP)
        idx = jnp.full((CAP + 1,), 0, jnp.int32).at[pos].set(
            jnp.arange(L, dtype=jnp.int32), mode="drop")
        return idx[:CAP], csum[-1]

    bi = jax.jit(lambda: build_idx(pred)[0])
    print(f"build compact idx (cumsum+scatter): {bench(bi)*1e3:.3f} ms")

    # one fused step: build idx + gather 6 planes + scatter back 5 planes
    @jax.jit
    def full_roundtrip():
        idx, n = build_idx(pred)
        sub = planes[:, idx]
        out = jnp.full((5, L), np.float32(3.4e38)).at[:, idx].set(sub[:5])
        return out

    print(f"full roundtrip (idx+6g+5s):  {bench(full_roundtrip)*1e3:.3f} ms")


if __name__ == "__main__":
    main()

"""Profile denoiser passes on-chip at the reference viewport (r4)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from cpu_based_ray_tracer_tpu.ops import denoise


def bench(f, n=10):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    h = w = 896
    r = np.random.default_rng(0)
    g = denoise.GBuffer(
        color=jnp.asarray(r.random((h, w, 3), np.float32)),
        world_pos=jnp.asarray(r.random((h, w, 3), np.float32) * 5),
        normal=jnp.asarray(r.random((h, w, 3), np.float32)),
        contributor=jnp.asarray(r.random((h, w)) > 0.1),
        prim_id=jnp.asarray(r.integers(0, 30, (h, w)).astype(np.int32)),
        view=jnp.eye(4, dtype=jnp.float32),
        proj=jnp.eye(4, dtype=jnp.float32))
    prev = g

    f_at = jax.jit(lambda: denoise.joint_bilateral_atrous(g, 32))
    print(f"atrous k=32: {bench(f_at)*1e3:.2f} ms")
    f_t = jax.jit(lambda: denoise.temporal(g, prev, 3, 1.0, 0.2))
    print(f"temporal k=3: {bench(f_t)*1e3:.2f} ms")
    f_r = jax.jit(lambda: denoise.reproject(g.world_pos, prev.view,
                                            prev.proj, h, w))
    print(f"reproject: {bench(f_r)*1e3:.2f} ms")
    f_b = jax.jit(lambda: denoise._box_sum(g.color, 3))
    print(f"box_sum k=3: {bench(f_b)*1e3:.2f} ms")

    iy = jnp.asarray(r.integers(0, h, (h, w)).astype(np.int32))
    ix = jnp.asarray(r.integers(0, w, (h, w)).astype(np.int32))
    f_g = jax.jit(lambda: prev.color[iy, ix])
    print(f"2d fancy gather color: {bench(f_g)*1e3:.2f} ms")
    flat = (iy * w + ix).reshape(-1)
    f_g2 = jax.jit(lambda: jnp.take(prev.color.reshape(-1, 3), flat,
                                    axis=0).reshape(h, w, 3))
    print(f"1d take gather color: {bench(f_g2)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

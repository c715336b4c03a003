"""Decompose the fused-mesh step cost on-chip: packet pass, glue, kernels."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused_mesh, packet as packet_ops
from cpu_based_ray_tracer_tpu.scenes import cornell, meshes
from cpu_based_ray_tracer_tpu.utils import rng


def bench(f, n=10):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    scene = cornell.cornell_mesh_scene(meshes.icosphere(4, radius=1.0))
    cam = cornell.cornell_camera()
    size = 896
    cfg = RenderConfig(width=size, height=size, spp=8, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(1)
    mp = fused_mesh.pack_mesh_scene(scene, cluster_size=128)

    # Representative state: step the engine a bit.
    st = mc.wavefront_init(scene, cam, cfg, key)
    st, _, _ = fused_mesh.wavefront_steps_fused_mesh(mp, cam, cfg, key, st, 8)
    o = jnp.asarray(st.o)
    d = jnp.asarray(st.d)
    rp = o.shape[0]

    pred = np.asarray(fused_mesh._slab_crosses(
        o, d, mp.gate_lo, mp.gate_hi, cfg.t_min,
        jnp.full((rp,), 1e30, jnp.float32)))
    print("pred rate (no t_s cull):", pred.mean())

    cap = 200704
    idx = np.flatnonzero(pred)[:cap]
    n_real = len(idx)
    ro = np.asarray(o)[idx]
    rd = np.asarray(d)[idx]
    far = np.asarray(mp.gate_hi) + 1.0
    pad = cap - n_real
    ro_p = np.concatenate([ro, np.tile(far, (pad, 1))]).astype(np.float32)
    rd_p = np.concatenate(
        [rd, np.tile([0.0, 0.0, 1.0], (pad, 1))]).astype(np.float32)

    ro_j, rd_j = jnp.asarray(ro_p), jnp.asarray(rd_p)
    rays6 = jnp.concatenate([ro_j.T, rd_j.T], 0)
    C = mp.smc_aabb.shape[0]
    f1 = jax.jit(lambda: fused_mesh._mesh_pass(
        mp.smc_aabb, mp.smc_tri, rays6, n_clusters=C, cs=mp.cs,
        t_min=cfg.t_min, occl=False, interpret=False))
    print(f"smem nearest cap={cap} (real {n_real}): {bench(f1)*1e3:.2f} ms")

    n2 = ((n_real + 4095) // 4096) * 4096
    rays6t = rays6[:, :n2]
    f2 = jax.jit(lambda: fused_mesh._mesh_pass(
        mp.smc_aabb, mp.smc_tri, rays6t, n_clusters=C, cs=mp.cs,
        t_min=cfg.t_min, occl=False, interpret=False))
    print(f"smem nearest tight n={n2}: {bench(f2)*1e3:.2f} ms")

    # occlusion variant, same rays, lim=10
    lim = jnp.full((cap,), 10.0, jnp.float32)
    rays7 = jnp.concatenate([rays6, lim[None]], 0)
    f3 = jax.jit(lambda: fused_mesh._mesh_pass(
        mp.smc_aabb, mp.smc_tri, rays7, n_clusters=C, cs=mp.cs,
        t_min=cfg.t_min, occl=True, interpret=False))
    print(f"smem occl cap={cap}: {bench(f3)*1e3:.2f} ms")

    # all-miss floor
    far_r = jnp.concatenate([
        jnp.tile(jnp.asarray(far, jnp.float32)[:, None], (1, cap)),
        jnp.tile(jnp.asarray([0., 0., 1.], jnp.float32)[:, None], (1, cap))], 0)
    f4 = jax.jit(lambda: fused_mesh._mesh_pass(
        mp.smc_aabb, mp.smc_tri, far_r, n_clusters=C, cs=mp.cs,
        t_min=cfg.t_min, occl=False, interpret=False))
    print(f"smem nearest all-miss cap={cap}: {bench(f4)*1e3:.2f} ms")

    # cs=64 variant
    mp64 = fused_mesh.pack_mesh_scene(scene, cluster_size=64)
    C64 = mp64.smc_aabb.shape[0]
    f5 = jax.jit(lambda: fused_mesh._mesh_pass(
        mp64.smc_aabb, mp64.smc_tri, rays6t, n_clusters=C64, cs=64,
        t_min=cfg.t_min, occl=False, interpret=False))
    print(f"smem nearest cs=64 tight: {bench(f5)*1e3:.2f} ms")

    # glue: pred + compact + gather + scatter roundtrip at this scale
    @jax.jit
    def glue():
        ts = jnp.full((rp,), 1e30, jnp.float32)
        pr = fused_mesh._slab_crosses(o, d, mp.gate_lo, mp.gate_hi,
                                      cfg.t_min, ts)
        ix, of = fused_mesh._compact_indices(pr, cap, rp)
        gi = jnp.clip(ix, 0, rp - 1)
        ro = o[gi]
        rd = d[gi]
        vals = jnp.stack([ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 2]])
        out = jnp.full((5, rp), 1.0).at[:, ix].set(vals, mode="drop")
        return out

    print(f"glue roundtrip: {bench(glue)*1e3:.2f} ms")

    # one-hot light row + searchsorted-style select at full width
    light = mp.light

    @jax.jit
    def lightsample():
        from cpu_based_ray_tracer_tpu.ops import gather
        u = jnp.abs(o[:, 0]) % 1.0
        budget = u * light[-1, 15]
        li = jnp.sum(light[:, 15][None, :] <= budget[:, None], axis=-1)
        li = jnp.clip(li, 0, light.shape[0] - 1)
        return gather.take_rows(light, li)

    print(f"light sample glue: {bench(lightsample)*1e3:.2f} ms")



if __name__ == "__main__":
    main()

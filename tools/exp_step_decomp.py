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
    cl = mp.clusters

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
    f1 = jax.jit(lambda: packet_ops.nearest(cl, ro_j, rd_j, cfg.t_min)[0])
    t = bench(f1)
    print(f"packet nearest cap={cap} (real {n_real}): {t*1e3:.2f} ms")

    for blk in (512, 1024, 2048):
        n2 = ((n_real + blk - 1) // blk) * blk
        ro2, rd2 = jnp.asarray(ro_p[:n2]), jnp.asarray(rd_p[:n2])
        f2 = jax.jit(lambda ro2=ro2, rd2=rd2, blk=blk: packet_ops.nearest(
            cl, ro2, rd2, cfg.t_min, block=blk)[0])
        print(f"packet nearest tight n={n2} block={blk}: "
              f"{bench(f2)*1e3:.2f} ms")
    mp64 = fused_mesh.pack_mesh_scene(scene, cluster_size=64)
    for blk in (1024, 2048):
        n2 = ((n_real + blk - 1) // blk) * blk
        ro2, rd2 = jnp.asarray(ro_p[:n2]), jnp.asarray(rd_p[:n2])
        f2 = jax.jit(lambda ro2=ro2, rd2=rd2, blk=blk: packet_ops.nearest(
            mp64.clusters, ro2, rd2, cfg.t_min, block=blk)[0])
        print(f"packet cs=64 n={n2} block={blk}: {bench(f2)*1e3:.2f} ms")
    # octant+cell sorted rays: does the per-cluster cond start skipping?
    lo = np.asarray(mp.gate_lo); hi = np.asarray(mp.gate_hi)
    oct_ = ((rd[:, 0] > 0) + 2*(rd[:, 1] > 0) + 4*(rd[:, 2] > 0)).astype(int)
    cellk = 0
    for a in range(3):
        span = max(hi[a]-lo[a], 1e-6)
        cellk = cellk*4 + np.clip(((ro[:, a]-lo[a])/span*4).astype(int), 0, 3)
    order = np.argsort(oct_*64 + cellk, kind="stable")
    ro_s = np.concatenate([ro[order], np.tile(far, (pad, 1))]).astype(np.float32)
    rd_s = np.concatenate([rd[order], np.tile([0.,0.,1.], (pad,1))]).astype(np.float32)
    n2 = ((n_real + 1023) // 1024) * 1024
    ro2, rd2 = jnp.asarray(ro_s[:n2]), jnp.asarray(rd_s[:n2])
    f2s = jax.jit(lambda: packet_ops.nearest(cl, ro2, rd2, cfg.t_min)[0])
    print(f"packet SORTED tight n={n2} block=1024: {bench(f2s)*1e3:.2f} ms")

    # miss-only rays: measures the per-cluster cond skip floor
    ro3 = jnp.asarray(np.tile(far, (cap, 1)).astype(np.float32))
    rd3 = jnp.asarray(np.tile([0.0, 0.0, 1.0], (cap, 1)).astype(np.float32))
    f3 = jax.jit(lambda: packet_ops.nearest(cl, ro3, rd3, cfg.t_min)[0])
    print(f"packet nearest all-miss cap={cap}: {bench(f3)*1e3:.2f} ms")

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

    # mesh_attr row gather at cap
    jm = jnp.asarray(np.random.randint(0, mp.mesh_attr.shape[0],
                                       cap).astype(np.int32))
    f4 = jax.jit(lambda: mp.mesh_attr[jm])
    print(f"mesh_attr gather cap: {bench(f4)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

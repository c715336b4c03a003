"""Probe: entry-box sorting + tile height for the SMEM mesh kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused_mesh
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
    cfg = RenderConfig(width=896, height=896, spp=8, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(1)
    mp = fused_mesh.pack_mesh_scene(scene, cluster_size=128)
    st = mc.wavefront_init(scene, cam, cfg, key)
    st, _, _ = fused_mesh.wavefront_steps_fused_mesh(mp, cam, cfg, key, st, 8)
    o = np.asarray(st.o)
    d = np.asarray(st.d)
    rp = o.shape[0]
    pred = np.asarray(fused_mesh._slab_crosses(
        jnp.asarray(o), jnp.asarray(d), mp.gate_lo, mp.gate_hi, cfg.t_min,
        jnp.full((rp,), 1e30, jnp.float32)))
    idx = np.flatnonzero(pred)
    print("real:", len(idx))
    lo = np.asarray(mp.gate_lo); hi = np.asarray(mp.gate_hi)
    far = hi + 1.0

    def pad_to(r, cap, msub):
        cap = -(-len(r[0]) // (msub * 128)) * (msub * 128)
        padn = cap - len(r[0])
        ro = np.concatenate([r[0], np.tile(far, (padn, 1))]).astype(np.float32)
        rd = np.concatenate([r[1], np.tile([0., 0., 1.], (padn, 1))]).astype(np.float32)
        return jnp.concatenate([jnp.asarray(ro).T, jnp.asarray(rd).T], 0)

    C = mp.smc_aabb.shape[0]

    def run(rays6, msub):
        return jax.jit(lambda: fused_mesh._mesh_pass(
            mp.smc_aabb, mp.smc_tri, rays6, n_clusters=C, cs=mp.cs,
            t_min=cfg.t_min, occl=False, msub=msub, interpret=False))

    for msub in (8, 16, 32):
        rays6 = pad_to((o[idx], d[idx]), 0, msub)
        print(f"unsorted msub={msub}: {bench(run(rays6, msub))*1e3:.2f} ms")

    # entry-box key: 4x4x4 cell of the segment's AABB entry point + octant
    ro, rd = o[idx], d[idx]
    inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)
    t0s = (lo - ro) * inv
    t1s = (hi - ro) * inv
    t_in = np.maximum(np.minimum(t0s, t1s).max(-1), 0.0)
    entry = ro + t_in[:, None] * rd
    cell = 0
    for a in range(3):
        span = max(hi[a] - lo[a], 1e-6)
        cell = cell * 4 + np.clip(((entry[:, a] - lo[a]) / span * 4
                                   ).astype(int), 0, 3)
    octant = ((rd[:, 0] > 0) + 2 * (rd[:, 1] > 0) + 4 * (rd[:, 2] > 0))
    order = np.argsort(cell * 8 + octant, kind="stable")
    for msub in (8, 16, 32):
        rays6 = pad_to((ro[order], rd[order]), 0, msub)
        print(f"SORTED   msub={msub}: {bench(run(rays6, msub))*1e3:.2f} ms")

    # sort cost on-device for cap-sized key
    key32 = jnp.asarray((cell * 8 + octant).astype(np.int32))
    f_sort = jax.jit(lambda: jax.lax.sort_key_val(
        key32, jnp.arange(len(idx), dtype=jnp.int32))[1])
    print(f"sort_key_val n={len(idx)}: {bench(f_sort)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

"""On-chip bench of the fused mesh-MC engine (round 4 development tool)."""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused_mesh
from cpu_based_ray_tracer_tpu.scenes import cornell, meshes
from cpu_based_ray_tracer_tpu.utils import rng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=4)   # 4 -> 5120 tris
    ap.add_argument("--size", type=int, default=896)
    ap.add_argument("--cs", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--cap-main", type=int, default=0)
    ap.add_argument("--cap-shadow", type=int, default=0)
    ap.add_argument("--msub", type=int, default=0)
    ap.add_argument("--stream", action="store_true",
                    help="force per-cluster DMA streaming (no SMEM "
                         "residency)")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    scene = cornell.cornell_mesh_scene(
        meshes.icosphere(args.subdiv, radius=1.0))
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=args.size, height=args.size, spp=8,
                       max_depth=16, rr_survival=0.8)
    key = rng.render_key(1)
    mp = fused_mesh.pack_mesh_scene(scene, cluster_size=args.cs)
    print(f"tris: {scene.triangles.count} (smalls {mp.n_stri}, "
          f"mesh {int(mp.gate_mask.sum())}, clusters "
          f"{mp.smc_aabb.shape[0]} x {mp.cs})")

    state = mc.wavefront_init(scene, cam, cfg, key)
    rp = -(-args.size * args.size // 4096) * 4096
    kw = {"cap_main": args.cap_main or rp // 8,
          "cap_shadow": args.cap_shadow or rp // 12}
    if args.msub:
        kw["msub"] = args.msub
    if args.stream:
        kw["resident"] = False

    # warm up / compile
    t0 = time.perf_counter()
    st, of, np1 = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, state, args.steps, **kw)
    jax.block_until_ready(st.acc)
    lanes = args.size * args.size * args.steps
    print(f"compile+first: {time.perf_counter()-t0:.1f}s overflow={int(of)} "
          f"pred rates main={int(np1[0])/lanes:.3f} "
          f"shadow={int(np1[1])/lanes:.3f}")

    reps = args.reps
    t0 = time.perf_counter()
    st2 = st
    for _ in range(reps):
        st2, of2, np2 = fused_mesh.wavefront_steps_fused_mesh(
            mp, cam, cfg, key, st2, args.steps, **kw)
    jax.block_until_ready(st2.acc)
    print(f"steady pred rates main={int(np2[0])/lanes:.3f} "
          f"shadow={int(np2[1])/lanes:.3f}")
    dt = (time.perf_counter() - t0) / (reps * args.steps)
    rays = int(st2.nrays - st.nrays) / (reps * args.steps)
    print(f"ms/step: {dt*1e3:.3f}   rays/step: {rays:.0f}   "
          f"Mray/s: {rays/dt/1e6:.1f}   overflow={int(of2)}")
    print(f"mean n_done after {(1+reps)*args.steps} steps: "
          f"{float(jnp.mean(st2.n_done)):.2f}")


if __name__ == "__main__":
    main()

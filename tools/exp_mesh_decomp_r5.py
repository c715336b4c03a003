"""r5 decomposition of the fused-mesh step (cap ablation, on-chip).

Shrinking a cap to one tile removes that mesh pass's work while leaving
the rest of the step intact (overflow is reported; timing stays valid), so
full - capped = that pass's cost.  Variants sweep msub and residency.

Run: PYTHONPATH=.:/root/.axon_site python tools/exp_mesh_decomp_r5.py
"""

import time

import numpy as np

import jax

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.ops import fused_mesh
from cpu_based_ray_tracer_tpu.scenes import cornell, meshes
from cpu_based_ray_tracer_tpu.utils import rng


def main():
    scene = cornell.cornell_mesh_scene(meshes.icosphere(4, radius=1.0))
    cam = cornell.cornell_camera()
    size = 896
    cfg = RenderConfig(width=size, height=size, spp=8, max_depth=16,
                      rr_survival=0.8)
    key = rng.render_key(1)
    mp = fused_mesh.pack_mesh_scene(scene)
    rp = -(-size * size // 4096) * 4096
    st0 = mc.wavefront_init(scene, cam, cfg, key)
    # advance into the steady state first
    st0, _, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, cam, cfg, key, st0, 16, cap_main=rp // 8, cap_shadow=rp // 16)
    jax.block_until_ready(st0.acc)

    def run(tag, **kw):
        kw.setdefault("cap_main", rp // 8)
        kw.setdefault("cap_shadow", rp // 16)
        st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
            mp, cam, cfg, key, st0, 16, **kw)
        jax.block_until_ready(st.acc)
        st = st0
        t0 = time.perf_counter()
        for _ in range(3):
            st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
                mp, cam, cfg, key, st, 16, **kw)
        jax.block_until_ready(st.acc)
        dt = (time.perf_counter() - t0) / 48
        print(f"{tag:34s}: {dt*1e3:7.3f} ms/step  overflow={int(of)}")
        return dt

    full = run("full (capm rp/8, caps rp/16)")
    main1 = run("main mesh pass capped to 1 tile", cap_main=4096)
    sh1 = run("shadow pass capped to 1 tile", cap_shadow=4096)
    both = run("both capped to 1 tile", cap_main=4096, cap_shadow=4096)
    print(f"-> main mesh ~{(full-main1)*1e3:.2f} ms, "
          f"occl ~{(full-sh1)*1e3:.2f} ms, "
          f"K1/K1b/K2+scatters+dispatch ~{both*1e3:.2f} ms")
    run("msub=16", msub=16)
    run("msub=8", msub=8)
    run("stream (no SMEM residency)", resident=False)
    run("caps rp/6, rp/12", cap_main=rp // 6, cap_shadow=rp // 12)


if __name__ == "__main__":
    main()

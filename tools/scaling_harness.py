"""Scaling-efficiency harness: rays/s of the sharded fast engine vs mesh size.

BASELINE target: >=80% rays/s scaling efficiency going 1 chip -> 1 host ->
N hosts.  Real multi-chip hardware is not reachable from this environment
(one tunneled TPU chip; tests use 8 *virtual* CPU devices), so the harness
measures whatever mesh the current backend exposes and records the platform
honestly — on a virtual CPU mesh the numbers validate the *mechanism* (the
sharded stepper runs, collectives compile, per-device work divides), not
hardware scaling.  Run it unchanged on a real v5p slice for the real curve.

Usage: python tools/scaling_harness.py [--width 256 --height 256 --out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.parallel import (
    make_mesh, wavefront_init_sharded, wavefront_steps_sharded)
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def measure(mesh, cfg, n_steps=32, n_iters=4):
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    key = rng.render_key(0)
    step = jax.jit(lambda st: wavefront_steps_sharded(
        scene, cam, cfg, key, st, n_steps, mesh))
    st = wavefront_init_sharded(scene, cam, cfg, key, mesh)
    st = step(st)
    jax.block_until_ready(st.acc)          # compile + warm-up
    r0 = int(np.asarray(st.nrays))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        st = step(st)
    jax.block_until_ready(st.acc)
    dt = time.perf_counter() - t0
    return (int(np.asarray(st.nrays)) - r0) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    cfg = RenderConfig(width=args.width, height=args.height, spp=8,
                       max_depth=16, rr_survival=0.8)

    results = []
    for n in sizes:
        rps = measure(make_mesh(n), cfg)
        results.append({"mesh_size": n, "rays_per_s": rps})
        print(f"mesh {n}: {rps/1e6:.2f} Mrays/s", flush=True)

    base = results[0]["rays_per_s"]
    for r in results:
        r["efficiency_vs_1"] = r["rays_per_s"] / (base * r["mesh_size"])

    report = {
        "platform": jax.devices()[0].platform,
        "n_devices": n_dev,
        "virtual_cpu_mesh": jax.devices()[0].platform == "cpu",
        "workload": f"MC Cornell {args.width}x{args.height} wavefront stepper",
        "results": results,
    }
    out = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

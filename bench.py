"""Headline benchmark: rays/s/chip on the Monte Carlo Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU renderer sustains ~1e6 rays/s (BASELINE.md —
300 SPP in ~5 min at the 883x900 viewport on an i9-11980HK).

Ray accounting is honest: only lanes alive at each bounce (primary + shadow +
indirect rays actually contributing to the estimator) are counted, not the
masked dead lanes.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

CPU_BASELINE_RAYS_PER_S = 1.0e6


def main():
    scene = cornell.cornell_scene()
    camera = cornell.cornell_camera()
    # Reference-matched workload: the 883x900 viewport (BASELINE.md), RR 0.8.
    cfg = RenderConfig(width=896, height=896, spp=4, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(0)

    # Persistent wavefront stepper: fixed-step progressive engine, ~100% lane
    # utilization (each call advances every lane 32 bounce steps; dead paths
    # regenerate in place).  Ray counts come from the engine's own counter.
    n_steps = 32
    stepper = jax.jit(lambda st: monte_carlo.wavefront_steps(
        scene, camera, cfg, key, st, n_steps))

    state = monte_carlo.wavefront_init(scene, camera, cfg, key)
    state = stepper(state)
    jax.block_until_ready(state.acc)  # compile + warm-up
    rays0 = int(np.asarray(state.nrays))

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = stepper(state)
    jax.block_until_ready(state.acc)
    dt = time.perf_counter() - t0

    rays_per_s = (int(np.asarray(state.nrays)) - rays0) / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_mc_cornell",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / CPU_BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()

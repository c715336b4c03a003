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

    render = jax.jit(
        lambda k: monte_carlo.render_progressive(
            scene, camera, cfg, k,
            jax.numpy.zeros((cfg.height, cfg.width, 3), jax.numpy.float32),
            0)[0])

    # Rays per sample pass (counted once; identical distribution per pass).
    rays_per_pass = int(np.asarray(
        jax.jit(lambda k: monte_carlo.count_rays(scene, camera, cfg, k))(key)))
    rays_per_call = rays_per_pass * cfg.spp

    out = render(key)
    jax.block_until_ready(out)  # compile + warm-up

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render(rng.render_key(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    rays_per_s = rays_per_call / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_mc_cornell",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / CPU_BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()

"""On-chip denoiser-stage fps: fused 1-SPP G-buffer + atrous + temporal."""
import time
import jax
import numpy as np
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import denoiser as dn
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def main():
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=896, height=896, spp=1, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(0)
    params = dn.DenoiserParams()
    step0 = jax.jit(lambda i: dn.render_frame(scene, cam, cfg, key, i, None,
                                              params, engine="fused"))
    color, prev = step0(0)
    jax.block_until_ready(color)
    step = jax.jit(lambda i, prev: dn.render_frame(scene, cam, cfg, key, i,
                                                   prev, params,
                                                   engine="fused"))
    color, prev = step(1, prev)
    jax.block_until_ready(color)
    n = 20
    t0 = time.perf_counter()
    for i in range(2, 2 + n):
        color, prev = step(i, prev)
    jax.block_until_ready(color)
    dt = (time.perf_counter() - t0) / n
    print(f"fused denoiser frame: {dt*1e3:.2f} ms = {1/dt:.1f} fps "
          f"at {cfg.width}x{cfg.height}")

    # scan engine for comparison
    stepS = jax.jit(lambda i, prev: dn.render_frame(scene, cam, cfg, key, i,
                                                    prev, params,
                                                    engine="scan"))
    color, prev = stepS(1, prev)
    jax.block_until_ready(color)
    t0 = time.perf_counter()
    for i in range(2, 5):
        color, prev = stepS(i, prev)
    jax.block_until_ready(color)
    dt = (time.perf_counter() - t0) / 3
    print(f"scan denoiser frame:  {dt*1e3:.2f} ms = {1/dt:.1f} fps")


if __name__ == "__main__":
    main()

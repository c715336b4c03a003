"""Re-measure the XLA wavefront stepper a few times (variance vs regression),
and the same at the r3 commit's code would require a checkout — instead
verify the step count/time distribution on current code."""
import time

import numpy as np

import jax

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def main():
    scene, camera = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=896, height=896, spp=4, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(0)
    ns = 16
    step = jax.jit(lambda st: monte_carlo.wavefront_steps(
        scene, camera, cfg, key, st, ns))
    st = monte_carlo.wavefront_init(scene, camera, cfg, key)
    st = step(st)
    jax.block_until_ready(st.acc)
    for rep in range(6):
        r0 = int(np.asarray(st.nrays))
        t0 = time.perf_counter()
        for _ in range(3):
            st = step(st)
        jax.block_until_ready(st.acc)
        dt = time.perf_counter() - t0
        rays = int(np.asarray(st.nrays)) - r0
        print(f"rep {rep}: {dt/(3*ns)*1e3:.3f} ms/step  "
              f"{rays/dt/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, dataclasses
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_scene(); camera = cornell.cornell_camera()
cfg = RenderConfig(width=448, height=448, spp=4, max_depth=8)
key = rng.render_key(0)

def make(render_fn):
    def loss(albedo):
        mats = dataclasses.replace(scene.materials, albedo=albedo)
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(render_fn(s, camera, cfg, key) ** 2)
    return jax.jit(jax.value_and_grad(loss))

a0 = scene.materials.albedo
g_std = make(monte_carlo.render)
g_rep = make(monte_carlo.render_replay)
fwd = jax.jit(lambda a: monte_carlo.render(dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a)), camera, cfg, key))
for name, fn in [("fwd", fwd), ("grad_std", g_std), ("grad_replay", g_rep)]:
    r = fn(a0); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5): r = fn(a0)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/5*1e3, 2), "ms")
v1, gr1 = g_std(a0); v2, gr2 = g_rep(a0)
print("loss equal:", float(v1), float(v2), "grad maxdiff:", float(jnp.max(jnp.abs(gr1-gr2))))

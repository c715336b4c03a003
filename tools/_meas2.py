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
key = rng.render_key(0); seed = rng.seed_from_key(key)

# Build per-sample records once (stacked over spp by vmap-free loop + stack)
def record_all(s_albedo):
    mats = dataclasses.replace(scene.materials, albedo=s_albedo)
    s = dataclasses.replace(scene, materials=mats)
    def one(c, smp):
        o, d, pixel = monte_carlo._primary_rays(camera, cfg, seed, smp)
        _, rec = monte_carlo.trace(s, o, d, cfg, seed=seed, pixel=pixel, sample=smp, return_record=True)
        return c, rec
    _, recs = jax.lax.scan(one, 0, jnp.arange(cfg.spp))
    return recs

rec_j = jax.jit(record_all)
recs = jax.block_until_ready(rec_j(scene.materials.albedo))

def replay_img(albedo, recs):
    mats = dataclasses.replace(scene.materials, albedo=albedo)
    s = dataclasses.replace(scene, materials=mats)
    def one(acc, xs):
        smp, rec = xs
        o, d, pixel = monte_carlo._primary_rays(camera, cfg, seed, smp)
        rad = monte_carlo.trace(s, o, d, cfg, seed=seed, pixel=pixel, sample=smp, record=rec)
        return acc + rad.reshape(cfg.height, cfg.width, 3), None
    acc, _ = jax.lax.scan(one, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), (jnp.arange(cfg.spp), recs))
    return acc / cfg.spp

f_replay = jax.jit(replay_img)
g_replay = jax.jit(jax.value_and_grad(lambda a, r: jnp.mean(replay_img(a, r) ** 2)))
f_fwd = jax.jit(lambda a: monte_carlo.render(dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a)), camera, cfg, key))
a0 = scene.materials.albedo
for name, fn, args in [("record_pass", rec_j, (a0,)), ("replay_fwd", f_replay, (a0, recs)),
                       ("replay_grad(fixed trace)", g_replay, (a0, recs)), ("std_fwd", f_fwd, (a0,))]:
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5): r = fn(*args)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/5*1e3, 2), "ms")

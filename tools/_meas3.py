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

def record_all():
    def one(c, smp):
        o, d, pixel = monte_carlo._primary_rays(camera, cfg, seed, smp)
        _, rec = monte_carlo.trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=smp, return_record=True)
        return c, rec
    _, recs = jax.lax.scan(one, 0, jnp.arange(cfg.spp))
    return recs
recs = jax.block_until_ready(jax.jit(record_all)())

def make_replay(remat_sample=False):
    def replay_img(albedo, recs):
        mats = dataclasses.replace(scene.materials, albedo=albedo)
        s = dataclasses.replace(scene, materials=mats)
        def one(acc, xs):
            smp, rec = xs
            o, d, pixel = monte_carlo._primary_rays(camera, cfg, seed, smp)
            rad = monte_carlo.trace(s, o, d, cfg, seed=seed, pixel=pixel, sample=smp, record=rec)
            return acc + rad.reshape(cfg.height, cfg.width, 3), None
        body = jax.checkpoint(one) if remat_sample else one
        acc, _ = jax.lax.scan(body, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), (jnp.arange(cfg.spp), recs))
        return acc / cfg.spp
    return replay_img

a0 = scene.materials.albedo
for name, rs in [("grad no-remat", False), ("grad remat-sample", True)]:
    g = jax.jit(jax.value_and_grad(lambda a, r: jnp.mean(make_replay(rs)(a, r) ** 2)))
    r = g(a0, recs); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5): r = g(a0, recs)
    jax.block_until_ready(r)
    print(name, round((time.perf_counter()-t0)/5*1e3, 2), "ms")

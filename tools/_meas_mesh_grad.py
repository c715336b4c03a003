import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, dataclasses
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model, monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_mesh_scene()  # bunny if reference assets available
print("tris:", int(scene.triangles.material.shape[0]))
camera = cornell.cornell_camera()
cfg = RenderConfig(width=448, height=448, spp=2, max_depth=8)
key = rng.render_key(0)
bundle = mesh_model.prepare(scene, method="packet")

isect_fwd = mesh_model.make_intersect_fn(bundle, sort_rays=True)
near_fwd = mesh_model.make_nearest_t_fn(bundle, sort_rays=True)
isect_dif = mesh_model.make_intersect_fn(bundle, sort_rays=True, differentiable=True)

def with_albedo(a):
    return dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a))

def loss_std(a):
    return jnp.mean(monte_carlo.render(with_albedo(a), camera, cfg, key,
                                       intersect_fn=isect_dif, nearest_t_fn=near_fwd) ** 2)

rec_fn = jax.jit(lambda a: monte_carlo.record_trace(with_albedo(a), camera, cfg, key,
                                                    intersect_fn=isect_fwd, nearest_t_fn=near_fwd))
def loss_rep(a, recs):
    return jnp.mean(monte_carlo.render_from_trace(with_albedo(a), camera, cfg, key, recs) ** 2)

a0 = scene.materials.albedo
g_std = jax.jit(jax.value_and_grad(loss_std))
g_rep = jax.jit(jax.value_and_grad(loss_rep))
recs = jax.block_until_ready(rec_fn(a0))

def tm(fn, *args, n=5):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

print("record_pass(ms):", round(tm(rec_fn, a0), 2))
print("grad_replay_fixed_trace(ms):", round(tm(g_rep, a0, recs), 2))
print("grad_std(ms):", round(tm(g_std, a0), 2))
v1, gr1 = g_std(a0); v2, gr2 = g_rep(a0, recs)
print("loss:", float(v1), float(v2), "grad maxdiff:", float(jnp.max(jnp.abs(gr1-gr2))), "scale:", float(jnp.max(jnp.abs(gr1))))
import numpy as np
print("std nan:", int(jnp.sum(jnp.isnan(gr1))), "rep nan:", int(jnp.sum(jnp.isnan(gr2))))
if int(jnp.sum(jnp.isnan(gr2))):
    print("rep nan rows:", np.argwhere(np.isnan(np.asarray(gr2)))[:5])
if int(jnp.sum(jnp.isnan(gr1))):
    print("std nan rows:", np.argwhere(np.isnan(np.asarray(gr1)))[:5])
print("ex-nan maxdiff:", float(jnp.max(jnp.abs(jnp.nan_to_num(gr1-gr2)))))

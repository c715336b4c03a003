import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, dataclasses, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model, monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_mesh_scene()
camera = cornell.cornell_camera()
key = rng.render_key(0)
bundle = mesh_model.prepare(scene, method="packet")
isect_fwd = mesh_model.make_intersect_fn(bundle, sort_rays=True)
near_fwd = mesh_model.make_nearest_t_fn(bundle, sort_rays=True)

def run(w, h, spp, depth):
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth)
    def with_albedo(a):
        return dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a))
    recs = monte_carlo.record_trace(scene, camera, cfg, key, intersect_fn=isect_fwd, nearest_t_fn=near_fwd)
    def loss_rep(a):
        return jnp.mean(monte_carlo.render_from_trace(with_albedo(a), camera, cfg, key, recs) ** 2)
    g = jax.jit(jax.grad(loss_rep))(scene.materials.albedo)
    print(w, h, spp, depth, "nan:", int(jnp.sum(jnp.isnan(g))))

run(96, 96, 1, 6)
run(448, 448, 1, 6)
run(448, 448, 2, 8)

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, dataclasses, numpy as np
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model, monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_mesh_scene()
camera = cornell.cornell_camera()
cfg = RenderConfig(width=96, height=96, spp=1, max_depth=6)
key = rng.render_key(0)
bundle = mesh_model.prepare(scene, method="packet")
isect_fwd = mesh_model.make_intersect_fn(bundle, sort_rays=True)
near_fwd = mesh_model.make_nearest_t_fn(bundle, sort_rays=True)

def with_albedo(a):
    return dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a))
recs = monte_carlo.record_trace(scene, camera, cfg, key, intersect_fn=isect_fwd, nearest_t_fn=near_fwd)
def loss_rep(a):
    return jnp.mean(monte_carlo.render_from_trace(with_albedo(a), camera, cfg, key, recs) ** 2)
g = jax.grad(loss_rep)(scene.materials.albedo)
print("nan:", int(jnp.sum(jnp.isnan(g))))

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np, dataclasses
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_scene()
camera = cornell.cornell_camera()
cfg = RenderConfig(width=64, height=64, spp=2, max_depth=6)
key = rng.render_key(3)
a = monte_carlo.render(scene, camera, cfg, key)
b = monte_carlo.render_replay(scene, camera, cfg, key)
print("bit-exact:", bool(jnp.all(a == b)), "maxdiff:", float(jnp.max(jnp.abs(a - b))))

def loss_std(albedo):
    mats = dataclasses.replace(scene.materials, albedo=albedo)
    s = dataclasses.replace(scene, materials=mats)
    return jnp.mean(monte_carlo.render(s, camera, cfg, key) ** 2)
def loss_rep(albedo):
    mats = dataclasses.replace(scene.materials, albedo=albedo)
    s = dataclasses.replace(scene, materials=mats)
    return jnp.mean(monte_carlo.render_replay(s, camera, cfg, key) ** 2)
g1 = jax.grad(loss_std)(scene.materials.albedo)
g2 = jax.grad(loss_rep)(scene.materials.albedo)
print("albedo grad allclose:", bool(jnp.allclose(g1, g2, rtol=1e-5, atol=1e-8)),
      float(jnp.max(jnp.abs(g1 - g2))), float(jnp.max(jnp.abs(g1))))

def loss_geo_std(v0):
    tr = dataclasses.replace(scene.triangles, v0=v0)
    s = dataclasses.replace(scene, triangles=tr)
    return jnp.mean(monte_carlo.render(s, camera, cfg, key) ** 2)
def loss_geo_rep(v0):
    tr = dataclasses.replace(scene.triangles, v0=v0)
    s = dataclasses.replace(scene, triangles=tr)
    return jnp.mean(monte_carlo.render_replay(s, camera, cfg, key) ** 2)
h1 = jax.grad(loss_geo_std)(scene.triangles.v0)
h2 = jax.grad(loss_geo_rep)(scene.triangles.v0)
print("geom grad allclose:", bool(jnp.allclose(h1, h2, rtol=1e-4, atol=1e-7)),
      float(jnp.max(jnp.abs(h1 - h2))), float(jnp.max(jnp.abs(h1))))

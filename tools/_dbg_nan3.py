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
cfg = RenderConfig(width=448, height=448, spp=1, max_depth=6)
recs = monte_carlo.record_trace(scene, camera, cfg, key, intersect_fn=isect_fwd, nearest_t_fn=near_fwd)

def with_albedo(a):
    return dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, albedo=a))

@jax.jit
def gmask(a, m):
    def loss(a):
        img = monte_carlo.render_from_trace(with_albedo(a), camera, cfg, key, recs)
        return jnp.sum(img * m[:, :, None])
    return jax.grad(loss)(a)

a0 = scene.materials.albedo
def nan_in(r0, r1, c0, c1):
    m = jnp.zeros((448, 448), jnp.float32).at[r0:r1, c0:c1].set(1.0)
    return int(jnp.sum(jnp.isnan(gmask(a0, m)))) > 0

r0, r1 = 0, 448
while r1 - r0 > 1:
    mid = (r0 + r1) // 2
    if nan_in(r0, mid, 0, 448): r1 = mid
    else: r0 = mid
print("bad row:", r0)
c0, c1 = 0, 448
while c1 - c0 > 1:
    mid = (c0 + c1) // 2
    if nan_in(r0, r0+1, c0, mid): c1 = mid
    else: c0 = mid
print("bad pixel:", r0, c0)
lane = r0 * 448 + c0
for f in ("prim", "is_triangle", "hit", "visible"):
    print(f, np.asarray(getattr(recs, f))[:, :, lane])

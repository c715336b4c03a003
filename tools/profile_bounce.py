"""Ad-hoc timing breakdown of the MC bounce step on the live chip."""
import time

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.ops import gather, intersect, sampling, vec
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_scene()
camera = cornell.cornell_camera()
cfg = RenderConfig(width=896, height=896, spp=1, max_depth=16, rr_survival=0.8)
key = rng.render_key(0)
seed = rng.seed_from_key(key)
R = cfg.width * cfg.height
pixel = jnp.arange(R, dtype=jnp.uint32)

uj = rng.uniforms4(seed, pixel, 0, 0, rng.JITTER)
import cpu_based_ray_tracer_tpu.camera as cam_mod
d = cam_mod.perspective_ray_at(camera, cfg.width, cfg.height, pixel, uj[0], uj[1])
o = jnp.broadcast_to(camera.position, d.shape)
tp = jnp.ones((R, 3), jnp.float32)
alive = jnp.ones((R,), bool)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


print(f"R = {R}, tris = {scene.triangles.count}, spheres = {scene.spheres.count}")

bench("occlusion nearest_t", lambda o, d: intersect.nearest_t(scene, o, d), o, d)
tr = scene.triangles
bench("triangle t-matrix + min", lambda o, d: jnp.min(
    intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, 0.0, jnp.inf), -1), o, d)
bench("tri t-matrix + min&argmin", lambda o, d: (
    lambda t: (jnp.min(t, -1), jnp.argmin(t, -1)))(
    intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, 0.0, jnp.inf)), o, d)
bench("full intersect_scene", lambda o, d: intersect.intersect_scene(scene, o, d), o, d)

u = rng.uniforms4(seed, pixel, 0, 0, rng.LIGHT)
bench("rng.uniforms4", lambda px: rng.uniforms4(seed, px, 0, 0, rng.LIGHT), pixel)
bench("sample_area_light", lambda a, b, c: sampling.sample_area_light(scene, a, b, c),
      u[0], u[1], u[2])
bench("take_packed mats", lambda i: gather.take_packed(
    i, scene.materials.emission, scene.materials.albedo,
    scene.materials.emissive.astype(jnp.float32)),
    jnp.zeros((R,), jnp.int32))


def full_step(o, d, tp, alive):
    return monte_carlo._bounce_step(scene, cfg, seed=seed, pixel=pixel,
                                    sample=0, bounce=0, o=o, d=d,
                                    throughput=tp, alive=alive)

bench("FULL _bounce_step", full_step, o, d, tp, alive)

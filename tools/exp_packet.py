"""Experiment: packet-culled Pallas intersector vs dense brute force on the
real bunny+teapot scene (run from the repo root on TPU)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.ops import intersect, packet
from cpu_based_ray_tracer_tpu.scenes import meshes

scene = meshes.bunny_teapot_scene()
tr = scene.triangles
print("tris:", tr.count, flush=True)

cam = meshes.bvh_stage_camera()
W = H = 896
d = cam_mod.perspective_rays(cam, W, H).reshape(-1, 3)
o = jnp.broadcast_to(cam.position, d.shape)
R = d.shape[0]
t_min = 1e-3


def bench(name, fn, *args, n=10, rays=R):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.3f} ms   {rays/dt/1e6:9.1f} Mray/s",
          flush=True)
    return out


# Dense brute force on a slice (full R would take ~30 s/iter at 11k tris).
RS = 65536


@jax.jit
def brute(o, d):
    tmat = intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2,
                                       t_min, jnp.inf)
    return jnp.min(tmat, -1), jnp.argmin(tmat, -1).astype(jnp.int32)


tb, ib = bench(f"dense brute force (R={RS})", brute, o[:RS], d[:RS],
               n=2, rays=RS)

verts = None  # built once below
for cs, blk in [(128, 1024), (128, 2048), (128, 512), (256, 1024),
                (64, 1024)]:
    if verts is None:
        v0 = np.asarray(tr.v0, np.float64)
        verts = np.stack([v0, v0 + np.asarray(tr.e1, np.float64),
                          v0 + np.asarray(tr.e2, np.float64)], 1)
    cl = packet.build_clusters(verts, cluster_size=cs)
    print(f"  cs={cs}: {cl.n_clusters} clusters "
          f"(pad waste {cl.n_clusters*cs/tr.count:.2f}x)", flush=True)
    fn = jax.jit(lambda oo, dd, cl=cl, blk=blk: packet.nearest(
        cl, oo, dd, t_min, block=blk, interpret=False))
    tp, ip = bench(f"packet cs={cs} block={blk}", fn, o, d)
    tb_, ib_ = map(np.asarray, (tb, ib))
    tp_, ip_ = np.asarray(tp)[:RS], np.asarray(ip)[:RS]
    hit_b = tb_ < 1e30
    hit_p = tp_ < 1e30
    print("    hit agree:", float((hit_b == hit_p).mean()),
          " t allclose:", bool(np.allclose(tp_[hit_b & hit_p],
                                           tb_[hit_b & hit_p],
                                           rtol=1e-5, atol=1e-5)), flush=True)

# Incoherent rays (the shadow/bounce regime).
ko, kd_ = jax.random.split(jax.random.PRNGKey(0))
o2 = jax.random.uniform(ko, (R, 3), jnp.float32, -3.0, 9.0)
d2 = jax.random.normal(kd_, (R, 3), jnp.float32)
d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
cl = packet.build_clusters(verts, cluster_size=128)
fn = jax.jit(lambda oo, dd: packet.nearest(cl, oo, dd, t_min,
                                           block=1024, interpret=False))
bench("packet cs=128 RANDOM rays", fn, o2, d2)

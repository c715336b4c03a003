"""Experiment: t-matrix formulations/layouts for the nearest-triangle pass."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.ops import intersect
from cpu_based_ray_tracer_tpu.scenes import cornell

scene = cornell.cornell_scene()
tr = scene.triangles
T = tr.count
R = 802816
print(f"R={R} T={T}")

rk = jax.random.PRNGKey(0)
o = jax.random.uniform(rk, (R, 3), jnp.float32, -1.0, 6.0)
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

NO_HIT = intersect.NO_HIT_T
T_MIN = 0.001


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return out


# 1. current: (R, N) MT + min + argmin
def cur(o, d):
    t = intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, T_MIN, jnp.inf)
    return jnp.min(t, -1), jnp.argmin(t, -1)


# 2. transposed: (N, R) MT + min + argmin over axis 0
def mt_T(o, d):
    ox, oy, oz = o[:, 0][None], o[:, 1][None], o[:, 2][None]      # (1, R)
    dx, dy, dz = d[:, 0][None], d[:, 1][None], d[:, 2][None]
    e1 = tr.e1; e2 = tr.e2; v0 = tr.v0
    e1x, e1y, e1z = e1[:, 0:1], e1[:, 1:2], e1[:, 2:3]            # (N, 1)
    e2x, e2y, e2z = e2[:, 0:1], e2[:, 1:2], e2[:, 2:3]
    v0x, v0y, v0z = v0[:, 0:1], v0[:, 1:2], v0[:, 2:3]
    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    det = s1x * e1x + s1y * e1y + s1z * e1z
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    s2x = sy * e1z - sz * e1y
    s2y = sz * e1x - sx * e1z
    s2z = sx * e1y - sy * e1x
    t = (s2x * e2x + s2y * e2y + s2z * e2z) * inv
    b1 = (s1x * sx + s1y * sy + s1z * sz) * inv
    b2 = (s2x * dx + s2y * dy + s2z * dz) * inv
    ok = ((jnp.abs(det) > 1e-12) & (t > T_MIN) & (b1 >= 0.0) & (b2 >= 0.0)
          & (1.0 - b1 - b2 >= 0.0))
    tm = jnp.where(ok, t, NO_HIT)
    return jnp.min(tm, 0), jnp.argmin(tm, 0)


# 3. affine MXU: A^T = Mo^T @ o4^T (3N, R); B^T = Md^T @ d^T
def make_affine():
    v0, e1, e2 = tr.v0, tr.e1, tr.e2
    n = jnp.cross(e1, e2)                       # (N, 3)
    nn = jnp.sum(n * n, -1, keepdims=True)      # (N, 1) = det
    good = nn > 1e-20
    invd = jnp.where(good, 1.0 / jnp.maximum(nn, 1e-30), 0.0)
    g1 = jnp.cross(e2, n) * invd
    g2 = jnp.cross(n, e1) * invd
    h0 = -jnp.sum(n * v0, -1)
    h1 = -jnp.sum(g1 * v0, -1)
    h2 = -jnp.sum(g2 * v0, -1)
    # Mo^T rows: per triangle 3 rows [n|h0], [g1|h1], [g2|h2] -> (3N, 4)
    MoT = jnp.stack([
        jnp.concatenate([n, h0[:, None]], -1),
        jnp.concatenate([g1, h1[:, None]], -1),
        jnp.concatenate([g2, h2[:, None]], -1)], 1).reshape(3 * T, 4)
    MdT = jnp.stack([n, g1, g2], 1).reshape(3 * T, 3)
    return MoT, MdT

MoT, MdT = jax.tree.map(np.asarray, make_affine())
MoT, MdT = jnp.asarray(MoT), jnp.asarray(MdT)


def affine(o, d):
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], -1)      # (R, 4)
    A = jax.lax.dot_general(MoT, o4, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)   # (3N, R)
    B = jax.lax.dot_general(MdT, d, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)   # (3N, R)
    A = A.reshape(T, 3, R)
    B = B.reshape(T, 3, R)
    den = B[:, 0]
    safe = jnp.abs(den) > 1e-12
    t = -A[:, 0] * jnp.where(safe, 1.0 / den, 0.0)                # (N, R)
    b1 = A[:, 1] + t * B[:, 1]
    b2 = A[:, 2] + t * B[:, 2]
    ok = safe & (t > T_MIN) & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    tm = jnp.where(ok, t, NO_HIT)
    return jnp.min(tm, 0), jnp.argmin(tm, 0)


t0, i0 = bench("MT (R,N)  [current]", cur, o, d)
t1, i1 = bench("MT (N,R)  transposed", mt_T, o, d)
t2, i2 = bench("affine MXU (N,R)", affine, o, d)

t0, i0, t1, i1, t2, i2 = map(np.asarray, (t0, i0, t1, i1, t2, i2))
hit0 = t0 < 1e30
print("hit fraction:", hit0.mean())
print("MT_T  t allclose:", np.allclose(t0, t1, rtol=1e-5, atol=1e-5),
      " idx match:", (i0 == i1).mean())
m = hit0 & (t2 < 1e30)
print("affine t max rel err (both hit):",
      float(np.max(np.abs(t2[m] - t0[m]) / np.maximum(t0[m], 1e-6))))
print("affine hit agree:", float(((t2 < 1e30) == hit0).mean()),
      " idx match on hits:", float((i0[m] == i2[m]).mean()))

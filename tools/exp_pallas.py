"""Experiment: fused Pallas nearest-triangle kernel (MXU affine + VMEM reduce)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_based_ray_tracer_tpu.ops import intersect
from cpu_based_ray_tracer_tpu.scenes import cornell

scene = cornell.cornell_scene()
tr = scene.triangles
T = tr.count
R = 802816
T_MIN = 0.001
NO_HIT = float(np.float32(np.finfo(np.float32).max))

o = jax.random.uniform(jax.random.PRNGKey(0), (R, 3), jnp.float32, -1.0, 6.0)
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def pad8(n):
    return -(-n // 8) * 8


def make_affine(v0, e1, e2):
    """(Mo, Md): rows grouped by component — [n | g1 | g2] blocks of Np rows.

    Mo (3*Np, 4) with last col the affine offset; Md (3*Np, 4) zero-padded
    last column (K=4 keeps both matmuls the same shape).
    """
    n = jnp.cross(e1, e2)
    nn = jnp.sum(n * n, -1, keepdims=True)
    good = nn > 1e-20
    invd = jnp.where(good, 1.0 / jnp.maximum(nn, 1e-30), 0.0)
    g1 = jnp.cross(e2, n) * invd
    g2 = jnp.cross(n, e1) * invd
    h0 = -jnp.sum(n * v0, -1, keepdims=True)
    h1 = -jnp.sum(g1 * v0, -1, keepdims=True)
    h2 = -jnp.sum(g2 * v0, -1, keepdims=True)
    Np = pad8(v0.shape[0])
    def padrows(x):
        return jnp.pad(x, ((0, Np - x.shape[0]), (0, 0)))
    Mo = jnp.concatenate([
        padrows(jnp.concatenate([n, h0], -1)),
        padrows(jnp.concatenate([g1, h1], -1)),
        padrows(jnp.concatenate([g2, h2], -1))], 0)        # (3Np, 4)
    Md = jnp.concatenate([
        padrows(n), padrows(g1), padrows(g2)], 0)          # (3Np, 3)
    Md = jnp.pad(Md, ((0, 0), (0, 1)))                     # (3Np, 4)
    return Mo, Md


Mo, Md = make_affine(tr.v0, tr.e1, tr.e2)
NP_ = Mo.shape[0] // 3
RT = 2048


def kernel(mo_ref, md_ref, o4_ref, d4_ref, t_ref, idx_ref):
    A = jnp.dot(mo_ref[:], o4_ref[:], preferred_element_type=jnp.float32)
    B = jnp.dot(md_ref[:], d4_ref[:], preferred_element_type=jnp.float32)
    den = B[0:NP_]
    safe = jnp.abs(den) > 1e-12
    t = -A[0:NP_] * jnp.where(safe, pl.reciprocal(den, approx=False), 0.0)
    b1 = A[NP_:2 * NP_] + t * B[NP_:2 * NP_]
    b2 = A[2 * NP_:] + t * B[2 * NP_:]
    ok = safe & (t > T_MIN) & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    tm = jnp.where(ok, t, NO_HIT)                      # (Np, RT)
    tmin = jnp.min(tm, 0)                              # (RT,)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    idx = jnp.min(jnp.where(tm == tmin[None, :], rows, NP_), 0)
    t_ref[0, :] = tmin
    idx_ref[0, :] = idx


@jax.jit
def nearest_pallas(o, d):
    assert o.shape[0] % RT == 0, f"ray count must be a multiple of {RT}"
    o4 = jnp.concatenate([o, jnp.ones((o.shape[0], 1), o.dtype)], -1).T  # (4,R)
    d4 = jnp.concatenate([d, jnp.zeros((d.shape[0], 1), d.dtype)], -1).T
    grid = (o.shape[0] // RT,)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3 * NP_, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NP_, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, o.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct((1, o.shape[0]), jnp.int32),
        ],
    )(Mo, Md, o4, d4)
    return t[0], idx[0]


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


def cur(o, d):
    t = intersect.triangle_t_matrix(o, d, tr.v0, tr.e1, tr.e2, T_MIN, jnp.inf)
    return jnp.min(t, -1), jnp.argmin(t, -1)


t0, i0 = bench("MT (R,N) current", cur, o, d)
tp, ip = bench("pallas fused affine", nearest_pallas, o, d)

t0, i0, tp, ip = map(np.asarray, (t0, i0, tp, ip))
hit0 = t0 < 1e30
hitp = tp < 1e30
m = hit0 & hitp
print("hit agree:", float((hit0 == hitp).mean()))
print("t max rel err:", float(np.max(np.abs(tp[m] - t0[m]) / np.maximum(t0[m], 1e-6))))
print("idx match:", float((i0[m] == ip[m]).mean()))

"""Joint-bilateral spatial + motion-vector temporal denoising.

Pure-function rewrites of the reference's per-pixel loops
(``Denoiser/8599RayTracerGUI/src/Denoiser.h:133-228`` spatial, ``:235-328``
temporal), differentiable end to end.

- JBF: the reference brute-forces an O(W*H*K^2) window per pixel (README.md:
  132 admits it is "too brutal").  Here the K^2 offsets are a ``fori_loop``
  over shifted *images* — each step is one fused elementwise pass over the
  frame, XLA keeps everything on-chip, and the asymptotics are the same with
  a tiny constant.
- Temporal: reprojection through the *previous* frame's view/projection
  matrices, primitive-id consistency test, then history clamped to
  mean +- tolerance * RMS-deviation-from-center over the current-frame
  window (the reference's "variance" is the RMS diff from the CENTER pixel,
  Denoiser.h:300-306 — mirrored exactly).  The window moments are box sums
  via cumsum (O(H*W), vs the reference's O(H*W*K^2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.ops import vec
from cpu_based_ray_tracer_tpu.scene import _pytree

# Heuristic sigmas (Denoiser.h:352-356).
SIGMA_POSITION = 32.0
SIGMA_COLOR = 0.6
SIGMA_NORMAL = 0.1
SIGMA_COPLANARITY = 0.1


@_pytree
class GBuffer:
    """Per-frame G-buffer (``Denoiser.h:60-98``): color carries the 1-SPP
    path-traced radiance (night sky on miss), aux channels describe the
    primary hit; ``view``/``proj`` are the matrices the frame was rendered
    with (saved for the NEXT frame's reprojection, Renderer.cpp:251-253)."""

    color: jax.Array        # (H, W, 3)
    world_pos: jax.Array    # (H, W, 3)
    normal: jax.Array       # (H, W, 3) unit, flipped toward the viewer
    contributor: jax.Array  # (H, W) bool — primary ray hit something
    prim_id: jax.Array      # (H, W) i32 — global primitive id, -1 on miss
    view: jax.Array         # (4, 4)
    proj: jax.Array         # (4, 4)


def joint_bilateral(g: GBuffer, half_size: int, clamp: bool = True,
                    sigma_position: float = SIGMA_POSITION,
                    sigma_color: float = SIGMA_COLOR,
                    sigma_normal: float = SIGMA_NORMAL,
                    sigma_coplanarity: float = SIGMA_COPLANARITY
                    ) -> jax.Array:
    """Joint-bilateral filtered color (H, W, 3), mirroring
    ``JointBilateralFiltering`` (Denoiser.h:133-228):

    weight = exp(-(|dp|^2/2sp^2 + |dc|^2/2sc^2 + acos(n.n')^2/2sn^2
                   + (n_c . normalize(dp))^2 / 2scp^2))

    Non-contributor neighbors are skipped; a non-contributor center passes
    through unfiltered; the center tap has weight exactly 1; the result is
    optionally clamped to [0,1] ("immediate clamping" off/on).
    """
    h, w, _ = g.color.shape
    k = half_size
    size = 2 * k + 1

    pad3 = lambda a: jnp.pad(a, ((k, k), (k, k), (0, 0)))          # noqa: E731
    color_p = pad3(g.color)
    pos_p = pad3(g.world_pos)
    nrm_p = pad3(g.normal)
    con_p = jnp.pad(g.contributor, ((k, k), (k, k)))  # False border

    inv2 = lambda s: 1.0 / (2.0 * s * s)                            # noqa: E731
    wp, wc, wn, wcp = (inv2(sigma_position), inv2(sigma_color),
                       inv2(sigma_normal), inv2(sigma_coplanarity))

    def tap(i, acc):
        c_sum, w_sum = acc
        dy, dx = i // size, i % size
        nb_c = jax.lax.dynamic_slice(color_p, (dy, dx, 0), (h, w, 3))
        nb_p = jax.lax.dynamic_slice(pos_p, (dy, dx, 0), (h, w, 3))
        nb_n = jax.lax.dynamic_slice(nrm_p, (dy, dx, 0), (h, w, 3))
        nb_ok = jax.lax.dynamic_slice(con_p, (dy, dx), (h, w))

        dp = nb_p - g.world_pos
        d_pos = jnp.sum(dp * dp, -1) * wp
        dc = nb_c - g.color
        d_col = jnp.sum(dc * dc, -1) * wc
        ang = jnp.arccos(jnp.clip(jnp.sum(nb_n * g.normal, -1), 0.0, 1.0))
        d_nrm = ang * ang * wn
        cop = jnp.sum(g.normal * vec.normalize(dp), -1)
        d_cop = cop * cop * wcp

        is_center = (dy == k) & (dx == k)
        # Center tap: all distances are exactly zero (the reference
        # special-cases weight=1, Denoiser.h:182-187) — acos/normalize noise
        # must not leak in.
        weight = jnp.where(is_center, 1.0,
                           jnp.exp(-(d_pos + d_col + d_nrm + d_cop)))
        weight = jnp.where(nb_ok, weight, 0.0)
        return (c_sum + weight[..., None] * nb_c, w_sum + weight)

    c_sum, w_sum = jax.lax.fori_loop(
        0, size * size, tap,
        (jnp.zeros_like(g.color), jnp.zeros((h, w), g.color.dtype)))

    out = c_sum / jnp.maximum(w_sum, 1e-20)[..., None]
    if clamp:
        out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(g.contributor[..., None], out, g.color)


def joint_bilateral_atrous(g: GBuffer, half_size: int, clamp: bool = True,
                           sigma_position: float = SIGMA_POSITION,
                           sigma_color: float = SIGMA_COLOR,
                           sigma_normal: float = SIGMA_NORMAL,
                           sigma_coplanarity: float = SIGMA_COPLANARITY
                           ) -> jax.Array:
    """Edge-avoiding à-trous approximation of ``joint_bilateral``.

    The reference's dense window is O(K^2) taps per pixel (its own README
    calls it "too brutal", README.md:132).  This is the standard fast
    replacement (à-trous wavelet, Dammertz et al. 2010): L iterations of a
    5x5 kernel whose taps are dilated by 2^i, footprint radius 2*(2^L - 1);
    the stopping rule picks the smallest L whose footprint covers half_size,
    so k=32 runs L=5 iterations x 25 taps = 125 full-frame passes (footprint
    radius 62) instead of the dense filter's 4,225.  Guidance terms, contributor skipping, center-tap and
    pass-through semantics match ``joint_bilateral`` exactly; each iteration
    filters the previous iteration's color (color guidance updates with it,
    as in the original algorithm), so the result is an approximation of —
    not bit-equal to — the dense filter.
    """
    h, w, _ = g.color.shape
    # Smallest L with footprint 2*(2^L - 1) >= half_size.
    n_iters = 1
    while 2 * ((1 << n_iters) - 1) < half_size:
        n_iters += 1

    inv2 = lambda s: 1.0 / (2.0 * s * s)                            # noqa: E731
    wp, wc, wn, wcp = (inv2(sigma_position), inv2(sigma_color),
                       inv2(sigma_normal), inv2(sigma_coplanarity))

    def one_level(color, level):
        step = 1 << level
        kpad = 2 * step
        color_p = jnp.pad(color, ((kpad, kpad), (kpad, kpad), (0, 0)))
        pos_p = jnp.pad(g.world_pos, ((kpad, kpad), (kpad, kpad), (0, 0)))
        nrm_p = jnp.pad(g.normal, ((kpad, kpad), (kpad, kpad), (0, 0)))
        con_p = jnp.pad(g.contributor, ((kpad, kpad), (kpad, kpad)))

        c_sum = jnp.zeros_like(color)
        w_sum = jnp.zeros((h, w), color.dtype)
        for ty in range(5):
            for tx in range(5):
                dy, dx = ty * step, tx * step
                nb_c = jax.lax.dynamic_slice(color_p, (dy, dx, 0), (h, w, 3))
                nb_p = jax.lax.dynamic_slice(pos_p, (dy, dx, 0), (h, w, 3))
                nb_n = jax.lax.dynamic_slice(nrm_p, (dy, dx, 0), (h, w, 3))
                nb_ok = jax.lax.dynamic_slice(con_p, (dy, dx), (h, w))
                if ty == 2 and tx == 2:
                    weight = jnp.where(nb_ok, 1.0, 0.0)
                else:
                    dp = nb_p - g.world_pos
                    d_pos = jnp.sum(dp * dp, -1) * wp
                    dc = nb_c - color
                    d_col = jnp.sum(dc * dc, -1) * wc
                    ang = jnp.arccos(jnp.clip(jnp.sum(nb_n * g.normal, -1),
                                              0.0, 1.0))
                    d_nrm = ang * ang * wn
                    cop = jnp.sum(g.normal * vec.normalize(dp), -1)
                    d_cop = cop * cop * wcp
                    weight = jnp.where(
                        nb_ok, jnp.exp(-(d_pos + d_col + d_nrm + d_cop)), 0.0)
                c_sum = c_sum + weight[..., None] * nb_c
                w_sum = w_sum + weight
        return c_sum / jnp.maximum(w_sum, 1e-20)[..., None]

    out = g.color
    for level in range(n_iters):
        out = one_level(out, level)
    if clamp:
        out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(g.contributor[..., None], out, g.color)


def _box_sum(x: jax.Array, k: int) -> jax.Array:
    """Sum over the (2k+1)^2 window clipped to the frame, per pixel.
    x: (H, W, C).  Exact (integral-image style, O(H*W))."""

    def along(a, axis):
        # result[i] = c[min(i+k+1, n)] - c[max(i-k, 0)] where c is the
        # exclusive prefix sum — expressed as PADS + SLICES (a take with
        # clipped indices lowers to a gather, ~2.8 ms per call at 896^2 on
        # TPU; the slice form is ~free and bit-identical).
        n = a.shape[axis]
        c = jnp.cumsum(a, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        c = jnp.concatenate([zero, c], axis=axis)           # c[i] = sum(<i)
        last = jax.lax.slice_in_dim(c, n, n + 1, axis=axis)
        reps = [1] * c.ndim
        reps[axis] = k
        cp = jnp.concatenate([c, jnp.tile(last, reps)], axis=axis)
        up = jax.lax.slice_in_dim(cp, k + 1, k + 1 + n, axis=axis)
        cl = jnp.concatenate([jnp.tile(zero, reps), c], axis=axis)
        lo = jax.lax.slice_in_dim(cl, 0, n, axis=axis)
        return up - lo

    return along(along(x, 0), 1)


def reproject(world_pos: jax.Array, view: jax.Array, proj: jax.Array,
              height: int, width: int):
    """World position -> (row, col) pixel coords under (view, proj), plus the
    strict in-bounds mask (``Denoiser.h:268-279``).  Row 0 = top scanline
    (our image convention; the reference's bottom-up rows are equivalent)."""
    p = jnp.concatenate([world_pos,
                         jnp.ones_like(world_pos[..., :1])], -1)   # (..., 4)
    # precision=HIGHEST: the TPU MXU's default bf16 multiply would smear the
    # reprojected pixel coordinates by ~0.4% (several pixels at 900px) and
    # break the primitive-id test (same class of bug as ops.gather r3).
    pv = jnp.matmul(proj, view, precision=jax.lax.Precision.HIGHEST)
    # 4x4 transform as explicit fused multiply-adds: a HIGHEST-precision
    # einsum at (H, W, 4) lowers to a multi-pass f32 matmul (~3.4 ms at
    # 896^2); the unrolled form is exact f32 and fuses to ~nothing.
    clip = jnp.stack([sum(pv[i, j] * p[..., j] for j in range(4))
                      for i in range(4)], -1)
    ndc = clip[..., :3] / jnp.where(jnp.abs(clip[..., 3:4]) > 1e-20,
                                    clip[..., 3:4], 1e-20)
    screen_x = (ndc[..., 0] + 1.0) * 0.5
    screen_y = (ndc[..., 1] + 1.0) * 0.5
    px = screen_x * width
    py = (1.0 - screen_y) * height
    ok = (px > 0.0) & (px < width) & (py > 0.0) & (py < height)
    return py, px, ok


def temporal(cur: GBuffer, prev: GBuffer, half_size: int, tolerance: float,
             current_frame_weighting: float) -> jax.Array:
    """Temporal pass (``Denoiser.h:235-328``): reproject through the PREVIOUS
    frame's matrices, accept history when in-bounds and the primitive id
    matches, clamp history to mean +- tolerance * RMS-center-deviation over
    the current (2k+1)^2 window, blend (1-a)*history + a*current."""
    h, w, _ = cur.color.shape

    py, px, in_bounds = reproject(cur.world_pos, prev.view, prev.proj, h, w)
    iy = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(px.astype(jnp.int32), 0, w - 1)

    # One packed flattened take (a 2-D fancy gather costs ~1.5x more and
    # two of them, ~2x, on TPU).
    flat = (iy * w + ix).reshape(-1)
    packed = jnp.concatenate(
        [prev.color.reshape(-1, 3),
         prev.prim_id.reshape(-1, 1).astype(cur.color.dtype)], 1)
    taken = jnp.take(packed, flat, axis=0).reshape(h, w, 4)
    prev_color = taken[..., 0:3]
    prev_id = taken[..., 3].astype(prev.prim_id.dtype)
    valid = (cur.prim_id != -1) & in_bounds & (cur.prim_id == prev_id)

    # Window moments of the current frame (box sums; the reference's
    # "variance" is the mean squared deviation from the CENTER pixel).
    ones = jnp.ones((h, w, 1), cur.color.dtype)
    n = _box_sum(ones, half_size)
    mean = _box_sum(cur.color, half_size) / n
    mean_sq = _box_sum(cur.color * cur.color, half_size) / n
    dev = jnp.sqrt(jnp.maximum(
        mean_sq - 2.0 * cur.color * mean + cur.color * cur.color, 0.0))

    clamped_prev = jnp.clip(prev_color, mean - tolerance * dev,
                            mean + tolerance * dev)

    alpha = jnp.where(valid, current_frame_weighting, 1.0)[..., None]
    history = jnp.where(valid[..., None], clamped_prev, 0.0)
    return (1.0 - alpha) * history + alpha * cur.color

"""Tonemapping / quantization.

Covers the reference's two output paths:
- offline ``write_color`` (``offline prototype/.../color.h:33-52``):
  round(255 * clamp(pow(mean, 1/gamma), 0, 1));
- GUI pack ``RTUtility::vecRGBA_to_0xABGR`` after clamp to [0,1]
  (``Monte Carlo Path Tracer/.../Renderer.cpp:130-134``), with the NPPT stage
  applying per-pixel gamma before the clamp
  (``non physical path tracer/.../Renderer.cpp:126-130``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gamma_correct(linear, gamma: float = 2.0):
    """pow(x, 1/gamma) on non-negative input (gamma=1: identity)."""
    x = jnp.maximum(linear, 0.0)
    if gamma == 1.0:
        return x
    if gamma == 2.0:
        return jnp.sqrt(x)
    return x ** (1.0 / gamma)


def quantize_u8(linear_mean, gamma: float = 2.0) -> jax.Array:
    """(..., 3) linear mean radiance -> uint8, the offline write_color rule."""
    g = gamma_correct(linear_mean, gamma)
    return jnp.round(255.0 * jnp.clip(g, 0.0, 1.0)).astype(jnp.uint8)


def pack_0xabgr(rgba) -> jax.Array:
    """(..., 4) floats in [0,1] -> uint32 0xABGR, the GUI frame-buffer pack
    (``RTWeekendUtility.h`` vecRGBA_to_0xABGR used by every GUI stage)."""
    q = jnp.round(255.0 * jnp.clip(rgba, 0.0, 1.0)).astype(jnp.uint32)
    return (q[..., 3] << 24) | (q[..., 2] << 16) | (q[..., 1] << 8) | q[..., 0]

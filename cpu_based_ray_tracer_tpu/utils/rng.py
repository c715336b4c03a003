"""Counter-based RNG key plumbing.

The reference uses ``thread_local std::mt19937`` (``Walnut/Random.h:47``) and
``rand()`` (``RayTracingToolbox.h:32-43``); its ``fast_random`` PCG stub
(``RayTracingToolbox.h:57-66``) shows the author *wanted* a GPU-style stateless
generator.  We use JAX's counter-based keys folded per (sample, bounce,
purpose): deterministic, order-independent, and identical under any sharding —
which is what makes the sharding-invariance tests possible.
"""

from __future__ import annotations

import jax

# Stream tags so independent random decisions within one bounce never share a
# fold_in chain.
JITTER = 0        # in-pixel MSAA jitter
LENS = 1          # thin-lens aperture sample
SCATTER = 2       # BSDF direction sample
RR = 3            # Russian-roulette coin
LIGHT = 4         # area-light sample
SCHLICK = 5       # dielectric reflect-vs-refract coin


def render_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def sample_key(key: jax.Array, sample_index) -> jax.Array:
    """Key for one SPP sample (the reference regenerates jitter every
    accumulation frame — Monte Carlo .../Camera.cpp:121)."""
    return jax.random.fold_in(key, sample_index)


def bounce_key(key: jax.Array, bounce_index) -> jax.Array:
    return jax.random.fold_in(key, bounce_index)


def stream(key: jax.Array, tag: int) -> jax.Array:
    return jax.random.fold_in(key, tag)

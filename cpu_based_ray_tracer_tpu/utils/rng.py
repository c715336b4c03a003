"""Counter-based RNG.

The reference uses ``thread_local std::mt19937`` (``Walnut/Random.h:47``) and
``rand()`` (``RayTracingToolbox.h:32-43``); its ``fast_random`` PCG stub
(``RayTracingToolbox.h:57-66``) shows the author *wanted* a GPU-style stateless
generator.  We go all the way: a **pcg4d** hash (Jarzynski & Olano, "Hash
Functions for GPU Rendering", JCGT 2020 — the standard GPU path-tracing
generator) of the tuple (pixel, sample, bounce*stream, seed).

Properties that matter here:
- *Counter-based*: no state, no sequence — random draws are a pure function of
  (pixel index, sample index, bounce, stream tag, seed).
- *Shard-invariant*: a lane's randomness depends on its absolute pixel index,
  not its position inside a device-local buffer, so sharded and unsharded
  renders are bit-identical (test: tests/test_sharding.py).
- *Cheap on the VPU*: ~20 integer ops for 4 uniforms, vs ~20 rounds of
  threefry for ``jax.random``.

``jax.random`` keys remain the public seeding interface (``render_key`` /
``seed_from_key``); everything inside jitted integrators uses the hash.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream tags: independent random decisions within one (pixel, sample, bounce).
JITTER = 0        # in-pixel MSAA jitter
LENS = 1          # thin-lens aperture sample
SCATTER = 2       # BSDF direction sample
RR = 3            # Russian-roulette coin
LIGHT = 4         # area-light sample
SCHLICK = 5       # dielectric reflect-vs-refract coin
N_STREAMS = 8


def render_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def seed_from_key(key: jax.Array) -> jax.Array:
    """One uint32 seed word from a jax PRNG key (traced-safe)."""
    return jax.random.bits(key, (), jnp.uint32)


def pcg4d(a, b, c, d):
    """pcg4d hash: 4 x uint32 in -> 4 x uint32 out (Jarzynski-Olano eq. 19)."""
    u = jnp.uint32
    a, b, c, d = (jnp.asarray(x).astype(u) for x in (a, b, c, d))
    mul, inc = u(1664525), u(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> u(16))
    b = b ^ (b >> u(16))
    c = c ^ (c >> u(16))
    d = d ^ (d >> u(16))
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(x: jax.Array) -> jax.Array:
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits."""
    return (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniforms4(seed, pixel, sample, bounce, stream: int):
    """Four independent U[0,1) draws per lane.

    seed: uint32 scalar; pixel: (R,) absolute pixel/lane index (uint32/int32);
    sample: scalar sample index; bounce: scalar bounce index; stream: python
    int tag.  Returns tuple of 4 arrays shaped like ``pixel``.
    """
    pixel = jnp.asarray(pixel).astype(jnp.uint32)
    ctr = (jnp.asarray(bounce).astype(jnp.uint32) * jnp.uint32(N_STREAMS)
           + jnp.uint32(stream))
    a, b, c, d = pcg4d(pixel,
                       jnp.asarray(sample).astype(jnp.uint32),
                       ctr,
                       jnp.asarray(seed).astype(jnp.uint32))
    return (_to_unit_float(a), _to_unit_float(b),
            _to_unit_float(c), _to_unit_float(d))

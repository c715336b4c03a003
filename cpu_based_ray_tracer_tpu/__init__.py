"""TPU-native differentiable ray-tracing framework.

A brand-new JAX/XLA/Pallas framework with the *capabilities* of the reference
CPU ray tracer (IQ404/cpu-based-ray-tracer): Whitted ray tracing, BVH-accelerated
triangle meshes, Monte Carlo path tracing with light-source sampling and Russian
roulette, and joint-bilateral + temporal denoising — redesigned TPU-first:

- SoA pytree scenes (integer ids instead of pointers; reference uses polymorphic
  ``Entity*``/``Material*`` heaps, e.g. ``BVH Ray Tracer/.../Renderer.h:188-193``).
- Fixed-depth ``lax.scan`` wavefront integrators with Russian-roulette masks
  instead of recursion (reference: recursive ``shading`` at
  ``Monte Carlo Path Tracer/.../Renderer.cpp:148-214``).
- Counter-based per-(pixel, sample, bounce) RNG instead of ``thread_local``
  mt19937 (reference: ``Walnut/Random.h:47``).
- Pallas kernels for the hot intersection loops; ``shard_map`` over a device
  mesh for multi-chip scaling (reference's only parallelism is
  ``std::for_each(std::execution::par)`` over pixels).

Subpackages
-----------
- ``ops``:      math, intersection, sampling, BVH, denoise kernels (incl. Pallas)
- ``models``:   the per-stage renderers (offline, nppt, whitted, mesh, monte_carlo, denoiser)
- ``scenes``:   scene constructors mirroring each reference Renderer ctor
- ``parallel``: device-mesh sharding / multi-host helpers
- ``utils``:    RNG, image IO, OBJ IO, profiling, checkpointing, native bindings
"""

__version__ = "0.1.0"

from cpu_based_ray_tracer_tpu import scene as scene  # noqa: F401
from cpu_based_ray_tracer_tpu import camera as camera  # noqa: F401

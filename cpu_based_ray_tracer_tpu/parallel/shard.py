"""Row-sharded rendering under ``shard_map``.

Each device renders a contiguous slab of image rows; the counter-based RNG
(utils.rng) keys every lane by its *absolute* pixel index, so the sharded
render is bit-identical to the single-device one (tested in
tests/test_sharding.py) — the TPU equivalent of the reference's guarantee
that its per-pixel thread fan-out writes disjoint pixels
(``Denoiser/.../Renderer.cpp:238-248``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.parallel.mesh import TILE_AXIS
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng


def render_tiles(scene: Scene, camera, cfg: RenderConfig, seed,
                 row0, n_rows: int):
    """Render rows [row0, row0 + n_rows) of the cfg.height image: the
    device-local body of the sharded renderer.  (H, W, 3) slab of summed
    radiance over cfg.spp samples (divide by spp for the mean)."""
    w = cfg.width

    def one_sample(acc, s):
        o, d, pixel = monte_carlo._primary_rays(
            camera, cfg, seed, s, pixel_offset=row0 * w, height=n_rows)
        rad = monte_carlo.trace(scene, o, d, cfg, seed=seed, pixel=pixel,
                                sample=s)
        return acc + rad.reshape(n_rows, w, 3), None

    acc, _ = jax.lax.scan(one_sample, jnp.zeros((n_rows, w, 3), jnp.float32),
                          jnp.arange(cfg.spp))
    return acc


def render_sharded(scene: Scene, camera, cfg: RenderConfig, key, mesh,
                   axis: str = TILE_AXIS) -> jax.Array:
    """Mean-radiance image (H, W, 3) with rows sharded over ``mesh``.

    Scene and camera are replicated; each device computes its row slab;
    the output is row-sharded (gather happens only if the caller asks).
    cfg.height must be divisible by the mesh size.
    """
    n = mesh.shape[axis]
    if cfg.height % n:
        raise ValueError(f"height {cfg.height} not divisible by mesh size {n}")
    rows_per = cfg.height // n
    seed = rng.seed_from_key(key)

    # check_vma=False: the scan carries inside `trace` start from replicated
    # constants and become device-varying after the first step, which the
    # varying-manual-axes checker rejects; the renderer is trivially correct
    # under sharding (disjoint row slabs, replicated scene).
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=P(axis), check_vma=False)
    def body(scene_, camera_, seed_):
        i = jax.lax.axis_index(axis)
        slab = render_tiles(scene_, camera_, cfg, seed_,
                            row0=i * rows_per, n_rows=rows_per)
        return slab

    return body(scene, camera, seed) / cfg.spp


# --- Sharded persistent wavefront stepper (the fast engine under a mesh). ---
#
# The scan engine above runs at ~31% lane utilization (dead RR lanes are mask
# ballast); the persistent wavefront stepper (models.monte_carlo) regenerates
# dead paths in place for ~100% utilization and ~4x throughput.  Here it runs
# per-device: each device owns a contiguous row-major slab of lanes (pixels)
# and steps them independently — zero collectives in the hot loop (the only
# psum is the scalar ray counter).  The RNG counter is the absolute pixel
# index, so per-device slab states compose BIT-IDENTICALLY into the unsharded
# stepper's state (tested in tests/test_sharding.py).


def _state_specs(axis: str):
    from dataclasses import fields
    specs = {f.name: P(axis) for f in fields(monte_carlo.WavefrontState)}
    specs["nrays"] = P()  # global counter, replicated via psum
    return monte_carlo.WavefrontState(**specs)


def _lanes_per_device(cfg: RenderConfig, mesh, axis: str) -> int:
    n = mesh.shape[axis]
    lanes = cfg.height * cfg.width
    if cfg.height % n:
        raise ValueError(f"height {cfg.height} not divisible by mesh size {n}")
    return lanes // n


def wavefront_init_sharded(scene: Scene, camera, cfg: RenderConfig, key,
                           mesh, axis: str = TILE_AXIS
                           ) -> monte_carlo.WavefrontState:
    """Lane state with the lane (pixel) axis sharded over ``mesh``."""
    per = _lanes_per_device(cfg, mesh, axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=_state_specs(axis), check_vma=False)
    def body(scene_, camera_, key_):
        i = jax.lax.axis_index(axis)
        return monte_carlo.wavefront_init(scene_, camera_, cfg, key_,
                                          pixel_offset=i * per, n_lanes=per)

    return body(scene, camera, key)


def wavefront_steps_sharded(scene: Scene, camera, cfg: RenderConfig, key,
                            state: monte_carlo.WavefrontState, n_steps: int,
                            mesh, axis: str = TILE_AXIS,
                            intersect_fn=None, nearest_t_fn=None
                            ) -> monte_carlo.WavefrontState:
    """Advance the sharded lane state ``n_steps`` bounce steps per device."""
    import dataclasses

    per = _lanes_per_device(cfg, mesh, axis)
    specs = _state_specs(axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), specs),
             out_specs=specs, check_vma=False)
    def body(scene_, camera_, key_, st):
        i = jax.lax.axis_index(axis)
        local = dataclasses.replace(st, nrays=jnp.zeros_like(st.nrays))
        out = monte_carlo.wavefront_steps(
            scene_, camera_, cfg, key_, local, n_steps,
            intersect_fn=intersect_fn, nearest_t_fn=nearest_t_fn,
            pixel_offset=i * per)
        # Global honest ray counter: psum the per-device delta once per call
        # (one scalar collective per n_steps bounce steps, not per step).
        return dataclasses.replace(
            out, nrays=st.nrays + jax.lax.psum(out.nrays, axis))

    return body(scene, camera, key, state)


def wavefront_steps_fused_mesh_sharded(mp, camera, cfg: RenderConfig, key,
                                       state: monte_carlo.WavefrontState,
                                       n_steps: int, mesh,
                                       axis: str = TILE_AXIS, *,
                                       cap_main: int | None = None,
                                       cap_shadow: int | None = None):
    """The FUSED mesh-MC engine (``ops.fused_mesh``) over a sharded lane
    state: each device advances its row slab independently (compaction,
    Pallas kernels and all — every mesh decision is lane-local and the RNG
    hashes absolute pixel ids, so per-device slabs are bit-identical to the
    same lanes of an unsharded run).  The only collective is one scalar
    psum of the overflow count per call so ANY device's cap overflow is
    visible to the (replicated) driver.

    Returns ``(state, overflow)``; the honest ray counter follows
    ``wavefront_steps_sharded``'s convention (per-device deltas psummed
    into the carried counter)."""
    import dataclasses

    from cpu_based_ray_tracer_tpu.ops import fused_mesh

    per = _lanes_per_device(cfg, mesh, axis)
    specs = _state_specs(axis)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), specs),
             out_specs=(specs, P()), check_vma=False)
    def body(camera_, key_, st):
        i = jax.lax.axis_index(axis)
        local = dataclasses.replace(st, nrays=jnp.zeros_like(st.nrays))
        out, overflow, _np = fused_mesh.wavefront_steps_fused_mesh(
            mp, camera_, cfg, key_, local, n_steps, cap_main=cap_main,
            cap_shadow=cap_shadow, pixel_offset=i * per)
        out = dataclasses.replace(
            out, nrays=st.nrays + jax.lax.psum(out.nrays, axis))
        return out, jax.lax.psum(overflow, axis)[None]

    st2, overflow = body(camera, key, state)
    return st2, overflow[0]

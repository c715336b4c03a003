"""Non-physical path tracer stage: RTIOW materials in the interactive camera.

The NPPT stage (``non physical path tracer/8599RayTracerGUI/src/``) is the
offline prototype's scatter integrator (same Diffuse/Metal/Dielectric
semantics, float/glm instead of double, ``Renderer.cpp:90-114``) driven by
the GUI perspective camera with per-frame jitter + temporal accumulation and
a per-pixel gamma before the clamp/pack (``Renderer.cpp:126-130``).

The integrator is literally ``models.offline.trace`` — the reference
copy-pasted it between stages; we share it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import offline
from cpu_based_ray_tracer_tpu.ops import tonemap
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng


def render_progressive(scene: Scene, camera: cam_mod.PerspectiveCamera,
                       cfg: RenderConfig, key, accum, start_sample):
    """Accumulate cfg.spp jittered frames (Camera.cpp jitter + accumulation
    buffer, Renderer.cpp:118-124)."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    pixel = jnp.arange(h * w, dtype=jnp.uint32)

    def one(acc, s):
        uj = rng.uniforms4(seed, pixel, s, 0, rng.JITTER)
        jitter = jnp.stack([uj[0].reshape(h, w), uj[1].reshape(h, w)], -1)
        d = cam_mod.perspective_rays(camera, w, h, jitter).reshape(-1, 3)
        o = jnp.broadcast_to(camera.position, d.shape)
        rad = offline.trace(scene, o, d, cfg, seed=seed, pixel=pixel,
                            sample=s)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one, accum, start_sample + jnp.arange(cfg.spp))
    return acc, start_sample + cfg.spp


def render(scene: Scene, camera, cfg: RenderConfig, key) -> jax.Array:
    acc, _ = render_progressive(
        scene, camera, cfg, key,
        jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), 0)
    return acc / cfg.spp


def render_u8(scene, camera, cfg: RenderConfig, key) -> jax.Array:
    """Gamma -> clamp -> quantize, the NPPT display path
    (Renderer.cpp:126-130 applies gamma per accumulated pixel)."""
    return tonemap.quantize_u8(render(scene, camera, cfg, key), cfg.gamma)

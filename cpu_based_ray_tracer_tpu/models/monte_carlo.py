"""Monte Carlo path tracer (the north-star stage).

The reference's recursive estimator (``Monte Carlo Path Tracer/.../
Renderer.cpp:136-214``) rewritten as a fixed-depth ``lax.scan`` with a
Russian-roulette mask — identical estimator semantics:

- primary miss -> night-sky constant (Renderer.cpp:146);
- primary hit on an emitter -> its emission, done ("skylight" assumption:
  no indirect shading of the light itself, Renderer.cpp:151-161);
- at every shading point: direct next-event estimate from one uniform
  area-light sample (pdf = 1/total light area; geometry term
  cos * cos' / dist^2; shadow tested with the +0.01 tolerance,
  Renderer.cpp:170-189) plus RR-gated indirect bounce with a uniform-
  hemisphere sample at pdf 1/2pi and BRDF albedo/pi
  (WhittedMaterial.h:44-117), weighted 1/p_RR (Renderer.cpp:193-208);
- an indirect ray that escapes or hits the emitter contributes nothing
  (Renderer.cpp:201-207) — NEE already accounted for the light.

The recursion depth is unbounded in the reference (E[depth] = 1/(1-p));
we truncate at ``cfg.max_depth`` scan steps (residual path mass p^D —
0.8^16 ~ 2.8% of *paths*, far less of *energy*; raise for goldens).

All randomness is the counter-based pcg4d hash of (absolute pixel index,
sample, bounce, stream) — see ``utils.rng`` — so renders are bit-identical
under any sharding of the pixel axis.

Differentiability: the discrete hit is detached (gathers of scene arrays by
detached indices keep gradients flowing to the gathered *values*), so pixel
gradients w.r.t. material albedo/emission and light geometry are exact for
the continuous part of the estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.ops import gather, intersect, sampling, vec
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng


def _brdf_diffuse(albedo, cos_in):
    """Lambertian BRDF albedo/pi, zero below the horizon
    (WhittedMaterial.h:58-69)."""
    return jnp.where(cos_in[..., None] >= 0.0, albedo / jnp.pi, 0.0)


def trace(scene: Scene, origin, direction, cfg: RenderConfig, *,
          seed, pixel, sample, count_rays: bool = False):
    """Path radiance for a batch of primary rays, (R, 3).

    seed: uint32 scalar; pixel: (R,) absolute pixel index (the RNG counter);
    sample: scalar sample index.  ``count_rays``: also return the number of
    rays actually traced (primary + shadow + indirect) for the rays/s metric.
    """
    r = origin.shape[0]
    mats = scene.materials

    def body(state, bounce):
        o, d, throughput, radiance, alive, nrays = state

        hit = intersect.intersect_scene(scene, o, d, t_min=cfg.t_min)
        nrays = nrays + jnp.sum(alive)

        # One contraction for all material lookups (ops.gather).
        emit, albedo, emissive_f = gather.take_packed(
            hit.material, mats.emission, mats.albedo,
            mats.emissive.astype(jnp.float32))
        hit_emissive = hit.hit & (emissive_f > 0.5)
        is_primary = bounce == 0
        # Primary miss -> night sky; deeper miss -> nothing (Renderer.cpp:146,
        # 201-207: "no light from the skybox" on indirect rays).
        sky = jnp.where(is_primary, scene.sky(vec.normalize(d)),
                        jnp.zeros_like(radiance))
        radiance = radiance + jnp.where((alive & ~hit.hit)[:, None],
                                        throughput * sky, 0.0)
        # Emissive hit: contributes only on the primary ray (the indirect
        # recursion is only entered for non-emissive hits, Renderer.cpp:201).
        radiance = radiance + jnp.where(
            (alive & hit_emissive)[:, None],
            jnp.where(is_primary, throughput * emit, 0.0), 0.0)

        alive = alive & hit.hit & ~hit_emissive

        # Shading point: normal flipped toward the viewer, epsilon offset
        # (Renderer.cpp:163-168).
        n = hit.facing_normal
        p = hit.point + n * cfg.eps_offset

        # --- Direct: one area-light sample (NEE), Renderer.cpp:170-189.
        ul = rng.uniforms4(seed, pixel, sample, bounce, rng.LIGHT)
        ls = sampling.sample_area_light(scene, ul[0], ul[1], ul[2])
        to_l = ls.position - p
        dist = jnp.squeeze(vec.norm(to_l), -1)
        wi_l = to_l / jnp.maximum(dist, 1e-20)[:, None]
        ln = jnp.where(vec.dot(ls.normal, -wi_l) < 0.0, -ls.normal, ls.normal)
        occ = intersect.intersect_scene(scene, p, wi_l, t_min=cfg.t_min)
        visible = dist < occ.t + cfg.shadow_tolerance  # Renderer.cpp:186
        nrays = nrays + jnp.sum(alive)                 # shadow rays
        cos_s = jnp.sum(wi_l * n, -1)
        cos_l = jnp.sum(-wi_l * ln, -1)
        geom = cos_s * cos_l / jnp.maximum(dist * dist, 1e-20)
        direct = (ls.emission * _brdf_diffuse(albedo, cos_s)
                  * (geom / jnp.maximum(ls.pdf, 1e-20))[:, None])
        use = alive & visible & ls.valid
        radiance = radiance + jnp.where(use[:, None], throughput * direct, 0.0)

        # --- Indirect: RR then uniform hemisphere (Renderer.cpp:191-208).
        us = rng.uniforms4(seed, pixel, sample, bounce, rng.SCATTER)
        survive = us[2] < cfg.rr_survival
        wi = vec.hemisphere_surface_from(n, us[0], us[1])
        cos_i = jnp.sum(wi * n, -1)
        pdf = 1.0 / (2.0 * jnp.pi)  # WhittedMaterial.h:44-56
        weight = (_brdf_diffuse(albedo, cos_i) * cos_i[:, None]
                  / pdf / cfg.rr_survival)
        alive = alive & survive
        throughput = jnp.where(alive[:, None], throughput * weight, throughput)
        o = jnp.where(alive[:, None], p, o)
        d = jnp.where(alive[:, None], wi, d)
        return (o, d, throughput, radiance, alive, nrays), None

    state = (origin, direction,
             jnp.ones((r, 3), origin.dtype), jnp.zeros((r, 3), origin.dtype),
             jnp.ones((r,), bool), jnp.zeros((), jnp.int32))
    (_, _, _, radiance, _, nrays), _ = jax.lax.scan(
        body, state, jnp.arange(cfg.max_depth))
    if count_rays:
        return radiance, nrays
    return radiance


def _primary_rays(camera, cfg: RenderConfig, seed, sample,
                  pixel_offset: int = 0, height: int | None = None):
    """Jittered primary rays for a (possibly row-sharded) image slab.

    ``pixel_offset``: absolute index of the slab's first pixel (row-major) —
    the RNG counter, so slabs compose into the exact unsharded image.
    """
    h = cfg.height if height is None else height
    w = cfg.width
    pixel = (jnp.arange(h * w, dtype=jnp.uint32)
             + jnp.uint32(pixel_offset))
    uj = rng.uniforms4(seed, pixel, sample, 0, rng.JITTER)
    jitter = jnp.stack([uj[0].reshape(h, w), uj[1].reshape(h, w)], -1)
    row0 = pixel_offset // w
    d = cam_mod.perspective_rays_slab(camera, w, cfg.height, row0, h,
                                      jitter).reshape(-1, 3)
    o = jnp.broadcast_to(camera.position, d.shape)
    return o, d, pixel


def render(scene: Scene, camera: cam_mod.PerspectiveCamera, cfg: RenderConfig,
           key: jax.Array) -> jax.Array:
    """Mean linear radiance, (H, W, 3).  The SPP loop mirrors the reference's
    progressive accumulation (one jittered frame per accumulated sample,
    Renderer.cpp:91-134 + Camera.cpp:121) as a scan over the sample index."""
    acc, _ = render_progressive(scene, camera, cfg, key,
                                jnp.zeros((cfg.height, cfg.width, 3),
                                          jnp.float32), 0)
    return acc / cfg.spp


def render_progressive(scene: Scene, camera, cfg: RenderConfig, key,
                       accum, start_sample):
    """Accumulate ``cfg.spp`` more samples on top of ``accum`` (sample indices
    ``start_sample..start_sample+spp``).  The (accum, next_index) pair is the
    checkpointable progressive-rendering state — the reference's
    ``temporal_accumulation_frame_data`` + ``frame_accumulating`` counter
    (Renderer.cpp:58-60, 129-134) lifted out of the renderer."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)

    def one_sample(acc, s):
        o, d, pixel = _primary_rays(camera, cfg, seed, s)
        rad = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=s)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one_sample, accum,
                          start_sample + jnp.arange(cfg.spp))
    return acc, start_sample + cfg.spp


def count_rays(scene: Scene, camera, cfg: RenderConfig, key) -> jax.Array:
    """Total rays traced for one sample pass (for the rays/s benchmark)."""
    seed = rng.seed_from_key(key)
    o, d, pixel = _primary_rays(camera, cfg, seed, 0)
    _, n = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=0,
                 count_rays=True)
    return n

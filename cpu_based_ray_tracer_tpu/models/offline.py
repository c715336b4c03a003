"""RTIOW scatter integrator (offline prototype + NPPT stages).

The reference's recursive ``ray_color`` (``offline prototype/.../main.cpp:
40-72``; float/glm twin at ``non physical path tracer/.../Renderer.cpp:
90-114``) becomes a fixed-depth ``lax.scan`` over the bounce index with an
``alive`` mask: every lane is one path; a scatter multiplies the throughput,
a miss adds throughput * sky and kills the lane, depth exhaustion leaves the
lane black — exactly the reference's termination semantics (depth 0 returns
black, absorb returns black).

Material semantics, per kind (see ``scene.Materials``):
- LAMBERT: three diffuse sub-models selected by config
  (``offline prototype/.../Diffuse.h:27-45``), near-zero fallback to the
  normal (Diffuse.h:37-40).
- METAL: mirror + fuzz * in-unit-sphere; absorbed when the scattered ray
  leaves below the surface (``Metal.h:28-34``).
- DIELECTRIC: attenuation 1, eta ratio by face, TIR or Schlick-vs-uniform
  coin -> reflect else refract (``Dielectric.h:27-56``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.ops import gather, intersect, tonemap, vec
from cpu_based_ray_tracer_tpu.scene import (DIELECTRIC, DIFFUSE_IN_HEMISPHERE,
                                            DIFFUSE_IN_SPHERE, LAMBERT, METAL,
                                            Scene)
from cpu_based_ray_tracer_tpu.utils import rng


def scatter(scene: Scene, hit: intersect.Hit, direction, cfg: RenderConfig,
            seed, pixel, sample, bounce):
    """One scatter event for every lane.  Returns (new_direction (R,3),
    attenuation (R,3), scattered (R,) bool)."""
    mats = scene.materials
    # One contraction for all material lookups (ops.gather).
    kind_f, albedo, ior, fuzz = gather.take_packed(
        hit.material, mats.kind.astype(jnp.float32), mats.albedo, mats.ior,
        mats.fuzz)
    kind = kind_f.astype(jnp.int32)
    n = hit.facing_normal
    u1, u2, u3, u4 = rng.uniforms4(seed, pixel, sample, bounce, rng.SCATTER)

    # --- LAMBERT (Diffuse.h:27-45): three compile/runtime-selectable models.
    if cfg.diffuse_model == DIFFUSE_IN_SPHERE:
        d_diff = n + vec.ball_from(u1, u2, u3)
    elif cfg.diffuse_model == DIFFUSE_IN_HEMISPHERE:
        d_diff = vec.hemisphere_volume_from(n, u1, u2, u3)
    else:  # DIFFUSE_ON_SPHERE — true Lambertian, the reference default
        d_diff = n + vec.sphere_from(u1, u2)
    # Near-zero direction fallback to the normal (Diffuse.h:37-40).
    near_zero = jnp.all(jnp.abs(d_diff) < 1e-8, axis=-1, keepdims=True)
    d_diff = jnp.where(near_zero, n, d_diff)

    # --- METAL (Metal.h:28-34).
    unit_d = vec.normalize(direction)
    d_metal = (vec.reflect(unit_d, n)
               + fuzz[:, None] * vec.ball_from(u1, u2, u3))
    metal_ok = jnp.sum(d_metal * n, -1) > 0.0

    # --- DIELECTRIC (Dielectric.h:27-56).
    eta_ratio = jnp.where(hit.front, 1.0 / ior, ior)
    cos_theta = jnp.minimum(-jnp.sum(unit_d * n, -1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = eta_ratio * sin_theta > 1.0
    refl_prob = vec.schlick(cos_theta, eta_ratio)
    do_reflect = cannot_refract | (refl_prob > u4)
    refracted, _ = vec.refract(unit_d, n, eta_ratio[:, None])
    d_diel = jnp.where(do_reflect[:, None], vec.reflect(unit_d, n), refracted)

    is_l = (kind == LAMBERT)[:, None]
    is_m = (kind == METAL)[:, None]
    new_dir = jnp.where(is_l, d_diff, jnp.where(is_m, d_metal, d_diel))
    attenuation = jnp.where((kind == DIELECTRIC)[:, None], 1.0, albedo)
    scattered = jnp.where(kind == METAL, metal_ok, True)
    return vec.normalize(new_dir), attenuation, scattered


def trace(scene: Scene, origin, direction, cfg: RenderConfig, *,
          seed, pixel, sample):
    """Path radiance for a batch of rays, (R, 3).  ``pixel`` is the absolute
    pixel/lane index used as the RNG counter (see utils.rng)."""

    def body(state, bounce):
        o, d, throughput, radiance, alive = state
        hit = intersect.intersect_scene(scene, o, d, t_min=cfg.t_min)
        missed = alive & ~hit.hit
        radiance = radiance + jnp.where(missed[:, None],
                                        throughput * scene.sky(vec.normalize(d)),
                                        0.0)
        new_d, att, scat_ok = scatter(scene, hit, d, cfg,
                                      seed, pixel, sample, bounce)
        survive = alive & hit.hit & scat_ok
        throughput = jnp.where(survive[:, None], throughput * att, throughput)
        o = jnp.where(survive[:, None], hit.point, o)
        d = jnp.where(survive[:, None], new_d, d)
        return (o, d, throughput, radiance, survive), None

    r = origin.shape[0]
    state = (origin, direction,
             jnp.ones((r, 3), origin.dtype), jnp.zeros((r, 3), origin.dtype),
             jnp.ones((r,), bool))
    (_, _, _, radiance, _), _ = jax.lax.scan(
        body, state, jnp.arange(cfg.max_depth))
    # Lanes still alive after max_depth bounces contribute black
    # (main.cpp:42-45: depth exhausted -> no light).
    return radiance


def render(scene: Scene, camera: cam_mod.ThinLensCamera, cfg: RenderConfig,
           key: jax.Array) -> jax.Array:
    """Mean linear radiance per pixel, (H, W, 3); row 0 = top scanline
    (the reference writes rows bottom-up flipped, main.cpp:172).

    SPP loop = ``lax.scan`` over the sample index (the reference loops samples
    per pixel at main.cpp:165-171).
    """
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)           # (H, W); row 0 = top
    row_from_bottom = (h - 1.0) - yy      # reference 'row' runs bottom-up
    pixel = jnp.arange(h * w, dtype=jnp.uint32)

    def one_sample(acc, s):
        j1, j2, l1, l2 = rng.uniforms4(seed, pixel, s, 0, rng.JITTER)
        u = (xx.reshape(-1) + j1) / w       # main.cpp:167
        v = (row_from_bottom.reshape(-1) + j2) / h
        o, d = cam_mod.thin_lens_rays(camera, u, v, l1, l2)
        rad = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=s)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one_sample, jnp.zeros((h, w, 3), jnp.float32),
                          jnp.arange(cfg.spp))
    return acc / cfg.spp


def render_u8(scene, camera, cfg: RenderConfig, key) -> jax.Array:
    """Quantized output matching write_color (color.h:33-52)."""
    return tonemap.quantize_u8(render(scene, camera, cfg, key), cfg.gamma)

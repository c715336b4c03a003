"""Initial-framework stage: the toy energy-halving reflect loop.

Mirrors ``initial framework/8599RayTracerGUI/src/Renderer.cpp:90-188``:

- 5 bounces, path energy starts at 1 and halves per bounce (:107, :117);
- a single hard-coded directional light normalize(-1,-1,-1) (:101): each hit
  adds ``energy * albedo * max(dot(n, -L), 0)`` (:115);
- miss adds ``energy * sky`` with sky (0.6, 0.7, 0.9) and ends (:99, :108);
- bounce direction = reflect about (normal + roughness * U[-0.5, 0.5)^3)
  (:121), origin nudged 1e-4 along the normal (:120);
- spheres only, and only the NEAR quadratic root with t > 0 counts — a ray
  inside a sphere does NOT hit it (:155-160, comment at :156).

This stage established the progressive-accumulation machinery the later
stages inherit; accumulation here too is just ``render_progressive``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.ops import gather, vec
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng

SKY = np.asarray((0.6, 0.7, 0.9), np.float32)  # host constant (no backend init at import)
LIGHT_DIR = (-1.0, -1.0, -1.0)
BOUNCES = 5
ENERGY_FALLOFF = 0.5
ACNE_EPS = 1e-4


def _nearest_sphere_near_root(scene: Scene, o, d):
    """Near-root-only nearest sphere (Intersection_Shader, Renderer.cpp:
    133-164): returns (t, index, hit) with t from the smaller root only."""
    sp = scene.spheres
    oc = o[:, None, :] - sp.center[None, :, :]
    a = jnp.sum(d * d, -1)[:, None]
    b = 2.0 * jnp.sum(oc * d[:, None, :], -1)
    c = jnp.sum(oc * oc, -1) - (sp.radius * sp.radius)[None, :]
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    t_near = (-b - jnp.sqrt(jnp.where(ok, disc, 0.0))) / (2.0 * a)
    t = jnp.where(ok & (t_near > 0.0), t_near, jnp.inf)
    best = jnp.argmin(t, -1)
    tb = jnp.take_along_axis(t, best[:, None], -1)[:, 0]
    return tb, best.astype(jnp.int32), jnp.isfinite(tb)


def trace(scene: Scene, origin, direction, cfg: RenderConfig, *,
          seed, pixel, sample):
    """(R, 3) color for a batch of rays."""
    mats = scene.materials
    light = vec.normalize(jnp.asarray(LIGHT_DIR, origin.dtype))
    o, d = origin, direction
    color = jnp.zeros_like(origin)
    energy = jnp.ones(origin.shape[:1], origin.dtype)
    alive = jnp.ones(origin.shape[:1], bool)

    for bounce in range(BOUNCES):
        t, idx, hit = _nearest_sphere_near_root(scene, o, d)
        # Miss: sky * energy, stop.
        color = color + jnp.where((alive & ~hit)[:, None],
                                  energy[:, None] * SKY, 0.0)
        # Hit: white directional light, diffuse dot term.
        sphere_mat = scene.spheres.material
        albedo, rough, center = gather.take_packed(
            idx, mats.albedo[sphere_mat], mats.fuzz[sphere_mat],
            scene.spheres.center)
        point = o + t[:, None] * d
        n = vec.normalize(point - center)
        intensity = jnp.maximum(jnp.sum(n * (-light), -1), 0.0)
        color = color + jnp.where((alive & hit)[:, None],
                                  (energy * intensity)[:, None] * albedo, 0.0)
        energy = jnp.where(alive & hit, energy * ENERGY_FALLOFF, energy)
        # Roughness-perturbed mirror bounce (Renderer.cpp:121).
        u = rng.uniforms4(seed, pixel, sample, bounce, rng.SCATTER)
        perturb = jnp.stack([u[0], u[1], u[2]], -1) - 0.5
        n_fuzz = n + rough[:, None] * perturb
        alive = alive & hit
        o = jnp.where(alive[:, None], point + n * ACNE_EPS, o)
        d = jnp.where(alive[:, None], vec.reflect(d, n_fuzz), d)
    return color


def render(scene: Scene, camera: cam_mod.PerspectiveCamera,
           cfg: RenderConfig, key: jax.Array) -> jax.Array:
    """(H, W, 3) mean over cfg.spp accumulation frames (the stage's
    temporal accumulation, Renderer.cpp:125-130; pixel-center rays — this
    stage predates per-frame jitter, so every frame is identical unless
    roughness > 0 makes the bounce stochastic)."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    d = cam_mod.perspective_rays(camera, w, h).reshape(-1, 3)
    o = jnp.broadcast_to(camera.position, d.shape)
    pixel = jnp.arange(h * w, dtype=jnp.uint32)

    def one(acc, s):
        rad = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=s)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one, jnp.zeros((h, w, 3), jnp.float32),
                          jnp.arange(cfg.spp))
    return acc / cfg.spp

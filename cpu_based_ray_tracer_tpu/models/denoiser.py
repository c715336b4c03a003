"""Denoiser stage: 1-SPP real-time path tracing + spatial/temporal denoise.

Mirrors the per-frame pipeline of ``Denoiser/8599RayTracerGUI/src/
Renderer.cpp:101-270``: path-trace a 1-SPP G-buffer (deterministic
pixel-center primary rays, ``Denoiser/.../Camera.cpp:132-133``; accumulation
is disabled in this stage, Renderer.cpp:84-87) -> joint-bilateral filter ->
save the frame's view/projection matrices -> temporal reprojection filter.

``DenoiserParams`` is the reference's ImGui parameter matrix
(``Renderer.h:35-59`` Settings + ``mainloop.cpp:17-283`` buttons: JBF kernel
half-size 7/16/32, temporal half-size 3/7/16, tolerance 1/2/3, current-frame
weighting 0.05/0.1/0.2/0.5, immediate clamping on/off).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.ops import denoise, intersect
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class DenoiserParams:
    """Runtime denoiser settings (reference defaults at Denoiser.h:332-343)."""

    use_jbf: bool = True
    jbf_half_size: int = 7            # "try 7, 16, 32"
    # Spatial filter: "atrous" (default — à-trous wavelet approximation,
    # O(25 log k) taps/pixel) or "jbf" (the reference's dense O(K^2) window,
    # kept as the quality oracle; its own README calls it "too brutal to
    # have an acceptable render time", README.md:132).
    spatial: str = "atrous"
    use_temporal: bool = True
    temporal_half_size: int = 3
    tolerance: float = 1.0
    current_frame_weighting: float = 0.2
    immediate_clamping: bool = True   # clamp 1-SPP radiance before JBF

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def global_prim_id(hit: intersect.Hit, n_triangles: int) -> jax.Array:
    """Global primitive ids starting at 1 (the reference threads an
    ``id_count`` through meshes, ``Denoiser/.../Renderer.cpp:37-45``;
    -1 = miss, ``IntersectionRecord.h`` default)."""
    tri_id = hit.prim + 1
    sph_id = n_triangles + hit.prim + 1
    pid = jnp.where(hit.is_triangle, tri_id, sph_id)
    return jnp.where(hit.hit, pid, -1).astype(jnp.int32)


def render_gbuffer(scene: Scene, camera: cam_mod.PerspectiveCamera,
                   cfg: RenderConfig, key: jax.Array, frame_index,
                   immediate_clamping: bool = True) -> denoise.GBuffer:
    """One 1-SPP frame into a G-buffer (``Renderer.cpp:274-311``):
    deterministic pixel-center primaries; color = full path radiance
    (night sky on miss), optionally clamped to [0,1] against fireflies;
    aux = primary-hit world pos / viewer-flipped normal / contributor /
    global primitive id; plus this frame's view/proj matrices."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    d = cam_mod.perspective_rays(camera, w, h).reshape(-1, 3)   # centers
    o = jnp.broadcast_to(camera.position, d.shape)
    pixel = jnp.arange(h * w, dtype=jnp.uint32)

    # ONE scene intersection for both the G-buffer aux channels and the
    # path trace's first bounce (the reference fills both in one cast,
    # Renderer.cpp:287-311; bit-identical to re-intersecting).
    hit = intersect.intersect_scene(scene, o, d, t_min=cfg.t_min)
    color = monte_carlo.trace(scene, o, d, cfg, seed=seed, pixel=pixel,
                              sample=frame_index, first_hit=hit)
    if immediate_clamping:
        color = jnp.clip(color, 0.0, 1.0)

    view, proj = cam_mod.view_proj_matrices(camera, w, h)
    return denoise.GBuffer(
        color=color.reshape(h, w, 3),
        world_pos=hit.point.reshape(h, w, 3),
        normal=hit.facing_normal.reshape(h, w, 3),
        contributor=hit.hit.reshape(h, w),
        prim_id=global_prim_id(hit, scene.triangles.count).reshape(h, w),
        view=view, proj=proj)


def render_gbuffer_fused(scene: Scene, camera: cam_mod.PerspectiveCamera,
                         cfg: RenderConfig, key: jax.Array, frame_index,
                         immediate_clamping: bool = True) -> denoise.GBuffer:
    """``render_gbuffer`` through the fused Pallas kernel's single-path mode
    (``ops.fused.single_sample_gbuffer``) — same estimator and G-buffer
    channels (parity-gated in tests/test_fused.py), ~14x faster at the
    reference viewport on the v5e chip; the pass that makes the Denoiser
    stage real-time (VERDICT r3 next #3).  Forward-only."""
    from cpu_based_ray_tracer_tpu.ops import fused

    h, w = cfg.height, cfg.width
    fs = fused.pack_scene(scene)
    color, pos, normal, pid, contrib = fused.single_sample_gbuffer(
        fs, camera, cfg, key, frame_index)
    if immediate_clamping:
        color = jnp.clip(color, 0.0, 1.0)
    view, proj = cam_mod.view_proj_matrices(camera, w, h)
    return denoise.GBuffer(
        color=color.reshape(h, w, 3), world_pos=pos.reshape(h, w, 3),
        normal=normal.reshape(h, w, 3), contributor=contrib.reshape(h, w),
        prim_id=pid.reshape(h, w), view=view, proj=proj)


def denoise_frame(g: denoise.GBuffer, prev: denoise.GBuffer | None,
                  params: DenoiserParams):
    """(filtered color, G-buffer to carry as history).  The carried history
    holds the JBF-filtered color, exactly like the reference (which filters
    in place before saving previous_frame_g_buffer, Denoiser.h:226, 326)."""
    color = g.color
    if params.use_jbf:
        spatial = (denoise.joint_bilateral_atrous
                   if params.spatial == "atrous" else denoise.joint_bilateral)
        color = spatial(g, params.jbf_half_size,
                        clamp=params.immediate_clamping)
    g = dataclasses.replace(g, color=color)
    if params.use_temporal and prev is not None:
        color = denoise.temporal(g, prev, params.temporal_half_size,
                                 params.tolerance,
                                 params.current_frame_weighting)
        g = dataclasses.replace(g, color=color)
    return color, g


def render_frame(scene: Scene, camera, cfg: RenderConfig, key,
                 frame_index, prev: denoise.GBuffer | None,
                 params: DenoiserParams, engine: str = "scan"):
    """Full per-frame pipeline (render -> JBF -> temporal).

    engine: "scan" (reverse-differentiable XLA path, the golden path) or
    "fused" (single-path Pallas kernel; same estimator, real-time rates)."""
    render = render_gbuffer_fused if engine == "fused" else render_gbuffer
    g = render(scene, camera, cfg, key, frame_index,
               params.immediate_clamping)
    return denoise_frame(g, prev, params)


def render_sequence(scene: Scene, cameras, cfg: RenderConfig, key,
                    params: DenoiserParams, engine: str = "scan"):
    """Denoised animated sequence over a list of camera poses (the BASELINE
    config #5 '1-SPP animated sequence ... with motion vectors').

    The whole per-frame pipeline (render -> JBF -> temporal) is ONE jitted
    program (cfg/params are hashable statics); the python loop only feeds
    poses.  Two compilations total: the first frame (no history) and the
    steady state."""
    step0 = jax.jit(lambda sc, cam, k, i: render_frame(
        sc, cam, cfg, k, i, None, params, engine), static_argnames=())
    step = jax.jit(lambda sc, cam, k, i, prev: render_frame(
        sc, cam, cfg, k, i, prev, params, engine))
    frames = []
    prev = None
    for i, cam in enumerate(cameras):
        if prev is None:
            color, prev = step0(scene, cam, key, i)
        else:
            color, prev = step(scene, cam, key, i, prev)
        frames.append(color)
    return frames

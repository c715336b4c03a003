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

import functools

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.ops import gather, intersect, sampling, vec
from cpu_based_ray_tracer_tpu.scene import Scene, _pytree
from cpu_based_ray_tracer_tpu.utils import rng


def _brdf_diffuse(albedo, cos_in):
    """Lambertian BRDF albedo/pi, zero below the horizon
    (WhittedMaterial.h:58-69)."""
    return jnp.where(cos_in[..., None] >= 0.0, albedo / jnp.pi, 0.0)


@_pytree
class BounceRecord:
    """The discrete outcome of one bounce, per lane — everything a
    differentiable REPLAY cannot recompute cheaply (winner indices) or
    continuously (boolean visibility): 7 bytes/lane/bounce.  All randomness
    is counter-based, so it is NOT recorded — the replay regenerates it."""

    prim: jax.Array         # (..., R) i32 winner primitive index (raw hit)
    is_triangle: jax.Array  # (..., R) bool
    hit: jax.Array          # (..., R) bool raw hit flag
    visible: jax.Array      # (..., R) bool hard shadow-test result


def _bounce_step(scene: Scene, cfg: RenderConfig, *, seed, pixel, sample,
                 bounce, o, d, throughput, alive,
                 intersect_fn=None, nearest_t_fn=None, soft_vis_fn=None,
                 replay_rec: BounceRecord | None = None,
                 with_record: bool = False):
    """One path-tracing bounce for a batch of lanes (the body of BOTH engines).

    ``sample``/``bounce`` may be scalars (the fixed-depth scan engine) or
    per-lane (R,) vectors (the wavefront engine) — the RNG hash and all the
    masking are elementwise either way, so the two engines trace *identical*
    paths per (pixel, sample) and differ only in lane scheduling.

    Returns ``(radiance_delta, o', d', throughput', continues, n_main,
    n_shadow)`` where ``continues`` marks lanes whose path survives into the
    next bounce and the n_* are the honest ray counts of this step.

    ``replay_rec``: a recorded :class:`BounceRecord` for this bounce — the
    scene intersection and the shadow test are REPLAYED from it (bit-exact,
    O(R), no (R, N) producers; see ``render_replay``).  ``with_record``:
    also return this bounce's BounceRecord as an extra trailing element.
    """
    mats = scene.materials
    if intersect_fn is None:
        intersect_fn = lambda s, oo, dd, tm: intersect.intersect_scene(  # noqa: E731
            s, oo, dd, t_min=tm)
    if nearest_t_fn is None:
        nearest_t_fn = lambda s, oo, dd, tm: intersect.nearest_t(  # noqa: E731
            s, oo, dd, t_min=tm)

    if replay_rec is not None:
        hit = intersect.hit_from_record(scene, o, d, replay_rec.prim,
                                        replay_rec.is_triangle,
                                        replay_rec.hit, cfg.t_min)
    else:
        hit = intersect_fn(scene, o, d, cfg.t_min)
    n_main = jnp.sum(alive)

    # One contraction for all material lookups (ops.gather).
    emit, albedo, emissive_f = gather.take_packed(
        hit.material, mats.emission, mats.albedo,
        mats.emissive.astype(jnp.float32))
    hit_emissive = hit.hit & (emissive_f > 0.5)
    is_primary = jnp.broadcast_to(jnp.asarray(bounce == 0), alive.shape)
    # Primary miss -> night sky; deeper miss -> nothing (Renderer.cpp:146,
    # 201-207: "no light from the skybox" on indirect rays).
    sky = jnp.where(is_primary[:, None], scene.sky(vec.normalize(d)), 0.0)
    radiance = jnp.where((alive & ~hit.hit)[:, None], throughput * sky, 0.0)
    # Emissive hit: contributes only on the primary ray (the indirect
    # recursion is only entered for non-emissive hits, Renderer.cpp:201).
    radiance = radiance + jnp.where(
        (alive & hit_emissive & is_primary)[:, None], throughput * emit, 0.0)

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
    visible = None
    if replay_rec is not None:
        # Replay: the recorded hard-shadow bit.  Gradient-equal to the live
        # test — `dist < occ_t + tol` is boolean, so occ_t never carries a
        # cotangent; only `dist` (recomputed here) is differentiable.
        visible = replay_rec.visible
        vis_w = visible.astype(jnp.float32)
    elif cfg.soft_shadow_beta > 0.0:
        # Differentiable-visibility estimator (SURVEY §7 hard part (c)):
        # edge-relaxed per-occluder coverage — smooth in occluder geometry
        # exactly at penumbra boundaries, where the binary test's gradient
        # is zero/undefined.  Biased over a ~beta-wide edge band; beta -> 0
        # recovers the reference's hard test.
        svf = soft_vis_fn or intersect.soft_visibility
        vis_w = svf(scene, p, wi_l, dist, cfg.t_min,
                    cfg.soft_shadow_beta, cfg.shadow_tolerance)
    else:
        occ_t = nearest_t_fn(scene, p, wi_l, cfg.t_min)
        visible = dist < occ_t + cfg.shadow_tolerance  # Renderer.cpp:186
        vis_w = visible.astype(jnp.float32)
    n_shadow = jnp.sum(alive)                      # shadow rays
    cos_s = jnp.sum(wi_l * n, -1)
    cos_l = jnp.sum(-wi_l * ln, -1)
    geom = cos_s * cos_l / jnp.maximum(dist * dist, 1e-20)
    direct = (ls.emission * _brdf_diffuse(albedo, cos_s)
              * (geom / jnp.maximum(ls.pdf, 1e-20))[:, None]
              * vis_w[:, None])
    use = alive & ls.valid
    radiance = radiance + jnp.where(use[:, None], throughput * direct, 0.0)

    # --- Indirect: RR then uniform hemisphere (Renderer.cpp:191-208).
    us = rng.uniforms4(seed, pixel, sample, bounce, rng.SCATTER)
    survive = us[2] < cfg.rr_survival
    wi = vec.hemisphere_surface_from(n, us[0], us[1])
    cos_i = jnp.sum(wi * n, -1)
    pdf = 1.0 / (2.0 * jnp.pi)  # WhittedMaterial.h:44-56
    weight = (_brdf_diffuse(albedo, cos_i) * cos_i[:, None]
              / pdf / cfg.rr_survival)
    continues = alive & survive
    throughput = jnp.where(continues[:, None], throughput * weight, throughput)
    o = jnp.where(continues[:, None], p, o)
    d = jnp.where(continues[:, None], wi, d)
    out = (radiance, o, d, throughput, continues, n_main, n_shadow)
    if with_record:
        if visible is None:  # soft-shadow mode records no meaningful bit
            visible = jnp.ones(alive.shape, bool)
        out = out + (BounceRecord(prim=hit.prim, is_triangle=hit.is_triangle,
                                  hit=hit.hit, visible=visible),)
    return out


def trace(scene: Scene, origin, direction, cfg: RenderConfig, *,
          seed, pixel, sample, count_rays: bool = False,
          intersect_fn=None, nearest_t_fn=None, soft_vis_fn=None,
          first_hit=None, record: BounceRecord | None = None,
          return_record: bool = False):
    """Path radiance for a batch of primary rays, (R, 3).

    seed: uint32 scalar; pixel: (R,) absolute pixel index (the RNG counter);
    sample: scalar sample index.  ``count_rays``: also return the number of
    rays actually traced (primary + shadow + indirect) for the rays/s metric.
    ``first_hit``: an already-computed ``intersect.Hit`` for these exact
    primary rays — callers that need the primary hit anyway (the Denoiser's
    G-buffer, ``Denoiser/.../Renderer.cpp:287-311`` fills both in one cast)
    pass it to skip the duplicate bounce-0 scene intersection; results are
    bit-identical because the intersector is deterministic.

    This is the *scan* engine — a fixed-depth ``lax.scan`` over the bounce
    index, fully reverse-differentiable (the gradient tests and the inverse-
    rendering path go through here).  The forward-only ``render_wavefront``
    engine traces the same paths with much higher lane utilization.

    ``return_record``: also return the stacked per-bounce
    :class:`BounceRecord` trace, (max_depth, R) leaves.  ``record``: replay
    the bounces from such a trace instead of intersecting the scene — see
    ``render_replay`` for why.  Both require hard shadows and no
    ``first_hit`` peel.
    """
    if record is not None or return_record:
        assert first_hit is None, "record/replay does not compose with the " \
            "first_hit peel (the Denoiser G-buffer path)"
        assert cfg.soft_shadow_beta == 0.0, \
            "record/replay requires hard shadows (binary visibility bit)"
    r = origin.shape[0]

    def body(state, xs, bounce_intersect_fn=intersect_fn):
        bounce, rec_in = xs
        o, d, throughput, radiance, alive, nrays = state
        delta, o, d, throughput, alive, n_main, n_shadow, rec = _bounce_step(
            scene, cfg, seed=seed, pixel=pixel, sample=sample, bounce=bounce,
            o=o, d=d, throughput=throughput, alive=alive,
            intersect_fn=bounce_intersect_fn, nearest_t_fn=nearest_t_fn,
            soft_vis_fn=soft_vis_fn, replay_rec=rec_in, with_record=True)
        return (o, d, throughput, radiance + delta, alive,
                nrays + n_main + n_shadow), (rec if return_record else None)

    state = (origin, direction,
             jnp.ones((r, 3), origin.dtype), jnp.zeros((r, 3), origin.dtype),
             jnp.ones((r,), bool), jnp.zeros((), jnp.int32))
    start = 0
    if first_hit is not None:
        # Peel bounce 0 out of the scan, substituting the precomputed hit.
        state, _ = body(state, (0, None),
                        bounce_intersect_fn=lambda *_args: first_hit)
        start = 1
    (_, _, _, radiance, _, nrays), recs = jax.lax.scan(
        body, state, (jnp.arange(start, cfg.max_depth), record))
    out = (radiance,)
    if count_rays:
        out = out + (nrays,)
    if return_record:
        out = out + (recs,)
    return out if len(out) > 1 else radiance


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
           key: jax.Array, *, intersect_fn=None, nearest_t_fn=None,
           soft_vis_fn=None) -> jax.Array:
    """Mean linear radiance, (H, W, 3).  The SPP loop mirrors the reference's
    progressive accumulation (one jittered frame per accumulated sample,
    Renderer.cpp:91-134 + Camera.cpp:121) as a scan over the sample index.

    ``intersect_fn``/``nearest_t_fn`` swap in an accelerated intersector
    (``models.mesh.make_intersect_fn``) — the reference's MC stage is
    BVH-backed for every ray including shadows (Renderer.cpp:41, 183-184)."""
    acc, _ = render_progressive(scene, camera, cfg, key,
                                jnp.zeros((cfg.height, cfg.width, 3),
                                          jnp.float32), 0,
                                intersect_fn=intersect_fn,
                                nearest_t_fn=nearest_t_fn,
                                soft_vis_fn=soft_vis_fn)
    return acc / cfg.spp


def render_progressive(scene: Scene, camera, cfg: RenderConfig, key,
                       accum, start_sample, *, intersect_fn=None,
                       nearest_t_fn=None, soft_vis_fn=None):
    """Accumulate ``cfg.spp`` more samples on top of ``accum`` (sample indices
    ``start_sample..start_sample+spp``).  The (accum, next_index) pair is the
    checkpointable progressive-rendering state — the reference's
    ``temporal_accumulation_frame_data`` + ``frame_accumulating`` counter
    (Renderer.cpp:58-60, 129-134) lifted out of the renderer."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)

    def one_sample(acc, s):
        o, d, pixel = _primary_rays(camera, cfg, seed, s)
        rad = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=s,
                    intersect_fn=intersect_fn, nearest_t_fn=nearest_t_fn,
                    soft_vis_fn=soft_vis_fn)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one_sample, accum,
                          start_sample + jnp.arange(cfg.spp))
    return acc, start_sample + cfg.spp


def render_replay(scene: Scene, camera, cfg: RenderConfig, key, *,
                  intersect_fn=None, nearest_t_fn=None) -> jax.Array:
    """``render`` with an O(R·depth) gradient graph — the inverse-rendering
    fast path ("record the traversal, differentiate the replay").

    The standard differentiable engine pays the (R, N) scene-intersection
    producers in BOTH directions: the winner t is the min of the t-matrix, so
    reverse AD scatters cotangents back through the full producer at every
    bounce (measured 3.6x a forward render for grad on the v5e, PERF.md
    §6.5).  But the estimator's gradient only ever touches the *winner*:
    this engine therefore

    1. runs a stop-gradient INDEX PASS that records each bounce's discrete
       outcome (:class:`BounceRecord`: winner primitive + hit + hard-shadow
       visibility bits, 7 B/lane/bounce) — any intersector works here, so
       mesh scenes can record through the accelerated BVH/packet routes
       while the differentiable part stays brute-free;
    2. REPLAYS the estimator differentiably from the trace: every hit is
       reconstructed from its recorded winner by bit-exact per-lane
       arithmetic twins (``ops.intersect.hit_from_record``), all randomness
       is regenerated from the counter-based RNG, and the shadow bit is
       substituted directly (its live form is boolean — gradient-free).

    The image is bit-identical to ``render`` on TPU (asserted in
    ``tests/test_replay.py``; XLA:CPU contracts the two programs' shading
    fmas differently, leaving last-ulp drift) and the gradients are EQUAL,
    not approximate:
    the standard path's min/argmin VJP routes each lane's cotangent to
    exactly the winner entry — the same function of the same winner data the
    replay differentiates.  Like the standard detached-traversal gradients
    (and the reference, which has no gradients at all), silhouette/visibility
    discontinuities are not differentiated; ``soft_shadow_beta`` covers those
    and is guarded off here.

    Reference parity: the forward estimator is Renderer.cpp:136-214 exactly
    (Monte Carlo Path Tracer); the replay architecture has no reference
    counterpart — it exists so inverse rendering runs at engine speed.
    """
    recs = record_trace(scene, camera, cfg, key,
                        intersect_fn=intersect_fn, nearest_t_fn=nearest_t_fn)
    return render_from_trace(scene, camera, cfg, key, recs)


def record_trace(scene: Scene, camera, cfg: RenderConfig, key, *,
                 intersect_fn=None, nearest_t_fn=None) -> BounceRecord:
    """The stop-gradient INDEX PASS of ``render_replay``: the stacked
    (spp, max_depth, R) :class:`BounceRecord` trace of every bounce.

    Exposed separately because the trace is a function of the *discrete*
    scene only: a material/emission-stage inverse loop records once and
    replays every optimizer step (the trace is invariant under albedo and
    emission updates — PERF.md §6.5 measures the step savings); geometry
    stages re-record when the geometry moves.
    """
    seed = rng.seed_from_key(key)
    scene_sg = jax.lax.stop_gradient(scene)

    def one_sample(_, s):
        o, d, pixel = _primary_rays(camera, cfg, seed, s)
        o_sg, d_sg = jax.lax.stop_gradient((o, d))
        _, rec = trace(scene_sg, o_sg, d_sg, cfg, seed=seed, pixel=pixel,
                       sample=s, return_record=True,
                       intersect_fn=intersect_fn, nearest_t_fn=nearest_t_fn)
        return 0, rec

    _, recs = jax.lax.scan(one_sample, 0, jnp.arange(cfg.spp))
    return jax.lax.stop_gradient(recs)


def render_from_trace(scene: Scene, camera, cfg: RenderConfig, key,
                      recs: BounceRecord) -> jax.Array:
    """The differentiable REPLAY of ``render_replay`` from a recorded trace.

    The per-sample body is rematerialized (``jax.checkpoint``): the replay's
    recompute is O(R) per bounce, so trading the backward pass's residual
    HBM traffic for recompute is a measured ~2x on the grad step (PERF.md
    §6.5) — the remat that would NOT pay on the standard engine, whose
    recompute re-runs the (R, N) producers.
    """
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)

    @jax.checkpoint
    def one_sample(acc, xs):
        s, rec = xs
        o, d, pixel = _primary_rays(camera, cfg, seed, s)
        rad = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=s,
                    record=rec)
        return acc + rad.reshape(h, w, 3), None

    acc, _ = jax.lax.scan(one_sample, jnp.zeros((h, w, 3), jnp.float32),
                          (jnp.arange(cfg.spp), recs))
    return acc / cfg.spp


def render_wavefront(scene: Scene, camera, cfg: RenderConfig, key,
                     accum, start_sample, *, return_rays: bool = False):
    """Wavefront / path-regeneration engine: same estimator, ~3x throughput.

    The scan engine burns a full scene intersection on every lane at every one
    of the ``max_depth`` bounce steps, but with RR survival p the expected
    path length is only ~1/(1-p) (+1) bounces — most lanes are dead mask
    ballast (utilization = E[len]/max_depth ~ 31% at p=0.8, depth 16).

    Here each lane is a *persistent worker* for its pixel: the moment its
    path terminates (miss / emissive hit / RR death / depth cap) it
    immediately regenerates the primary ray of its pixel's NEXT sample, so
    every intersection pass runs ~full.  A ``lax.while_loop`` steps until all
    lanes have finished their ``cfg.spp`` samples (worst case spp*max_depth
    steps, typical ~spp*(E[len]+1)).

    Because the RNG is a pure hash of (pixel, sample, bounce, stream), this
    traces bit-identical paths to the scan engine — results differ only by
    floating-point summation order.  Forward-only (while_loop is not
    reverse-differentiable): gradients go through ``render``/``trace``.

    Returns ``(accum', next_sample)`` like ``render_progressive``; with
    ``return_rays`` also the honest traced-ray count (for rays/s).
    """
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    n_lanes = h * w
    pixel = jnp.arange(n_lanes, dtype=jnp.uint32)
    end = jnp.int32(start_sample + cfg.spp)

    def primary(sample_vec):
        uj = rng.uniforms4(seed, pixel, sample_vec, 0, rng.JITTER)
        d = cam_mod.perspective_ray_at(camera, w, h, pixel, uj[0], uj[1])
        o = jnp.broadcast_to(camera.position, d.shape)
        return o, d

    s0 = jnp.full((n_lanes,), start_sample, jnp.int32)
    o0, d0 = primary(s0)
    state = (s0, jnp.zeros((n_lanes,), jnp.int32), o0, d0,
             jnp.ones((n_lanes, 3), jnp.float32),
             jnp.zeros((n_lanes, 3), jnp.float32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    max_steps = cfg.spp * cfg.max_depth

    def cond(state):
        s, _, _, _, _, _, _, step = state
        return jnp.any(s < end) & (step < max_steps)

    def body(state):
        s, b, o, d, tp, acc, nrays, step = state
        alive = s < end
        delta, o2, d2, tp2, continues, n_main, n_shadow = _bounce_step(
            scene, cfg, seed=seed, pixel=pixel, sample=s, bounce=b,
            o=o, d=d, throughput=tp, alive=alive)
        acc = acc + delta
        nrays = nrays + n_main + n_shadow  # i32: fine below ~2^31 rays/call
        # Path survives into the next bounce only below the depth cap (the
        # scan engine's truncation at cfg.max_depth, same residual mass).
        cont = continues & (b + 1 < cfg.max_depth)
        s_next = jnp.where(alive & ~cont, s + 1, s)   # path done -> next sample
        b_next = jnp.where(cont, b + 1, 0)
        po, pd = primary(s_next)                       # regenerated primaries
        o3 = jnp.where(cont[:, None], o2, po)
        d3 = jnp.where(cont[:, None], d2, pd)
        tp3 = jnp.where(cont[:, None], tp2, 1.0)
        return (s_next, b_next, o3, d3, tp3, acc, nrays, step + 1)

    (_, _, _, _, _, acc, nrays, _) = jax.lax.while_loop(cond, body, state)
    out = accum + acc.reshape(h, w, 3)
    if return_rays:
        return out, start_sample + cfg.spp, nrays
    return out, start_sample + cfg.spp


def render_fast(scene: Scene, camera, cfg: RenderConfig, key) -> jax.Array:
    """Mean linear radiance via the wavefront engine (forward-only)."""
    acc, _ = render_wavefront(scene, camera, cfg, key,
                              jnp.zeros((cfg.height, cfg.width, 3),
                                        jnp.float32), 0)
    return acc / cfg.spp


# --- Persistent wavefront stepper: the peak-throughput progressive engine. ---
#
# ``render_wavefront`` above is *equal-spp*: it loops until every lane has
# finished exactly cfg.spp samples.  With 800k lanes and a geometric path-
# length tail (P[len >= 16] = 0.8^15 ~ 3.5% at RR 0.8) the max over lanes is
# essentially the worst case, so the while_loop runs ~spp*max_depth steps and
# the regeneration gains vanish (measured: ~1.0x).
#
# The stepper instead runs a FIXED number of full-width steps and carries the
# in-flight path state across calls — no tail, ~100% lane utilization, ~4x
# the scan engine's throughput.  Each pixel's estimate is the mean over its
# *completed* samples (equal-time progressive rendering); the one in-flight
# partial path per lane is excluded, a bias that decays as O(1/n_done) and is
# standard for progressive viewers.  For strict equal-spp semantics (goldens,
# gradients) use ``render``/``render_wavefront``.

@_pytree
class WavefrontState:
    """Carryable lane state of the persistent wavefront integrator."""

    s: jax.Array        # (R,) i32 current sample index per lane
    b: jax.Array        # (R,) i32 current bounce of the in-flight path
    o: jax.Array        # (R, 3) ray origin
    d: jax.Array        # (R, 3) ray direction
    tp: jax.Array       # (R, 3) path throughput
    cur: jax.Array      # (R, 3) partial radiance of the in-flight path
    acc: jax.Array      # (R, 3) summed radiance of completed samples
    n_done: jax.Array   # (R,) i32 completed samples per lane
    nrays: jax.Array    # () i32 honest traced-ray counter


def wavefront_init(scene: Scene, camera, cfg: RenderConfig, key,
                   pixel_offset=0, n_lanes: int | None = None
                   ) -> WavefrontState:
    """Fresh lane state: every lane on its pixel's sample 0 primary ray.

    ``pixel_offset``/``n_lanes`` select a row-major slab of the image's
    lanes — the device-local body of the *sharded* stepper.  ``pixel_offset``
    may be traced (``axis_index * lanes_per_device`` inside ``shard_map``);
    because the RNG counter is the absolute pixel index, slab lane states
    compose into exactly the unsharded state.
    """
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    if n_lanes is None:
        n_lanes = h * w
    pixel = (jnp.arange(n_lanes, dtype=jnp.uint32)
             + jnp.asarray(pixel_offset, jnp.uint32))
    s0 = jnp.zeros((n_lanes,), jnp.int32)
    uj = rng.uniforms4(seed, pixel, s0, 0, rng.JITTER)
    d = cam_mod.perspective_ray_at(camera, w, h, pixel, uj[0], uj[1])
    o = jnp.broadcast_to(camera.position, d.shape)
    z3 = jnp.zeros((n_lanes, 3), jnp.float32)
    return WavefrontState(s=s0, b=jnp.zeros((n_lanes,), jnp.int32), o=o, d=d,
                          tp=jnp.ones((n_lanes, 3), jnp.float32), cur=z3,
                          acc=z3, n_done=jnp.zeros((n_lanes,), jnp.int32),
                          nrays=jnp.zeros((), jnp.int32))


def wavefront_steps(scene: Scene, camera, cfg: RenderConfig, key,
                    state: WavefrontState, n_steps: int,
                    intersect_fn=None, nearest_t_fn=None,
                    pixel_offset=0) -> WavefrontState:
    """Advance every lane by ``n_steps`` bounce steps (jit-friendly scan).

    ``pixel_offset``: absolute index of the state's first lane (see
    ``wavefront_init``) — lets ``shard_map`` step per-device slab states."""
    h, w = cfg.height, cfg.width
    seed = rng.seed_from_key(key)
    n_lanes = state.s.shape[0]
    pixel = (jnp.arange(n_lanes, dtype=jnp.uint32)
             + jnp.asarray(pixel_offset, jnp.uint32))
    alive = jnp.ones((n_lanes,), bool)

    def step(st: WavefrontState, _):
        delta, o2, d2, tp2, continues, n_main, n_shadow = _bounce_step(
            scene, cfg, seed=seed, pixel=pixel, sample=st.s, bounce=st.b,
            o=st.o, d=st.d, throughput=st.tp, alive=alive,
            intersect_fn=intersect_fn, nearest_t_fn=nearest_t_fn)
        cur = st.cur + delta
        cont = continues & (st.b + 1 < cfg.max_depth)
        done = ~cont
        acc = st.acc + jnp.where(done[:, None], cur, 0.0)
        n_done = st.n_done + done
        s_next = st.s + done
        uj = rng.uniforms4(seed, pixel, s_next, 0, rng.JITTER)
        pd = cam_mod.perspective_ray_at(camera, w, h, pixel, uj[0], uj[1])
        po = jnp.broadcast_to(camera.position, pd.shape)
        return WavefrontState(
            s=s_next, b=jnp.where(cont, st.b + 1, 0),
            o=jnp.where(cont[:, None], o2, po),
            d=jnp.where(cont[:, None], d2, pd),
            tp=jnp.where(cont[:, None], tp2, 1.0),
            cur=jnp.where(done[:, None], 0.0, cur), acc=acc, n_done=n_done,
            nrays=st.nrays + n_main + n_shadow), None

    state, _ = jax.lax.scan(step, state, None, length=n_steps)
    return state


def wavefront_image(state: WavefrontState, cfg: RenderConfig) -> jax.Array:
    """Mean linear radiance over each pixel's completed samples, (H, W, 3)."""
    n = jnp.maximum(state.n_done, 1).astype(jnp.float32)
    return (state.acc / n[:, None]).reshape(cfg.height, cfg.width, 3)


def render_turbo(scene: Scene, camera, cfg: RenderConfig, key,
                 min_spp: int | None = None) -> jax.Array:
    """Mean linear radiance via the FUSED Pallas persistent-wavefront kernel
    (``ops.fused`` — the peak-throughput engine, ~3.3x the XLA stepper on
    v5e).  Equal-*time* progressive semantics: steps until every pixel has
    completed at least ``min_spp`` (default ``cfg.spp``) samples, then
    averages each pixel's completed samples.  Caveats (advisor r3): because
    the stop rule couples each pixel's completed-sample count to its sampled
    path lengths, the per-pixel mean carries a small stopping-time bias
    relative to the reference's fixed-spp estimator (negligible at showcase
    SPP, and vanishing as min_spp grows), and the per-pixel counts depend on
    how many whole step-chunks ran — so the same seed/config can produce
    slightly different images on TPU vs CPU.  For the exact fixed-spp
    estimator use ``render``/``render_wavefront``.  Forward-only."""
    from cpu_based_ray_tracer_tpu.ops import fused

    target = cfg.spp if min_spp is None else min_spp
    fs = fused.pack_scene(scene)
    state = wavefront_init(scene, camera, cfg, key)
    # Expected steps per sample ~ E[path len] + 1; run in chunks and check.
    chunk = max(32, cfg.max_depth)
    stepper = jax.jit(lambda st: fused.wavefront_steps_fused(
        fs, camera, cfg, key, st, chunk))
    for _ in range(target * cfg.max_depth):
        state = stepper(state)
        if int(jnp.min(state.n_done)) >= target:
            break
    return wavefront_image(state, cfg)


def render_turbo_exact(scene: Scene, camera, cfg: RenderConfig, key
                       ) -> jax.Array:
    """Mean linear radiance via the fused kernel in EQUAL-SPP mode
    (``stop_after=cfg.spp``): every pixel completes exactly ``cfg.spp``
    samples and then idles, so this is the reference's fixed-spp estimator
    bit-compatible with ``render``/``render_wavefront`` (same pcg4d
    streams) — none of ``render_turbo``'s stopping-time bias, at fused-
    kernel speed (utilization decays only over the final tail chunk).
    Forward-only."""
    from cpu_based_ray_tracer_tpu.ops import fused

    fs = fused.pack_scene(scene)
    state = wavefront_init(scene, camera, cfg, key)
    # Chunk doubling: each host poll costs a device round-trip (~50 ms on
    # the tunneled chip) — grow the chunk geometrically, O(log) polls.
    chunk = max(32, cfg.max_depth)
    for _ in range(cfg.spp * cfg.max_depth):
        state = fused.wavefront_steps_fused(fs, camera, cfg, key, state,
                                            chunk, stop_after=cfg.spp)
        if int(jnp.min(state.n_done)) >= cfg.spp:
            break
        chunk = min(2 * chunk, 4096)
    return (state.acc / cfg.spp).reshape(cfg.height, cfg.width, 3)


def count_rays(scene: Scene, camera, cfg: RenderConfig, key) -> jax.Array:
    """Total rays traced for one sample pass (for the rays/s benchmark)."""
    seed = rng.seed_from_key(key)
    o, d, pixel = _primary_rays(camera, cfg, seed, 0)
    _, n = trace(scene, o, d, cfg, seed=seed, pixel=pixel, sample=0,
                 count_rays=True)
    return n

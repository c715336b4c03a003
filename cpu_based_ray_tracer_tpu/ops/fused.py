"""Fused persistent-wavefront Monte Carlo bounce kernel (Pallas, TPU).

The XLA wavefront stepper (``models.monte_carlo.wavefront_steps``) is
semantically right but leaves ~5x on the table: every bounce step XLA
materializes (R, N) intersection intermediates and the 60-byte-per-lane path
state round-trips HBM between fused loops.  Measured r3 on the v5e chip:
3.0 ms per 800k-lane bounce step vs a ~0.6 ms VPU flop bound (see PERF.md).

This kernel is the TPU-native answer: **one Pallas program advances a tile of
lanes through ALL ``n_steps`` bounces with the path state resident in VMEM**.
Per (SUB, 128) lane tile it runs, per step:

  main intersect (unrolled Möller-Trumbore over the scene's triangles +
  spheres, per-primitive constants broadcast from SMEM)
  -> emissive/sky termination -> area-light sample (pcg4d RNG + area-CDF
  choice in-kernel) -> NEE shadow ray (second unrolled min-t pass)
  -> Lambertian NEE contribution -> RR + uniform-hemisphere scatter
  -> dead-path regeneration (in-kernel camera ray gen for the next sample).

HBM traffic per kernel call is one read + one write of the lane state — the
32-step call moves ~0.12 MB per 1k lanes instead of ~6 MB, and every
arithmetic op runs from VMEM/registers at VPU rate.

Semantics are lane-for-lane those of ``monte_carlo._bounce_step`` (the same
pcg4d streams, the same estimator, the same masking) — the parity test
``tests/test_fused.py`` drives both engines over the same key and asserts the
per-lane sample counters match exactly and the accumulated radiance matches
to fp-reassociation tolerance.  Reference semantics mirrored from
``Monte Carlo Path Tracer/8599RayTracerGUI/src/Renderer.cpp:136-214`` (see
models/monte_carlo.py for the line-by-line map).

Scope: brute-force scenes (every triangle/sphere tested per lane — the
reference's own MC stage is a 32-triangle Cornell box).  Triangle/sphere
loops are unrolled at trace time, so keep N below a few hundred; large
meshes belong to the packet/BVH path (``ops.packet``).  Forward-only
(gradients go through the differentiable scan engine).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.scene import Scene
from cpu_based_ray_tracer_tpu.utils import rng as rng_mod

_DET_EPS = 1e-12
NO_HIT = float(np.finfo(np.float32).max)
SUB = 32                   # sublane rows per lane tile: 32*128 = 4096 lanes
                           # (swept on-chip r3: 32 beats 64/128 by ~3-15%)
LANES_PER_TILE = SUB * 128


class FusedScene(NamedTuple):
    """Kernel-ready pack of a (small) scene.  Built OUTSIDE jit by
    ``pack_scene`` — the emissive-triangle subset must be static."""

    tri: jax.Array     # (N, 20) f32: v0 e1 e2 normal albedo emission emissive pad
    sph: jax.Array     # (S, 16) f32: center radius albedo emission emissive pad*
    light: jax.Array   # (Le, 16) f32: v0 e1 e2 normal emission cdf
    sky: jax.Array     # (8,) f32: sky_bottom(3) sky_top(3) light_total pad
    n_tri: int
    n_sph: int
    n_light: int


def pack_scene(scene: Scene) -> FusedScene:
    """Flatten scene + material tables into per-primitive SMEM rows.

    Host-side (numpy): the emissive subset's size is baked into the kernel's
    unrolled light-choice loop.  The light CDF is the cumsum of emissive-
    triangle areas in triangle order — identical (fp-exact) to the full-N
    masked cumsum of ``ops.sampling.sample_area_light`` because non-emissive
    entries contribute exact zeros.
    """
    tr, sp, mats = scene.triangles, scene.spheres, scene.materials
    v0 = np.asarray(tr.v0); e1 = np.asarray(tr.e1); e2 = np.asarray(tr.e2)
    nrm = np.asarray(tr.normal)
    tmat = np.asarray(tr.material)
    alb = np.asarray(mats.albedo)[tmat]
    emi = np.asarray(mats.emission)[tmat]
    emf = (np.linalg.norm(np.asarray(mats.emission), axis=-1)
           > 1e-5)[tmat].astype(np.float32)
    n = v0.shape[0]
    tri = np.zeros((n, 20), np.float32)
    tri[:, 0:3] = v0; tri[:, 3:6] = e1; tri[:, 6:9] = e2
    tri[:, 9:12] = nrm; tri[:, 12:15] = alb; tri[:, 15:18] = emi
    tri[:, 18] = emf

    c = np.asarray(sp.center); r = np.asarray(sp.radius)
    smat = np.asarray(sp.material)
    # Zero-radius spheres are the never-hit placeholders of empty scenes
    # (scene.empty_spheres) — the XLA path tests and rejects them every
    # bounce; here they are dropped at pack time (identical results, two
    # fewer quadratic passes per lane-step on Cornell).
    live = r != 0.0
    c, r, smat = c[live], r[live], smat[live]
    s = c.shape[0]
    # n_sph=0 skips the kernel's sphere loops entirely, but the SMEM block
    # spec still needs a non-empty array — keep one ignored zero row.
    sph = np.zeros((max(s, 1), 16), np.float32)
    sph[:s, 0:3] = c; sph[:s, 3] = r
    sph[:s, 4:7] = np.asarray(mats.albedo)[smat]
    sph[:s, 7:10] = np.asarray(mats.emission)[smat]
    sph[:s, 10] = (np.linalg.norm(np.asarray(mats.emission), axis=-1)
                   > 1e-5)[smat].astype(np.float32)

    # Emissive subset in triangle order; areas in f32 exactly as
    # Triangles.area computes them (0.5 * |e1 x e2| in f32).
    area = 0.5 * np.linalg.norm(
        np.cross(e1.astype(np.float32), e2.astype(np.float32)), axis=-1
    ).astype(np.float32)
    lidx = np.flatnonzero(emf > 0.5)
    if len(lidx) == 0:
        lidx = np.array([0])
        light_total = np.float32(0.0)
        cdf = np.zeros((1,), np.float32)
    else:
        masked = np.where(emf > 0.5, area, np.float32(0.0)).astype(np.float32)
        cdf_full = np.cumsum(masked, dtype=np.float32)
        cdf = cdf_full[lidx].astype(np.float32)
        light_total = cdf_full[-1]
    le = len(lidx)
    light = np.zeros((le, 16), np.float32)
    light[:, 0:3] = v0[lidx]; light[:, 3:6] = e1[lidx]
    light[:, 6:9] = e2[lidx]; light[:, 9:12] = nrm[lidx]
    light[:, 12:15] = emi[lidx]
    light[:, 15] = cdf

    sky = np.zeros((8,), np.float32)
    sky[0:3] = np.asarray(scene.sky_bottom)
    sky[3:6] = np.asarray(scene.sky_top)
    sky[6] = light_total
    return FusedScene(tri=jnp.asarray(tri), sph=jnp.asarray(sph),
                      light=jnp.asarray(light), sky=jnp.asarray(sky),
                      n_tri=n, n_sph=s, n_light=le)


def _camera_words(camera: cam_mod.PerspectiveCamera) -> jax.Array:
    """(16,) f32: position(3) right(3) true_up(3) forward(3) tan_half pad."""
    right, true_up, fwd = cam_mod.camera_basis(camera)
    t = jnp.tan(jnp.radians(camera.vfov_degrees) / 2.0)
    return jnp.concatenate([
        camera.position, right, true_up, fwd, t[None],
        jnp.zeros((3,), jnp.float32)]).astype(jnp.float32)


# --- in-kernel helpers (plane = (SUB, 128) array) ---------------------------

def _pcg4d(a, b, c, d):
    """pcg4d on uint32 planes — bit-identical to utils.rng.pcg4d."""
    u = jnp.uint32
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


def _unit(x):
    # Mosaic has no u32 -> f32 cast; the top-24-bit value fits int32 exactly,
    # so int32 -> f32 produces the same float as utils.rng._to_unit_float.
    y = (x >> jnp.uint32(8)).astype(jnp.int32)
    return y.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _uniforms4(seed, pixel, sample, bounce, stream: int):
    """utils.rng.uniforms4 on planes: sample/bounce i32 planes, seed scalar."""
    ctr = (bounce.astype(jnp.uint32) * jnp.uint32(rng_mod.N_STREAMS)
           + jnp.uint32(stream))
    a, b, c, d = _pcg4d(pixel, sample.astype(jnp.uint32), ctr,
                        jnp.broadcast_to(seed.astype(jnp.uint32), pixel.shape))
    return _unit(a), _unit(b), _unit(c), _unit(d)


def _norm3(x, y, z, floor=1e-24):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, floor))
    return x * inv, y * inv, z * inv


def _kernel(seed_ref, cam_ref, tri_ref, sph_ref, light_ref, sky_ref,
            pix_ref, pxy_ref, sf_ref, si_ref, sf_out, si_out, *gb_out, 
            n_tri: int, n_sph: int, n_light: int, n_steps: int,
            width: int, height: int, n_pix: int, t_min: float,
            eps_offset: float, rr_survival: float, shadow_tol: float,
            max_depth: int, single_path: bool = False,
            stop_after: int = 0):
    f32 = jnp.float32
    seed = seed_ref[0, 0]
    # Hoisted SMEM scalars (SSA values shared by every step).
    TRI = [[tri_ref[n, k] for k in range(19)] for n in range(n_tri)]
    SPH = [[sph_ref[m, k] for k in range(11)] for m in range(n_sph)]
    LGT = [[light_ref[e, k] for k in range(16)] for e in range(n_light)]
    px_, py_, pz_ = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    rx_, ry_, rz_ = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
    ux_, uy_, uz_ = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
    fx_, fy_, fz_ = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
    tan_half = cam_ref[0, 12]
    skyb = (sky_ref[0, 0], sky_ref[0, 1], sky_ref[0, 2])
    skyt = (sky_ref[0, 3], sky_ref[0, 4], sky_ref[0, 5])
    light_total = sky_ref[0, 6]
    inv_light_pdf_valid = light_total > 0.0       # scalar bool
    light_pdf = jnp.where(inv_light_pdf_valid,
                          1.0 / jnp.maximum(light_total, 1e-20), 0.0)
    aspect = float(width) / float(height)

    pix = pix_ref[0]                                   # (SUB, 128) u32
    valid = pix < jnp.uint32(n_pix)
    pxf = pxy_ref[0]                                   # (SUB, 128) f32 x coord
    pyf = pxy_ref[1]                                   # (SUB, 128) f32 y coord

    def cam_ray(jx, jy):
        """perspective_ray_at, same fp-op order as camera.py:167-185."""
        ndc_x = (pxf + jx) / f32(width) * 2.0 - 1.0
        ndc_y = -((pyf + jy) / f32(height) * 2.0 - 1.0)
        ta = tan_half * f32(aspect)
        a = ndc_x * ta
        b = ndc_y * tan_half
        dx = a * rx_ + b * ux_ + fx_
        dy = a * ry_ + b * uy_ + fy_
        dz = a * rz_ + b * uz_ + fz_
        return _norm3(dx, dy, dz)

    def step(step_i, carry):
        (s, bb, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
         cux, cuy, cuz, axp, ayp, azp, nd, nsh) = carry
        # Equal-spp mode (stop_after > 0): a lane that has completed its
        # quota goes idle instead of regenerating, so every pixel gets
        # EXACTLY stop_after samples of its (pixel, s) streams — the scan
        # engine's fixed-spp estimator at fused-kernel speed (single_path
        # additionally emits the G-buffer and pins s, the Denoiser frame).
        gated = single_path or stop_after > 0
        quota = 1 if single_path else stop_after
        armed = (nd < quota) if gated else None
        alive0 = (valid & armed) if gated else valid

        # --- main intersect: unrolled MT over triangles (+ spheres) -------
        # (An NCHAIN-interleaved winner-chain + associative one-hot attr
        # variant measured ~9% SLOWER on-chip — Mosaic schedules the single
        # select chain fine; the straight loop stays.)
        best_t = jnp.full(ox.shape, f32(NO_HIT))
        bnx = jnp.zeros_like(ox); bny = jnp.zeros_like(ox)
        bnz = jnp.zeros_like(ox)
        bal = [jnp.zeros_like(ox) for _ in range(3)]
        bem = [jnp.zeros_like(ox) for _ in range(3)]
        bef = jnp.zeros_like(ox)
        bpid = jnp.zeros_like(ox)      # winner id (models.denoiser
        # global_prim_id semantics: triangle n -> n+1, live sphere m ->
        # n_tri+m+1, miss -> -1); dead code unless single_path.
        for n in range(n_tri):
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             nx, ny, nz, ar, ag, ab, er, eg, eb, ef) = TRI[n]
            s1x = dy * e2z - dz * e2y
            s1y = dz * e2x - dx * e2z
            s1z = dx * e2y - dy * e2x
            det = s1x * e1x + s1y * e1y + s1z * e1z
            okd = jnp.abs(det) > _DET_EPS
            inv = 1.0 / jnp.where(okd, det, f32(1.0))
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            t = (s2x * e2x + s2y * e2y + s2z * e2z) * inv
            b1 = (s1x * sx + s1y * sy + s1z * sz) * inv
            b2 = (s2x * dx + s2y * dy + s2z * dz) * inv
            ok = (okd & (t > t_min) & (b1 >= 0.0) & (b2 >= 0.0)
                  & (1.0 - b1 - b2 >= 0.0) & (t < best_t))
            best_t = jnp.where(ok, t, best_t)
            bnx = jnp.where(ok, nx, bnx)
            bny = jnp.where(ok, ny, bny)
            bnz = jnp.where(ok, nz, bnz)
            bal[0] = jnp.where(ok, ar, bal[0])
            bal[1] = jnp.where(ok, ag, bal[1])
            bal[2] = jnp.where(ok, ab, bal[2])
            bem[0] = jnp.where(ok, er, bem[0])
            bem[1] = jnp.where(ok, eg, bem[1])
            bem[2] = jnp.where(ok, eb, bem[2])
            bef = jnp.where(ok, ef, bef)
            if single_path:
                bpid = jnp.where(ok, f32(n + 1), bpid)
        for m in range(n_sph):
            (cx, cy, cz, rad, ar, ag, ab, er, eg, eb, ef) = SPH[m]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            a_q = dx * dx + dy * dy + dz * dz
            hb = ocx * dx + ocy * dy + ocz * dz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = hb * hb - a_q * c_q
            okq = disc > 0.0
            sq = jnp.sqrt(jnp.where(okq, disc, f32(1.0)))
            t_near = (-hb - sq) / a_q
            t_far = (-hb + sq) / a_q
            near_ok = okq & (t_near > t_min)
            far_ok = okq & (t_far > t_min)
            ts = jnp.where(near_ok, t_near,
                           jnp.where(far_ok, t_far, f32(NO_HIT)))
            ok = ts < best_t
            # Sphere geometric normal (p - c)/radius: sign of radius flips
            # it (the hollow-bubble trick, Dielectric.h:36-42).
            inv_r = 1.0 / jnp.where(rad == 0.0, f32(1.0), rad)
            hpx = ox + ts * dx
            hpy = oy + ts * dy
            hpz = oz + ts * dz
            best_t = jnp.where(ok, ts, best_t)
            bnx = jnp.where(ok, (hpx - cx) * inv_r, bnx)
            bny = jnp.where(ok, (hpy - cy) * inv_r, bny)
            bnz = jnp.where(ok, (hpz - cz) * inv_r, bnz)
            bal[0] = jnp.where(ok, ar, bal[0])
            bal[1] = jnp.where(ok, ag, bal[1])
            bal[2] = jnp.where(ok, ab, bal[2])
            bem[0] = jnp.where(ok, er, bem[0])
            bem[1] = jnp.where(ok, eg, bem[1])
            bem[2] = jnp.where(ok, eb, bem[2])
            bef = jnp.where(ok, ef, bef)
            if single_path:
                bpid = jnp.where(ok, f32(n_tri + m + 1), bpid)

        hit = best_t < f32(NO_HIT)
        hit_emissive = hit & (bef > 0.5)
        is_primary = bb == 0

        # Primary miss -> sky; primary emissive hit -> emission
        # (Renderer.cpp:146, 151-161; deeper misses/emitter hits add nothing).
        dux, duy, duz = _norm3(dx, dy, dz)
        skyw = 0.5 * (duy + 1.0)
        add_sky = alive0 & ~hit & is_primary
        add_emi = alive0 & hit_emissive & is_primary
        drx = (jnp.where(add_sky, ((1.0 - skyw) * skyb[0] + skyw * skyt[0]),
                         0.0) + jnp.where(add_emi, bem[0], 0.0))
        dry = (jnp.where(add_sky, ((1.0 - skyw) * skyb[1] + skyw * skyt[1]),
                         0.0) + jnp.where(add_emi, bem[1], 0.0))
        drz = (jnp.where(add_sky, ((1.0 - skyw) * skyb[2] + skyw * skyt[2]),
                         0.0) + jnp.where(add_emi, bem[2], 0.0))
        cux = cux + tpx * drx
        cuy = cuy + tpy * dry
        cuz = cuz + tpz * drz

        alive = alive0 & hit & ~hit_emissive
        nsh = nsh + alive.astype(jnp.int32)   # per-lane shadow-ray count

        # Facing normal + epsilon-offset shading point (Renderer.cpp:163-168;
        # normalize mirrors assemble_hit's vec.normalize of the table normal).
        front = (bnx * dx + bny * dy + bnz * dz) < 0.0
        gnx, gny, gnz = _norm3(bnx, bny, bnz)
        nxp = jnp.where(front, gnx, -gnx)
        nyp = jnp.where(front, gny, -gny)
        nzp = jnp.where(front, gnz, -gnz)
        t_pt = jnp.where(hit, best_t, f32(1.0))
        hx = ox + t_pt * dx + nxp * eps_offset
        hy = oy + t_pt * dy + nyp * eps_offset
        hz = oz + t_pt * dz + nzp * eps_offset
        if single_path:
            # Primary-hit G-buffer channels (Denoiser/.../Renderer.cpp:
            # 287-311 fills them in the same cast): world pos WITHOUT the
            # eps offset (intersect.assemble_hit's point), facing normal,
            # global primitive id, contributor flag.
            @pl.when(step_i == 0)
            def _():
                gb = gb_out[0]
                gb[0] = ox + t_pt * dx
                gb[1] = oy + t_pt * dy
                gb[2] = oz + t_pt * dz
                gb[3] = nxp
                gb[4] = nyp
                gb[5] = nzp
                gb[6] = jnp.where(hit, bpid, f32(-1.0))
                gb[7] = hit.astype(f32)

        # --- NEE: one area-light sample (Renderer.cpp:170-189) ------------
        ul0, ul1, ul2, _ = _uniforms4(seed, pix, s, bb, rng_mod.LIGHT)
        budget = ul0 * light_total
        (lv0x, lv0y, lv0z, le1x, le1y, le1z, le2x, le2y, le2z,
         lnx, lny, lnz, lemr, lemg, lemb, _c0) = LGT[0]
        for e in range(1, n_light):
            take = LGT[e - 1][15] <= budget
            (v0x2, v0y2, v0z2, e1x2, e1y2, e1z2, e2x2, e2y2, e2z2,
             nx2, ny2, nz2, emr2, emg2, emb2, _c) = LGT[e]
            lv0x = jnp.where(take, v0x2, lv0x)
            lv0y = jnp.where(take, v0y2, lv0y)
            lv0z = jnp.where(take, v0z2, lv0z)
            le1x = jnp.where(take, e1x2, le1x)
            le1y = jnp.where(take, e1y2, le1y)
            le1z = jnp.where(take, e1z2, le1z)
            le2x = jnp.where(take, e2x2, le2x)
            le2y = jnp.where(take, e2y2, le2y)
            le2z = jnp.where(take, e2z2, le2z)
            lnx = jnp.where(take, nx2, lnx)
            lny = jnp.where(take, ny2, lny)
            lnz = jnp.where(take, nz2, lnz)
            lemr = jnp.where(take, emr2, lemr)
            lemg = jnp.where(take, emg2, lemg)
            lemb = jnp.where(take, emb2, lemb)
        # Uniform barycentric point, reference parameterization
        # (TriangleMesh.h:82-86 via vec.triangle_from).
        xw = 1.0 - jnp.sqrt(ul1)
        w1 = (1.0 - xw) * ul2
        w2 = (1.0 - xw) * (1.0 - ul2)
        lpx = lv0x + w1 * le1x + w2 * le2x
        lpy = lv0y + w1 * le1y + w2 * le2y
        lpz = lv0z + w1 * le1z + w2 * le2z
        tlx, tly, tlz = lpx - hx, lpy - hy, lpz - hz
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 0.0))
        invd = 1.0 / jnp.maximum(dist, 1e-20)
        wlx, wly, wlz = tlx * invd, tly * invd, tlz * invd
        flip_l = (lnx * -wlx + lny * -wly + lnz * -wlz) < 0.0
        lnx2 = jnp.where(flip_l, -lnx, lnx)
        lny2 = jnp.where(flip_l, -lny, lny)
        lnz2 = jnp.where(flip_l, -lnz, lnz)

        # Shadow ray: occlusion test over every primitive (nearest_t fast
        # path semantics: occluded iff any hit lands at t <= dist - tol).
        # DIVISION-FREE Möller-Trumbore: all accept tests are sign
        # comparisons of the numerators against |det|-scaled bounds — the
        # ~n_tri reciprocal iterations per lane-step were ~8% of the kernel.
        # (Boundary rounding can differ from the divided form by 1 ulp of t
        # — a measure-zero band inside the reference's own +tol slack.)
        occluded = jnp.zeros(ox.shape, bool)
        lim = dist - shadow_tol
        for n in range(n_tri):
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             *_rest) = TRI[n]
            s1x = wly * e2z - wlz * e2y
            s1y = wlz * e2x - wlx * e2z
            s1z = wlx * e2y - wly * e2x
            det = s1x * e1x + s1y * e1y + s1z * e1z
            okd = jnp.abs(det) > _DET_EPS
            sd = jnp.where(det >= 0.0, f32(1.0), f32(-1.0))
            adet = det * sd
            sx, sy, sz = hx - v0x, hy - v0y, hz - v0z
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            tn = s2x * e2x + s2y * e2y + s2z * e2z
            b1n = s1x * sx + s1y * sy + s1z * sz
            b2n = s2x * wlx + s2y * wly + s2z * wlz
            tsd = tn * sd
            occluded = occluded | (
                okd & (tsd > t_min * adet) & (tsd <= lim * adet)
                & (b1n * sd >= 0.0) & (b2n * sd >= 0.0)
                & ((det - b1n - b2n) * sd >= 0.0))
        for m in range(n_sph):
            (cx, cy, cz, rad, *_rest) = SPH[m]
            ocx, ocy, ocz = hx - cx, hy - cy, hz - cz
            a_q = wlx * wlx + wly * wly + wlz * wlz
            hb = ocx * wlx + ocy * wly + ocz * wlz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = hb * hb - a_q * c_q
            okq = disc > 0.0
            sq = jnp.sqrt(jnp.where(okq, disc, f32(1.0)))
            t_near = (-hb - sq) / a_q
            t_far = (-hb + sq) / a_q
            ts = jnp.where(okq & (t_near > t_min), t_near,
                           jnp.where(okq & (t_far > t_min), t_far,
                                     f32(NO_HIT)))
            occluded = occluded | (ts <= lim)
        vis = (~occluded).astype(f32)                 # Renderer.cpp:186

        cos_s = wlx * nxp + wly * nyp + wlz * nzp
        cos_l = -(wlx * lnx2 + wly * lny2 + wlz * lnz2)
        geom = cos_s * cos_l / jnp.maximum(dist * dist, 1e-20)
        brdf_ok = (cos_s >= 0.0).astype(f32) * f32(1.0 / np.pi)
        scale = (geom / jnp.maximum(light_pdf, 1e-20)) * vis * brdf_ok
        use = alive & jnp.broadcast_to(inv_light_pdf_valid, alive.shape)
        cux = cux + jnp.where(use, tpx * (lemr * bal[0] * scale), 0.0)
        cuy = cuy + jnp.where(use, tpy * (lemg * bal[1] * scale), 0.0)
        cuz = cuz + jnp.where(use, tpz * (lemb * bal[2] * scale), 0.0)

        # --- indirect: RR + uniform hemisphere (Renderer.cpp:191-208) -----
        us0, us1, us2, _ = _uniforms4(seed, pix, s, bb, rng_mod.SCATTER)
        survive = us2 < rr_survival
        # orthonormal_frame (WhittedMaterial.h:89-114 branch, vec.py:117-127)
        use_x = jnp.abs(nxp) > jnp.abs(nyp)
        yax, yay, yaz = nzp, jnp.zeros_like(nxp), -nxp
        ybx, yby, ybz = jnp.zeros_like(nxp), nzp, -nyp
        yx = jnp.where(use_x, yax, ybx)
        yy = jnp.where(use_x, yay, yby)
        yz = jnp.where(use_x, yaz, ybz)
        yx, yy, yz = _norm3(yx, yy, yz)
        xx = yy * nzp - yz * nyp
        xy = yz * nxp - yx * nzp
        xz = yx * nyp - yy * nxp
        z = us0
        r_xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = f32(2.0 * np.pi) * us1
        cp, sp_ = jnp.cos(phi), jnp.sin(phi)
        wix = r_xy * cp * xx + r_xy * sp_ * yx + z * nxp
        wiy = r_xy * cp * xy + r_xy * sp_ * yy + z * nyp
        wiz = r_xy * cp * xz + r_xy * sp_ * yz + z * nzp
        cos_i = wix * nxp + wiy * nyp + wiz * nzp
        w_ok = (cos_i >= 0.0).astype(f32) * f32(1.0 / np.pi)
        wt = cos_i * f32(2.0 * np.pi) * (1.0 / rr_survival) * w_ok
        continues = alive & survive
        tpx = jnp.where(continues, tpx * (bal[0] * wt), tpx)
        tpy = jnp.where(continues, tpy * (bal[1] * wt), tpy)
        tpz = jnp.where(continues, tpz * (bal[2] * wt), tpz)

        # --- persistent-wavefront bookkeeping (wavefront_steps) -----------
        cont = continues & (bb + 1 < max_depth)
        done = (~cont & armed) if gated else ~cont
        axp = axp + jnp.where(done, cux, 0.0)
        ayp = ayp + jnp.where(done, cuy, 0.0)
        azp = azp + jnp.where(done, cuz, 0.0)
        nd = nd + done.astype(jnp.int32)
        s_next = s if single_path else s + done.astype(jnp.int32)
        uj0, uj1, _, _ = _uniforms4(seed, pix, s_next,
                                    jnp.zeros_like(s_next), rng_mod.JITTER)
        pdx, pdy, pdz = cam_ray(uj0, uj1)
        ox = jnp.where(cont, hx, px_ + jnp.zeros_like(ox))
        oy = jnp.where(cont, hy, py_ + jnp.zeros_like(oy))
        oz = jnp.where(cont, hz, pz_ + jnp.zeros_like(oz))
        dx = jnp.where(cont, wix, pdx)
        dy = jnp.where(cont, wiy, pdy)
        dz = jnp.where(cont, wiz, pdz)
        tpx = jnp.where(cont, tpx, f32(1.0))
        tpy = jnp.where(cont, tpy, f32(1.0))
        tpz = jnp.where(cont, tpz, f32(1.0))
        cux = jnp.where(done, 0.0, cux)
        cuy = jnp.where(done, 0.0, cuy)
        cuz = jnp.where(done, 0.0, cuz)
        bb = jnp.where(cont, bb + 1, 0)
        return (s_next, bb, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
                cux, cuy, cuz, axp, ayp, azp, nd, nsh)

    init = (si_ref[0], si_ref[1],
            sf_ref[0], sf_ref[1], sf_ref[2], sf_ref[3], sf_ref[4], sf_ref[5],
            sf_ref[6], sf_ref[7], sf_ref[8], sf_ref[9], sf_ref[10],
            sf_ref[11], sf_ref[12], sf_ref[13], sf_ref[14],
            si_ref[2], jnp.zeros(si_ref[0].shape, jnp.int32))
    out = jax.lax.fori_loop(0, n_steps, step, init)
    (s, bb, ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
     cux, cuy, cuz, axp, ayp, azp, nd, nsh) = out
    si_out[0] = s
    si_out[1] = bb
    si_out[2] = nd
    si_out[3] = nsh
    for k, v in enumerate((ox, oy, oz, dx, dy, dz, tpx, tpy, tpz,
                           cux, cuy, cuz, axp, ayp, azp)):
        sf_out[k] = v


@functools.partial(
    jax.jit, static_argnames=("n_tri", "n_sph", "n_light", "n_steps",
                              "width", "height", "n_pix", "t_min",
                              "eps_offset", "rr_survival", "shadow_tol",
                              "max_depth", "single_path", "stop_after",
                              "interpret"))
def _run(fs_tri, fs_sph, fs_light, fs_sky, seed, cam16, pix_planes,
         pxy_planes, sf, si, *, n_tri, n_sph, n_light, n_steps, width,
         height, n_pix, t_min, eps_offset, rr_survival, shadow_tol,
         max_depth, single_path=False, stop_after=0, interpret=False):
    p = sf.shape[1]
    g = p // SUB
    fs_sky = fs_sky.reshape(1, 8)
    kern = functools.partial(
        _kernel, n_tri=n_tri, n_sph=n_sph, n_light=n_light, n_steps=n_steps,
        width=width, height=height, n_pix=n_pix, t_min=t_min,
        eps_offset=eps_offset, rr_survival=rr_survival,
        shadow_tol=shadow_tol, max_depth=max_depth, single_path=single_path,
        stop_after=stop_after)
    out_specs = [
        pl.BlockSpec((15, SUB, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, SUB, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(sf.shape, jnp.float32),
        jax.ShapeDtypeStruct(si.shape, jnp.int32),
    ]
    if single_path:
        out_specs.append(pl.BlockSpec((8, SUB, 128), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8,) + sf.shape[1:],
                                              jnp.float32))
    res = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(fs_tri.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(fs_sph.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(fs_light.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, cam16, fs_tri, fs_sph, fs_light, fs_sky, pix_planes, pxy_planes,
      sf, si)
    if single_path:
        sf2, si2, gb = res
        return sf2, si2, jnp.sum(si2[3]), gb
    sf2, si2 = res
    return sf2, si2, jnp.sum(si2[3])


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def wavefront_steps_fused(fs: FusedScene, camera, cfg: RenderConfig, key,
                          state, n_steps: int, *, stop_after: int = 0,
                          interpret: bool | None = None):
    """Drop-in fused equivalent of ``monte_carlo.wavefront_steps``.

    ``state``: a ``models.monte_carlo.WavefrontState`` over the full image
    (R = width*height lanes).  Forward-only.  ``interpret`` defaults to True
    off-TPU so CPU tests exercise the same kernel semantics.
    """
    from cpu_based_ray_tracer_tpu.models import monte_carlo as mc

    if cfg.soft_shadow_beta > 0.0:
        raise NotImplementedError("fused stepper implements the reference's "
                                  "hard shadow test; use the XLA engine for "
                                  "soft-shadow differentiable mode")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_pix = cfg.height * cfg.width
    r = state.s.shape[0]
    if r != n_pix:
        raise ValueError("fused stepper expects full-image lane state")
    rp = _ceil_to(r, LANES_PER_TILE)
    seed = rng_mod.seed_from_key(key)[None, None].astype(jnp.uint32)
    cam16 = _camera_words(camera)[None, :]

    def plane(x, fill=0.0):
        x = jnp.concatenate(
            [x, jnp.full((rp - r,) + x.shape[1:], fill, x.dtype)], 0) \
            if rp != r else x
        return x

    pixel = plane(jnp.arange(r, dtype=jnp.uint32), fill=jnp.uint32(n_pix))
    pix_planes = pixel.reshape(1, rp // 128, 128)
    pxy = jnp.stack([(pixel % jnp.uint32(cfg.width)).astype(jnp.float32),
                     (pixel // jnp.uint32(cfg.width)).astype(jnp.float32)], 0)
    pxy_planes = pxy.reshape(2, rp // 128, 128)
    f_parts = [state.o, state.d, state.tp, state.cur, state.acc]
    sf = jnp.concatenate([plane(x).T for x in f_parts], 0)      # (15, rp)
    sf = sf.reshape(15, rp // 128, 128)
    si = jnp.stack([plane(state.s), plane(state.b), plane(state.n_done),
                    jnp.zeros((rp,), jnp.int32)], 0)
    si = si.reshape(4, rp // 128, 128)

    sf2, si2, nsh = _run(
        fs.tri, fs.sph, fs.light, fs.sky, seed, cam16, pix_planes,
        pxy_planes, sf, si,
        n_tri=fs.n_tri, n_sph=fs.n_sph, n_light=fs.n_light,
        n_steps=int(n_steps), width=cfg.width, height=cfg.height,
        n_pix=n_pix, t_min=float(cfg.t_min),
        eps_offset=float(cfg.eps_offset),
        rr_survival=float(cfg.rr_survival),
        shadow_tol=float(cfg.shadow_tolerance),
        max_depth=int(cfg.max_depth), stop_after=int(stop_after),
        interpret=bool(interpret))

    sf2 = sf2.reshape(15, rp)[:, :r]
    si2 = si2.reshape(4, rp)[:, :r]
    v3 = lambda k: sf2[3 * k:3 * k + 3].T                        # noqa: E731
    n_valid = r  # every in-range lane traces a main ray each step
    return mc.WavefrontState(
        s=si2[0], b=si2[1], o=v3(0), d=v3(1), tp=v3(2), cur=v3(3),
        acc=v3(4), n_done=si2[2],
        # modulo 2^31: a 10,000-spp equal-spp run traces ~3e10 rays —
        # far past int32; the counter wraps rather than refusing the render
        nrays=state.nrays + jnp.int32((n_steps * n_valid) % (1 << 31))
        + nsh)


def single_sample_gbuffer(fs: FusedScene, camera, cfg: RenderConfig, key,
                          frame_index, *, interpret: bool | None = None):
    """ONE equal-spp sample per pixel + primary-hit G-buffer, fused.

    The Denoiser stage's per-frame workload (deterministic pixel-center
    primaries, full path radiance for sample ``frame_index``, aux channels
    from the same primary cast — ``Denoiser/.../Renderer.cpp:238-311``)
    through the persistent-wavefront kernel in single-path mode: each lane
    traces exactly its pixel's ``frame_index`` sample then idles, so the
    result is bit-compatible with the scan engine's estimator (same pcg4d
    streams), at fused-kernel speed (~16 x 0.9 ms vs ~190 ms at 896^2).

    Returns ``(color (R, 3), world_pos (R, 3), normal (R, 3),
    prim_id (R,) i32, contributor (R,) bool)`` in lane (row-major pixel)
    order.  ``prim_id`` follows ``models.denoiser.global_prim_id``
    (triangle n -> n+1, sphere m -> n_tri+m+1 over the pack's LIVE spheres
    — zero-radius placeholders are dropped at pack time)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_pix = cfg.height * cfg.width
    rp = _ceil_to(n_pix, LANES_PER_TILE)
    seed = rng_mod.seed_from_key(key)[None, None].astype(jnp.uint32)
    cam16 = _camera_words(camera)[None, :]

    def plane(x, fill=0.0):
        if rp != n_pix:
            x = jnp.concatenate(
                [x, jnp.full((rp - n_pix,) + x.shape[1:], fill, x.dtype)], 0)
        return x

    pixel = plane(jnp.arange(n_pix, dtype=jnp.uint32),
                  fill=jnp.uint32(n_pix))
    pix_planes = pixel.reshape(1, rp // 128, 128)
    pxy = jnp.stack([(pixel % jnp.uint32(cfg.width)).astype(jnp.float32),
                     (pixel // jnp.uint32(cfg.width)).astype(jnp.float32)], 0)
    pxy_planes = pxy.reshape(2, rp // 128, 128)

    d = cam_mod.perspective_rays(camera, cfg.width, cfg.height).reshape(-1, 3)
    o = jnp.broadcast_to(camera.position, d.shape)
    z3 = jnp.zeros((n_pix, 3), jnp.float32)
    f_parts = [o, d, jnp.ones((n_pix, 3), jnp.float32), z3, z3]
    sf = jnp.concatenate([plane(x).T for x in f_parts], 0)
    sf = sf.reshape(15, rp // 128, 128)
    s0 = jnp.full((n_pix,), jnp.asarray(frame_index, jnp.int32))
    zi = jnp.zeros((n_pix,), jnp.int32)
    si = jnp.stack([plane(s0), plane(zi), plane(zi), plane(zi)], 0)
    si = si.reshape(4, rp // 128, 128)

    # max_depth steps retire every lane (RR paths are depth-capped).
    sf2, si2, _nsh, gb = _run(
        fs.tri, fs.sph, fs.light, fs.sky, seed, cam16, pix_planes,
        pxy_planes, sf, si,
        n_tri=fs.n_tri, n_sph=fs.n_sph, n_light=fs.n_light,
        n_steps=int(cfg.max_depth), width=cfg.width, height=cfg.height,
        n_pix=n_pix, t_min=float(cfg.t_min),
        eps_offset=float(cfg.eps_offset),
        rr_survival=float(cfg.rr_survival),
        shadow_tol=float(cfg.shadow_tolerance),
        max_depth=int(cfg.max_depth), single_path=True,
        interpret=bool(interpret))
    sf2 = sf2.reshape(15, rp)[:, :n_pix]
    gb = gb.reshape(8, rp)[:, :n_pix]
    color = sf2[12:15].T                      # acc = the one completed sample
    return (color, gb[0:3].T, gb[3:6].T, gb[6].astype(jnp.int32),
            gb[7] > 0.5)

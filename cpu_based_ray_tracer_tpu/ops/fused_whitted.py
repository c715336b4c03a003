"""Fused Whitted ray-tree kernel (Pallas, TPU) — the real-time stage.

The reference's Whitted demo is interactive ("real-time-ish",
``/root/reference/README.md:81-83``); our XLA level-synchronous tree
(``models.whitted``) reaches ~5.5 fps at the reference viewport (r3).  This
kernel evaluates the ENTIRE depth-``whitted_depth`` both-branch ray tree
per lane in one Pallas program: the scene (2 spheres + 2 triangles + 2
point lights + 3 materials, ``Whitted Style Ray Tracer/.../
Renderer.cpp:27-49``) is unrolled from SMEM, and each lane carries a
priority queue of Q live branches (origin, direction, Fresnel throughput).

Per level, per queue slot: unrolled nearest-hit intersect -> miss adds
w*sky / Diffuse_Glossy adds w*(Blinn-Phong with per-light unrolled shadow
occlusion, chessboard texture) / specular emits reflect+refract candidates
weighted by the exact polarized Fresnel (``Renderer.h:79-109``); the 2Q
candidates are then sorted by throughput (Batcher network of vector
selects) and the top Q survive.  The dropped weight is accumulated and
returned — it is 0 on the reference scene for Q >= 4 (asserted in
tests/test_fused_whitted.py), in which case the kernel computes the exact
same tree as ``models.whitted.trace`` (same formulas; fp tolerance).

Semantics mirrored 1:1 from ``models/whitted.py`` (which cites the
reference line by line); deterministic, forward-only.
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
from cpu_based_ray_tracer_tpu.ops.fused import (NO_HIT, SUB, LANES_PER_TILE,
                                                _norm3, _DET_EPS)
from cpu_based_ray_tracer_tpu.scene import (DIFFUSE_GLOSSY, REFLECTIVE,
                                            REFLECTIVE_REFRACTIVE,
                                            TEX_CHESSBOARD, Scene)

# Batcher odd-even merge sort network for 8 elements (descending).
_NET8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
         (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
         (1, 2), (3, 4), (5, 6)]
_NET4 = [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)]


def _sort_net(n):
    if n == 4:
        return _NET4
    if n == 8:
        return _NET8
    raise NotImplementedError(f"no sorting network for {n}")


class WhittedPack(NamedTuple):
    """SMEM tables of the Whitted scene (host-built)."""

    tri: jax.Array     # (N, 20) v0 e1 e2 n mid uv0 uv1 uv2 pad
    sph: jax.Array     # (S, 8)  center radius mid pad
    mat: jax.Array     # (K, 12) kind albedo ior kd ks spec_exp texture pad
    light: jax.Array   # (L, 8)  position radiance pad
    sky: jax.Array     # (8,)    sky_top chess_a? -> sky(3) pad
    chess: jax.Array   # (8,)    chess_a(3) chess_b(3) frequency pad
    n_tri: int
    n_sph: int
    n_mat: int
    n_light: int


def pack_whitted_scene(scene: Scene) -> WhittedPack:
    from cpu_based_ray_tracer_tpu.scenes.whitted_scene import (
        CHESS_A, CHESS_B, CHESS_FREQUENCY)

    tr, sp, mats = scene.triangles, scene.spheres, scene.materials
    n = tr.count
    tri = np.zeros((max(n, 1), 20), np.float32)
    tri[:n, 0:3] = np.asarray(tr.v0)
    tri[:n, 3:6] = np.asarray(tr.e1)
    tri[:n, 6:9] = np.asarray(tr.e2)
    tri[:n, 9:12] = np.asarray(tr.normal)
    tri[:n, 12] = np.asarray(tr.material)
    tri[:n, 13:15] = np.asarray(tr.uv0)
    tri[:n, 15:17] = np.asarray(tr.uv1)
    tri[:n, 17:19] = np.asarray(tr.uv2)

    c = np.asarray(sp.center)
    r = np.asarray(sp.radius)
    smat = np.asarray(sp.material)
    live = r != 0.0
    c, r, smat = c[live], r[live], smat[live]
    s = len(c)
    sph = np.zeros((max(s, 1), 8), np.float32)
    sph[:s, 0:3] = c
    sph[:s, 3] = r
    sph[:s, 4] = smat

    k = np.asarray(mats.albedo).shape[0]
    mat = np.zeros((k, 12), np.float32)
    mat[:, 0] = np.asarray(mats.kind)
    mat[:, 1:4] = np.asarray(mats.albedo)
    mat[:, 4] = np.asarray(mats.ior)
    mat[:, 5] = np.asarray(mats.kd)
    mat[:, 6] = np.asarray(mats.ks)
    mat[:, 7] = np.asarray(mats.spec_exp)
    mat[:, 8] = np.asarray(mats.texture)

    lt = scene.lights
    nl = np.asarray(lt.position).shape[0]
    light = np.zeros((max(nl, 1), 8), np.float32)
    light[:nl, 0:3] = np.asarray(lt.position)
    light[:nl, 3:6] = np.asarray(lt.radiance)

    sky = np.zeros((8,), np.float32)
    sky[0:3] = np.asarray(scene.sky_top)
    chess = np.zeros((8,), np.float32)
    chess[0:3] = CHESS_A
    chess[3:6] = CHESS_B
    chess[6] = CHESS_FREQUENCY

    return WhittedPack(tri=jnp.asarray(tri), sph=jnp.asarray(sph),
                       mat=jnp.asarray(mat), light=jnp.asarray(light),
                       sky=jnp.asarray(sky), chess=jnp.asarray(chess),
                       n_tri=n, n_sph=s, n_mat=k, n_light=nl)


def _kernel(tri_ref, sph_ref, mat_ref, light_ref, sky_ref, chess_ref,
            cam_ref, d_ref, pix_ref, out_ref, *, n_tri: int, n_sph: int,
            n_mat: int, n_light: int, depth: int, queue: int, t_min: float,
            eps_offset: float, n_pix: int):
    f32 = jnp.float32
    TRI = [[tri_ref[i, j] for j in range(19)] for i in range(n_tri)]
    SPH = [[sph_ref[i, j] for j in range(5)] for i in range(n_sph)]
    MAT = [[mat_ref[i, j] for j in range(9)] for i in range(n_mat)]
    LGT = [[light_ref[i, j] for j in range(6)] for i in range(n_light)]
    sky = (sky_ref[0, 0], sky_ref[0, 1], sky_ref[0, 2])
    chess_a = (chess_ref[0, 0], chess_ref[0, 1], chess_ref[0, 2])
    chess_b = (chess_ref[0, 3], chess_ref[0, 4], chess_ref[0, 5])
    chess_f = chess_ref[0, 6]
    cx_, cy_, cz_ = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]

    pix = pix_ref[0]
    valid = pix < jnp.uint32(n_pix)

    def intersect(ox, oy, oz, dx, dy, dz):
        """Unrolled nearest hit -> (t, raw n, mid, uvx, uvy)."""
        best_t = jnp.full(ox.shape, f32(NO_HIT))
        bnx = jnp.zeros_like(ox)
        bny = jnp.zeros_like(ox)
        bnz = jnp.zeros_like(ox)
        bmid = jnp.full(ox.shape, f32(-1.0))
        bu = jnp.zeros_like(ox)
        bv = jnp.zeros_like(ox)
        for i in range(n_tri):
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz,
             mid, u0x, u0y, u1x, u1y, u2x, u2y) = TRI[i]
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
            b0 = 1.0 - b1 - b2
            uvx = u0x * b0 + u1x * b1 + u2x * b2
            uvy = u0y * b0 + u1y * b1 + u2y * b2
            best_t = jnp.where(ok, t, best_t)
            bnx = jnp.where(ok, nx, bnx)
            bny = jnp.where(ok, ny, bny)
            bnz = jnp.where(ok, nz, bnz)
            bmid = jnp.where(ok, mid, bmid)
            bu = jnp.where(ok, uvx, bu)
            bv = jnp.where(ok, uvy, bv)
        for m in range(n_sph):
            (scx, scy, scz, rad, mid) = SPH[m]
            ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
            a_q = dx * dx + dy * dy + dz * dz
            hb = ocx * dx + ocy * dy + ocz * dz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = hb * hb - a_q * c_q
            okq = disc > 0.0
            sq = jnp.sqrt(jnp.where(okq, disc, f32(1.0)))
            t_near = (-hb - sq) / a_q
            t_far = (-hb + sq) / a_q
            ts = jnp.where(okq & (t_near > t_min), t_near,
                           jnp.where(okq & (t_far > t_min), t_far,
                                     f32(NO_HIT)))
            ok = ts < best_t
            inv_r = 1.0 / jnp.where(rad == 0.0, f32(1.0), rad)
            hx = ox + ts * dx
            hy = oy + ts * dy
            hz = oz + ts * dz
            best_t = jnp.where(ok, ts, best_t)
            bnx = jnp.where(ok, (hx - scx) * inv_r, bnx)
            bny = jnp.where(ok, (hy - scy) * inv_r, bny)
            bnz = jnp.where(ok, (hz - scz) * inv_r, bnz)
            bmid = jnp.where(ok, mid, bmid)
            bu = jnp.where(ok, 0.0, bu)
            bv = jnp.where(ok, 0.0, bv)
        return best_t, bnx, bny, bnz, bmid, bu, bv

    def nearest_t(ox, oy, oz, dx, dy, dz):
        """Occlusion fast path: nearest t over every primitive."""
        best_t = jnp.full(ox.shape, f32(NO_HIT))
        for i in range(n_tri):
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             *_r) = TRI[i]
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
                  & (1.0 - b1 - b2 >= 0.0))
            best_t = jnp.where(ok & (t < best_t), t, best_t)
        for m in range(n_sph):
            (scx, scy, scz, rad, _mid) = SPH[m]
            ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
            a_q = dx * dx + dy * dy + dz * dz
            hb = ocx * dx + ocy * dy + ocz * dz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = hb * hb - a_q * c_q
            okq = disc > 0.0
            sq = jnp.sqrt(jnp.where(okq, disc, f32(1.0)))
            t_near = (-hb - sq) / a_q
            t_far = (-hb + sq) / a_q
            ts = jnp.where(okq & (t_near > t_min), t_near,
                           jnp.where(okq & (t_far > t_min), t_far,
                                     f32(NO_HIT)))
            best_t = jnp.minimum(best_t, ts)
        return best_t

    def level(_lv, carry):
        # Tile-level dead-tree skip: once no lane in this tile carries
        # weight (no glass/mirror pixels), remaining levels cost one
        # predicate (the XLA engine's lax.cond, in-kernel).
        any_alive = jnp.zeros((), bool)
        for q in range(queue):
            any_alive = any_alive | jnp.any(carry[q * 7 + 6] > 0.0)
        return jax.lax.cond(any_alive, _level_live, lambda c: c, carry)

    def _level_live(flat):
        slots = [tuple(flat[q * 7 + j] for j in range(7))
                 for q in range(queue)]
        rad = (flat[7 * queue], flat[7 * queue + 1], flat[7 * queue + 2])
        trunc = flat[7 * queue + 3]
        cand = []      # (w, o3, d3) candidates for the next level
        for q in range(queue):
            ox, oy, oz, dx, dy, dz, w = slots[q]
            live = valid & (w > 0.0)
            t, nxr, nyr, nzr, mid, bu, bv = intersect(ox, oy, oz,
                                                      dx, dy, dz)
            hit = t < f32(NO_HIT)
            nx, ny, nz = _norm3(nxr, nyr, nzr)
            t_pt = jnp.where(hit, t, f32(1.0))
            hx = ox + t_pt * dx
            hy = oy + t_pt * dy
            hz = oz + t_pt * dz

            # material row
            kind = jnp.full(ox.shape, f32(-1.0))
            alr = jnp.zeros_like(ox)
            alg = jnp.zeros_like(ox)
            alb = jnp.zeros_like(ox)
            ior = jnp.ones_like(ox)
            kd = jnp.zeros_like(ox)
            ks = jnp.zeros_like(ox)
            sxp = jnp.ones_like(ox)
            tex = jnp.zeros_like(ox)
            for k in range(n_mat):
                take = mid == f32(k)
                (kk, ar, ag, ab, io, kdd, kss, se, tx) = MAT[k]
                kind = jnp.where(take, kk, kind)
                alr = jnp.where(take, ar, alr)
                alg = jnp.where(take, ag, alg)
                alb = jnp.where(take, ab, alb)
                ior = jnp.where(take, io, ior)
                kd = jnp.where(take, kdd, kd)
                ks = jnp.where(take, kss, ks)
                sxp = jnp.where(take, se, sxp)
                tex = jnp.where(take, tx, tex)

            # chessboard texture (TriangleMesh.h:79-86 via models.whitted)
            fx = jnp.mod(bu * chess_f, 1.0) > 0.5
            fy = jnp.mod(bv * chess_f, 1.0) > 0.5
            pat = (fx ^ fy).astype(f32)
            chr_ = chess_a[0] + (chess_b[0] - chess_a[0]) * pat
            chg_ = chess_a[1] + (chess_b[1] - chess_a[1]) * pat
            chb_ = chess_a[2] + (chess_b[2] - chess_a[2]) * pat
            use_chess = tex == f32(TEX_CHESSBOARD)
            colr = jnp.where(use_chess, chr_, alr)
            colg = jnp.where(use_chess, chg_, alg)
            colb = jnp.where(use_chess, chb_, alb)

            # miss -> sky
            miss = live & ~hit
            rad = (rad[0] + jnp.where(miss, w * sky[0], 0.0),
                   rad[1] + jnp.where(miss, w * sky[1], 0.0),
                   rad[2] + jnp.where(miss, w * sky[2], 0.0))

            # Diffuse_Glossy -> Blinn-Phong (Renderer.h:252-306)
            is_diff = live & hit & (kind == f32(DIFFUSE_GLOSSY))
            inside = (dx * nx + dy * ny + dz * nz) < 0.0
            sgn = jnp.where(inside, f32(1.0), f32(-1.0))
            px = hx + sgn * nx * eps_offset
            py = hy + sgn * ny * eps_offset
            pz = hz + sgn * nz * eps_offset
            dsr = jnp.zeros_like(ox)
            dsg = jnp.zeros_like(ox)
            dsb = jnp.zeros_like(ox)
            ssr = jnp.zeros_like(ox)
            ssg = jnp.zeros_like(ox)
            ssb = jnp.zeros_like(ox)
            for li in range(n_light):
                (lx, ly, lz, lr, lg, lb) = LGT[li]
                tlx, tly, tlz = lx - hx, ly - hy, lz - hz
                dist2 = tlx * tlx + tly * tly + tlz * tlz
                inv_l = jax.lax.rsqrt(jnp.maximum(dist2, 1e-24))
                ldx, ldy, ldz = tlx * inv_l, tly * inv_l, tlz * inv_l
                occ_t = nearest_t(px, py, pz, ldx, ldy, ldz)
                vis = ~(occ_t * occ_t < dist2)
                cos_l = jnp.abs(ldx * nx + ldy * ny + ldz * nz)
                # reflect(-ldir, n) = -ldir - 2 dot(-ldir, n) n
                mdn = -(ldx * nx + ldy * ny + ldz * nz)
                rx = -ldx - 2.0 * mdn * nx
                ry = -ldy - 2.0 * mdn * ny
                rz = -ldz - 2.0 * mdn * nz
                spec = jnp.maximum(0.0, -(rx * dx + ry * dy + rz * dz))
                spec = jnp.power(spec, sxp)
                visf = vis.astype(f32)
                dsr = dsr + visf * lr * cos_l
                dsg = dsg + visf * lg * cos_l
                dsb = dsb + visf * lb * cos_l
                ssr = ssr + visf * spec * lr
                ssg = ssg + visf * spec * lg
                ssb = ssb + visf * spec * lb
            rad = (rad[0] + jnp.where(is_diff,
                                      w * (dsr * colr * kd + ssr * ks), 0.0),
                   rad[1] + jnp.where(is_diff,
                                      w * (dsg * colg * kd + ssg * ks), 0.0),
                   rad[2] + jnp.where(is_diff,
                                      w * (dsb * colb * kd + ssb * ks), 0.0))

            # specular children (Renderer.h:214-251)
            is_refl = live & hit & (kind == f32(REFLECTIVE))
            is_glass = live & hit & (kind == f32(REFLECTIVE_REFRACTIVE))
            cos_i = jnp.clip(dx * nx + dy * ny + dz * nz, -1.0, 1.0)
            outside = cos_i < 0.0
            # exact polarized Fresnel (vec.fresnel_exact)
            eta_in = jnp.where(outside, f32(1.0), ior)
            eta_out = jnp.where(outside, ior, f32(1.0))
            ci = jnp.abs(cos_i)
            si = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
            st = eta_in / eta_out * si
            tir_f = st >= 1.0
            ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - st * st))
            rs = (eta_in * ci - eta_out * ct) / (eta_in * ci + eta_out * ct)
            rp = (eta_in * ct - eta_out * ci) / (eta_in * ct + eta_out * ci)
            fres = jnp.where(tir_f, f32(1.0), 0.5 * (rs * rs + rp * rp))

            # reflect(d, n), normalized (vec.reflect + normalize)
            ddn = dx * nx + dy * ny + dz * nz
            rfx, rfy, rfz = _norm3(dx - 2.0 * ddn * nx, dy - 2.0 * ddn * ny,
                                   dz - 2.0 * ddn * nz)
            # snell_whitted + normalize; zero on TIR
            eta_r = jnp.where(outside, 1.0 / ior, ior)
            nsx = jnp.where(outside, nx, -nx)
            nsy = jnp.where(outside, ny, -ny)
            nsz = jnp.where(outside, nz, -nz)
            kk_ = 1.0 - eta_r * eta_r * (1.0 - ci * ci)
            sq_ = jnp.sqrt(jnp.maximum(kk_, 0.0))
            ttx = eta_r * dx + (eta_r * ci - sq_) * nsx
            tty = eta_r * dy + (eta_r * ci - sq_) * nsy
            ttz = eta_r * dz + (eta_r * ci - sq_) * nsz
            tir2 = kk_ < 0.0
            ttx = jnp.where(tir2, 0.0, ttx)
            tty = jnp.where(tir2, 0.0, tty)
            ttz = jnp.where(tir2, 0.0, ttz)
            tnorm2 = ttx * ttx + tty * tty + ttz * ttz
            rrx, rry, rrz = _norm3(ttx, tty, ttz)
            tir = tnorm2 < 0.5

            def child_origin(cdx, cdy, cdz):
                ins = (cdx * nx + cdy * ny + cdz * nz) < 0.0
                sg = jnp.where(ins, f32(-1.0), f32(1.0))
                return (hx + sg * nx * eps_offset,
                        hy + sg * ny * eps_offset,
                        hz + sg * nz * eps_offset)

            rox, roy, roz = child_origin(rfx, rfy, rfz)
            tox, toy, toz = child_origin(rrx, rry, rrz)
            refl_w = jnp.where(is_refl | is_glass, w * fres, 0.0)
            refr_w = jnp.where(is_glass & ~tir, w * (1.0 - fres), 0.0)
            cand.append((refl_w, rox, roy, roz, rfx, rfy, rfz))
            cand.append((refr_w, tox, toy, toz, rrx, rry, rrz))

        # top-Q selection by throughput (descending sorting network)
        for (a, b) in _sort_net(2 * queue):
            wa = cand[a][0]
            wb = cand[b][0]
            swap = wb > wa
            na = tuple(jnp.where(swap, cand[b][j], cand[a][j])
                       for j in range(7))
            nb = tuple(jnp.where(swap, cand[a][j], cand[b][j])
                       for j in range(7))
            cand[a], cand[b] = na, nb
        out = []
        for q in range(queue):
            (w, oxn, oyn, ozn, dxn, dyn, dzn) = cand[q]
            out.extend([oxn, oyn, ozn, dxn, dyn, dzn, w])
        for q in range(queue, 2 * queue):
            trunc = trunc + cand[q][0]
        out.extend([rad[0], rad[1], rad[2], trunc])
        return tuple(out)

    # slot 0 = the primary ray; the rest dead.
    dx0, dy0, dz0 = d_ref[0], d_ref[1], d_ref[2]
    z = jnp.zeros(dx0.shape, f32)
    init = [cx_ + z, cy_ + z, cz_ + z, dx0, dy0, dz0, z + 1.0]
    for _ in range(queue - 1):
        init.extend([z, z, z, z, z, z, z])
    init.extend([z, z, z, z])                  # rad(3) + trunc
    flat = jax.lax.fori_loop(0, depth + 1, level, tuple(init))
    out_ref[0] = flat[7 * queue]
    out_ref[1] = flat[7 * queue + 1]
    out_ref[2] = flat[7 * queue + 2]
    out_ref[3] = flat[7 * queue + 3]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=(
    "n_tri", "n_sph", "n_mat", "n_light", "depth", "queue", "t_min",
    "eps_offset", "n_pix", "interpret"))
def _run(tri, sph, mat, light, sky, chess, cam3, d_planes, pix_planes, *,
         n_tri, n_sph, n_mat, n_light, depth, queue, t_min, eps_offset,
         n_pix, interpret):
    rows = d_planes.shape[1]
    g = rows // SUB
    kern = functools.partial(
        _kernel, n_tri=n_tri, n_sph=n_sph, n_mat=n_mat, n_light=n_light,
        depth=depth, queue=queue, t_min=t_min, eps_offset=eps_offset,
        n_pix=n_pix)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    def vmem(p):
        return pl.BlockSpec((p, SUB, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern, grid=(g,),
        in_specs=[smem(tri.shape), smem(sph.shape), smem(mat.shape),
                  smem(light.shape), smem((1, 8)), smem((1, 8)),
                  smem((1, 8)), vmem(3), vmem(1)],
        out_specs=vmem(4),
        out_shape=jax.ShapeDtypeStruct((4, rows, 128), jnp.float32),
        interpret=interpret,
    )(tri, sph, mat, light, sky.reshape(1, 8), chess.reshape(1, 8), cam3,
      d_planes, pix_planes)
    return out


def render_fused(scene: Scene, camera, cfg: RenderConfig, *,
                 queue: int = 4, interpret: bool | None = None):
    """Fused Whitted render -> (linear image (H, W, 3), truncated weight).

    ``truncated`` is the total Fresnel throughput dropped by the per-lane
    Q-slot queue — 0.0 means the kernel evaluated the exact XLA/reference
    tree; a nonzero value means raise ``queue`` (glass-heavy non-reference
    scene)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = cfg.height, cfg.width
    n_pix = h * w
    rp = _ceil_to(n_pix, LANES_PER_TILE)
    wp = pack_whitted_scene(scene)

    d = cam_mod.perspective_rays(camera, w, h).reshape(-1, 3)
    pad = rp - n_pix
    if pad:
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 (pad, 3))], 0)
    d_planes = d.T.reshape(3, rp // 128, 128)
    pixel = jnp.concatenate(
        [jnp.arange(n_pix, dtype=jnp.uint32),
         jnp.full((pad,), n_pix, jnp.uint32)]) if pad else jnp.arange(
             n_pix, dtype=jnp.uint32)
    pix_planes = pixel.reshape(1, rp // 128, 128)
    cam3 = jnp.concatenate([camera.position,
                            jnp.zeros((5,), jnp.float32)]).reshape(1, 8)

    out = _run(wp.tri, wp.sph, wp.mat, wp.light, wp.sky, wp.chess, cam3,
               d_planes, pix_planes,
               n_tri=wp.n_tri, n_sph=wp.n_sph, n_mat=wp.n_mat,
               n_light=wp.n_light, depth=int(cfg.whitted_depth),
               queue=int(queue), t_min=float(cfg.t_min),
               eps_offset=float(cfg.eps_offset), n_pix=n_pix,
               interpret=bool(interpret))
    out = out.reshape(4, rp)[:, :n_pix]
    img = out[0:3].T.reshape(h, w, 3)
    return img, jnp.sum(out[3])

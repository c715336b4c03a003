"""Per-pass performance benchmark (VERDICT r1 item 7 / weak #3).

Times every stage's hot pass at reference-scale resolution on the current
backend and writes ``PERF_PASSES.json``:

- MC Cornell bounce throughput (wavefront stepper) — the headline;
- Whitted full render (2^5 ray tree) at the 896x896 viewport;
- BVH mesh stage (real bunny+teapot OBJs through the packet intersector);
- Denoiser: dense JBF vs à-trous at k in {7, 16, 32}, temporal pass —
  the reference admits its JBF is "too brutal to have an acceptable render
  time" (README.md:132); these numbers are the receipt that ours isn't.

Usage: python tools/bench_passes.py [--cpu] [--width 896] [--only mc,jbf,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3, warmup=1):
    """Median wall time of ``fn(*args)`` after jit warm-up."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=896)
    ap.add_argument("--height", type=int, default=896)
    ap.add_argument("--only", default=None,
                    help="comma list: mc,whitted,mesh,jbf,temporal")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.models import (
        denoiser as dmodel, mesh as mesh_model, monte_carlo, whitted)
    from cpu_based_ray_tracer_tpu.ops import denoise
    from cpu_based_ray_tracer_tpu.scenes import (
        cornell, meshes, whitted_scene)
    from cpu_based_ray_tracer_tpu.utils import rng

    w, h = args.width, args.height
    want = (set(args.only.split(",")) if args.only else
            {"mc", "fused", "mcmesh", "mcmeshfused", "mcmeshscale",
             "whitted", "mesh", "packet", "jbf", "temporal", "denoiserfps",
             "whittedfused", "rtiowfused", "gradstep"})
    out_path = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERF_PASSES.json")
    report = {"platform": jax.devices()[0].platform,
              "viewport": f"{w}x{h}", "passes": {}}
    if args.only and os.path.isfile(out_path):
        # --only runs MERGE into the existing report (same platform only).
        with open(out_path) as f:
            prev = json.load(f)
        if prev.get("platform") == report["platform"]:
            report["passes"].update(prev.get("passes", {}))
    P = report["passes"]
    key = rng.render_key(0)

    if "mc" in want:
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, spp=4, max_depth=16,
                           rr_survival=0.8)
        n_steps = 32
        step = jax.jit(lambda st: monte_carlo.wavefront_steps(
            scene, cam, cfg, key, st, n_steps))
        st = monte_carlo.wavefront_init(scene, cam, cfg, key)
        st = step(st)
        jax.block_until_ready(st.acc)
        r0, t0 = int(np.asarray(st.nrays)), time.perf_counter()
        for _ in range(4):
            st = step(st)
        jax.block_until_ready(st.acc)
        dt = time.perf_counter() - t0
        rays = int(np.asarray(st.nrays)) - r0
        P["mc_wavefront"] = {
            "seconds_per_32steps": dt / 4, "rays_per_s": rays / dt,
            "bounce_steps_per_s": 4 * n_steps / dt,
            "lanes": h * w}
        print("mc:", P["mc_wavefront"], flush=True)

        # Equal-spp engine (goldens/gradients semantics): exactly cfg.spp
        # samples per pixel, tail and all — the honest apples-to-apples
        # number next to the free-running stepper above.
        eq = jax.jit(lambda acc, s: monte_carlo.render_wavefront(
            scene, cam, cfg, key, acc, s, return_rays=True))
        acc0 = jnp.zeros((h, w, 3), jnp.float32)
        _, _, nr = eq(acc0, 0)
        jax.block_until_ready(nr)
        t0 = time.perf_counter()
        _, _, nr = eq(acc0, 0)
        jax.block_until_ready(nr)
        dt = time.perf_counter() - t0
        P["mc_equal_spp"] = {
            "seconds": dt, "rays_per_s": int(np.asarray(nr)) / dt,
            "spp": cfg.spp,
            "spp_per_s": cfg.spp / dt}
        print("mc equal-spp:", P["mc_equal_spp"], flush=True)

    if "fused" in want:
        # The fused Pallas persistent-wavefront kernel (ops.fused) — the
        # r3 headline engine; see PERF.md for the roofline.
        from cpu_based_ray_tracer_tpu.ops import fused
        import dataclasses

        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, spp=4, max_depth=16,
                           rr_survival=0.8)
        fs = fused.pack_scene(scene)
        n_steps = 256
        step = jax.jit(lambda st: fused.wavefront_steps_fused(
            fs, cam, cfg, key, st, n_steps))
        st = step(monte_carlo.wavefront_init(scene, cam, cfg, key))
        jax.block_until_ready(st.acc)
        st = dataclasses.replace(st, nrays=st.nrays * 0)
        t0 = time.perf_counter()
        for _ in range(4):
            st = step(st)
        jax.block_until_ready(st.acc)
        dt = time.perf_counter() - t0
        P["mc_fused_kernel"] = {
            "seconds_per_256steps": dt / 4,
            "rays_per_s": int(np.asarray(st.nrays)) / dt,
            "ms_per_step": dt / (4 * n_steps) * 1e3, "lanes": h * w}
        print("fused:", P["mc_fused_kernel"], flush=True)

    if "mcmesh" in want:
        # MC over an accelerated mesh (bunny-in-Cornell through the packet
        # intersector) — the reference MC stage's BVH-backed architecture
        # (Renderer.cpp:41); VERDICT r2 item 3's bench receipt.
        scene = cornell.cornell_mesh_scene()
        bundle = mesh_model.prepare(scene, method="packet")
        cam = cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, spp=4, max_depth=16,
                           rr_survival=0.8)
        n_steps = 8
        step = jax.jit(lambda st: mesh_model.wavefront_mc_steps(
            bundle, cam, cfg, key, st, n_steps))
        st = monte_carlo.wavefront_init(scene, cam, cfg, key)
        st = step(st)
        jax.block_until_ready(st.acc)
        r0, t0 = int(np.asarray(st.nrays)), time.perf_counter()
        for _ in range(3):
            st = step(st)
        jax.block_until_ready(st.acc)
        dt = time.perf_counter() - t0
        P["mc_mesh_packet"] = {
            "rays_per_s": (int(np.asarray(st.nrays)) - r0) / dt,
            "tris": int(scene.triangles.count),
            "seconds_per_step": dt / (3 * n_steps), "lanes": h * w}
        print("mcmesh:", P["mc_mesh_packet"], flush=True)

    if "mcmeshfused" in want:
        # The r4 fused mesh-MC engine (ops.fused_mesh): compaction + SMEM
        # cluster kernels around K1/K1b/K2 (VERDICT r3 next #1).
        from cpu_based_ray_tracer_tpu.ops import fused_mesh

        scene = cornell.cornell_mesh_scene()
        cam = cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, spp=8, max_depth=16,
                           rr_survival=0.8)
        mp = fused_mesh.pack_mesh_scene(scene)
        rp = -(-h * w // 4096) * 4096
        n_steps = 16
        st = monte_carlo.wavefront_init(scene, cam, cfg, key)
        # Steady-state caps: main pop 11.1%, shadow pop 5.2% after the r4
        # zero-weight pruning (cos_s <= 0 lanes skip the mesh occlusion
        # test); early coherent-camera steps overflow these on purpose —
        # the production driver doubles caps on overflow.
        cap_main, cap_shadow = rp // 8, rp // 16
        st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
            mp, cam, cfg, key, st, n_steps, cap_main=cap_main,
            cap_shadow=cap_shadow)
        jax.block_until_ready(st.acc)
        # A timing run under compaction overflow advances invalid state
        # (engine docstring) — retry with doubled caps until clean
        # (ADVICE r4: never derive a throughput receipt from an
        # overflowed run).
        for _ in range(4):
            r0, t0 = int(np.asarray(st.nrays)), time.perf_counter()
            for _ in range(3):
                st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
                    mp, cam, cfg, key, st, n_steps, cap_main=cap_main,
                    cap_shadow=cap_shadow)
            jax.block_until_ready(st.acc)
            dt = time.perf_counter() - t0
            if int(np.asarray(of)) == 0:
                break
            print(f"mcmeshfused: overflow={int(np.asarray(of))} -> "
                  f"doubling caps and re-timing", flush=True)
            cap_main = min(2 * cap_main, rp)
            cap_shadow = min(2 * cap_shadow, rp)
        P["mc_mesh_fused"] = {
            "rays_per_s": (int(np.asarray(st.nrays)) - r0) / dt,
            "tris": int(scene.triangles.count),
            "overflow": int(np.asarray(of)),
            "seconds_per_step": dt / (3 * n_steps), "lanes": h * w}
        print("mcmeshfused:", P["mc_mesh_fused"], flush=True)

    if "mcmeshscale" in want:
        # Scale receipts (VERDICT r4 next #2): the fused mesh-MC engine on
        # bunny+teapot-in-Cornell (11k tris, SMEM-resident) and a 164k-tri
        # scene (shortlist-streaming past the SMEM budget).
        from cpu_based_ray_tracer_tpu.ops import fused_mesh

        def scale_case(tris_np, tag, steps=16):
            scene = cornell.cornell_mesh_scene(tris_np)
            cam = cornell.cornell_camera()
            cfg = RenderConfig(width=w, height=h, spp=8, max_depth=16,
                               rr_survival=0.8)
            mp = fused_mesh.pack_mesh_scene(scene)
            rp = -(-h * w // 4096) * 4096
            kw = {"cap_main": rp // 8, "cap_shadow": rp // 16}
            st = monte_carlo.wavefront_init(scene, cam, cfg, key)
            st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
                mp, cam, cfg, key, st, steps, **kw)
            jax.block_until_ready(st.acc)
            for _ in range(4):
                if int(np.asarray(of)) == 0:
                    break
                kw = {k: min(2 * v, rp) for k, v in kw.items()}
                st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
                    mp, cam, cfg, key, st, steps, **kw)
                jax.block_until_ready(st.acc)
            r0, t0 = int(np.asarray(st.nrays)), time.perf_counter()
            for _ in range(3):
                st, of, _ = fused_mesh.wavefront_steps_fused_mesh(
                    mp, cam, cfg, key, st, steps, **kw)
            jax.block_until_ready(st.acc)
            dt = time.perf_counter() - t0
            c = mp.smc_aabb.shape[0]
            P[tag] = {
                "rays_per_s": (int(np.asarray(st.nrays)) - r0) / dt,
                "tris": int(scene.triangles.count), "clusters": c,
                "resident": bool(c * mp.cs * fused_mesh.MESH_NF * 4
                                 <= fused_mesh.SMEM_RESIDENT_BUDGET),
                "overflow": int(np.asarray(of)),
                "seconds_per_step": dt / (3 * steps)}
            print(tag + ":", P[tag], flush=True)

        src = meshes.reference_asset_dir()
        if src is not None:
            from cpu_based_ray_tracer_tpu.utils import objio
            bunny, _ = objio.load_obj(
                os.path.join(src, "stanford_bunny.obj"))
            teapot, _ = objio.load_obj(
                os.path.join(src, "utah_teapot.obj"),
                translate=(0.0, -1.0, 0.0))
            scale_case(np.concatenate([bunny * 40.0, teapot]),
                       "mc_mesh_fused_11k")
        ico = meshes.icosphere(6, radius=1.0)
        scale_case(np.concatenate(
            [ico, ico * 0.6 + np.array([1.2, 0.9, 0.3])]),
            "mc_mesh_fused_164k")

    if "denoiserfps" in want:
        # Full Denoiser-stage frame (1-SPP fused G-buffer + atrous +
        # temporal) — the real-time receipt (VERDICT r3 next #3).
        params = dmodel.DenoiserParams()
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=16,
                           rr_survival=0.8)
        step0 = jax.jit(lambda i: dmodel.render_frame(
            scene, cam, cfg, key, i, None, params, engine="fused"))
        color, prev = step0(0)
        jax.block_until_ready(color)
        step = jax.jit(lambda i, prev: dmodel.render_frame(
            scene, cam, cfg, key, i, prev, params, engine="fused"))
        color, prev = step(1, prev)
        jax.block_until_ready(color)
        t0 = time.perf_counter()
        for i in range(2, 12):
            color, prev = step(i, prev)
        jax.block_until_ready(color)
        dt = (time.perf_counter() - t0) / 10
        P["denoiser_fused_frame"] = {
            "seconds_per_frame": dt, "fps": 1.0 / dt, "lanes": h * w}
        print("denoiserfps:", P["denoiser_fused_frame"], flush=True)

    if "rtiowfused" in want:
        # Fused RTIOW kernel over both stages' headline configs: the
        # offline prototype's exact benchmark config (400x225, 100 SPP,
        # depth 50 — main.cpp:78-87) and the NPPT viewport at 256 SPP.
        from cpu_based_ray_tracer_tpu.ops import fused_rtiow
        from cpu_based_ray_tracer_tpu.scenes import rtiow as rtiow_scenes

        sc = rtiow_scenes.offline_two_sphere_scene()
        cm = rtiow_scenes.offline_camera(400 / 225)
        c1 = RenderConfig(width=400, height=225, spp=100, max_depth=50)
        # render_fused is a host-side driver (equal-spp polling loop); its
        # inner stepper is jitted.
        dt = timeit(lambda: fused_rtiow.render_fused(sc, cm, c1, key), n=3)
        P["offline_fused_400x225_100spp"] = {"seconds": dt}
        print("rtiowfused offline:", P["offline_fused_400x225_100spp"],
              flush=True)

        sc2 = rtiow_scenes.nppt_scene()
        cm2 = rtiow_scenes.nppt_camera()
        c2 = RenderConfig(width=883, height=824, spp=256, max_depth=50)
        dt2 = timeit(lambda: fused_rtiow.render_fused(sc2, cm2, c2, key),
                     n=2)
        P["nppt_fused_883x824_256spp"] = {"seconds": dt2}
        print("rtiowfused nppt:", P["nppt_fused_883x824_256spp"], flush=True)

    if "whittedfused" in want:
        # Fused Whitted ray-tree kernel (ops.fused_whitted) — the stage's
        # defining quality is interactivity (README.md:81-83); VERDICT r3
        # next #7 target: >= 15 fps at the reference viewport.
        from cpu_based_ray_tracer_tpu.ops import fused_whitted
        from cpu_based_ray_tracer_tpu.scenes import whitted_scene

        wscene = whitted_scene.whitted_scene()
        wcam = whitted_scene.whitted_camera()
        wcfg = RenderConfig(width=w, height=h)
        f = jax.jit(lambda: fused_whitted.render_fused(wscene, wcam, wcfg))
        dt = timeit(lambda: f()[0], n=10)
        P["whitted_fused"] = {"seconds_per_frame": dt, "fps": 1.0 / dt,
                              "lanes": h * w}
        print("whittedfused:", P["whitted_fused"], flush=True)

    if "packet" in want:
        # Intersector-level packet-vs-brute receipt at BVH-stage scale (the
        # "~6-7x dense brute force" claim of models/mesh.py).
        from cpu_based_ray_tracer_tpu.ops import intersect, packet as pk
        try:
            scene = meshes.bunny_teapot_scene()
        except FileNotFoundError:
            scene = meshes.bvh_stage_scene(4)
        bundle = mesh_model.prepare(scene, method="packet")
        cam = meshes.bvh_stage_camera()
        from cpu_based_ray_tracer_tpu import camera as cam_mod
        d = cam_mod.perspective_rays(cam, w, h).reshape(-1, 3)
        o = jnp.broadcast_to(cam.position, d.shape)
        tr = scene.triangles
        f_pk = jax.jit(lambda: pk.nearest(bundle.clusters, o, d, 1e-3)[0])
        f_br = jax.jit(lambda: jnp.min(intersect.triangle_t_matrix(
            o, d, tr.v0, tr.e1, tr.e2, 1e-3, jnp.inf), -1))
        sp = timeit(f_pk)
        sb = timeit(f_br)
        P["packet_vs_brute"] = {
            "packet_s": sp, "brute_s": sb, "speedup": sb / sp,
            "tris": int(tr.count), "rays": int(o.shape[0])}
        print("packet:", P["packet_vs_brute"], flush=True)

    if "packet200k" in want or (args.only is None
                                and jax.default_backend() != "cpu"):
        # At-scale streaming receipt (VERDICT r2 item 9): a 204,800-triangle
        # procedural torus — ~9.4 MB of packed triangle blocks, far beyond
        # one VMEM residency — through the streamed packet kernel.
        from cpu_based_ray_tracer_tpu.ops import packet as pk2
        from cpu_based_ray_tracer_tpu import camera as cam_mod2

        big = meshes.transform(meshes.torus(1.6, 0.6, 320, 320), 1.0,
                               (-1, 3, 0))
        t_build0 = time.perf_counter()
        clusters = pk2.build_clusters(big, cluster_size=128)
        t_build = time.perf_counter() - t_build0
        cam = meshes.bvh_stage_camera()
        d = cam_mod2.perspective_rays(cam, w, h).reshape(-1, 3)
        o = jnp.broadcast_to(cam.position, d.shape)
        f_pk = jax.jit(lambda: pk2.nearest(clusters, o, d, 1e-3)[0])
        s = timeit(f_pk)
        P["packet_200k_tris"] = {
            "seconds_per_pass": s, "tris": int(big.shape[0]),
            "clusters": int(clusters.n_clusters), "rays": int(o.shape[0]),
            "rays_per_s": o.shape[0] / s, "build_seconds": t_build}
        print("packet200k:", P["packet_200k_tris"], flush=True)

    if "whitted" in want:
        scene, cam = (whitted_scene.whitted_scene(),
                      whitted_scene.whitted_camera())
        # 16k-lane chunks + the lane cap measured fastest on v5e (r3 sweep:
        # 0.171 s/frame vs 0.512 for exact buffers at 128k chunks).
        cfg = RenderConfig(width=w, height=h, whitted_depth=5,
                           ray_chunk=1 << 14)
        fn = jax.jit(lambda: whitted.render(scene, cam, cfg))
        s = timeit(fn)
        P["whitted_render"] = {"seconds_per_frame": s, "fps": 1.0 / s,
                               "depth": 5}
        print("whitted:", P["whitted_render"], flush=True)

    if "mesh" in want:
        import dataclasses

        scene = meshes.bunny_teapot_scene()
        cam = meshes.bvh_stage_camera()
        n_tris = int(scene.triangles.count)
        for method, chunk, tag in (
                ("fused", w * h, "mesh_render"),
                ("packet", 1 << 18, "mesh_render_packet")):
            bundle = mesh_model.prepare(scene, method=method)
            cfg = RenderConfig(width=w, height=h, whitted_depth=5,
                               ray_chunk=chunk)
            n = 8

            # N frames chained INSIDE one dispatch (each frame's camera
            # nudged by an epsilon of the previous frame): the steady-state
            # interactive-loop cost, free of the tunneled chip's
            # per-dispatch round-trip (~40 ms, r5) that a per-frame timing
            # loop would charge to every frame.
            @jax.jit
            def frames(eps0, bundle=bundle, cfg=cfg):
                def body(eps, _):
                    c2 = dataclasses.replace(
                        cam, position=cam.position + eps)
                    img = mesh_model.render(bundle, c2, cfg)
                    return jnp.min(img) * 1e-12, img
                _, imgs = jax.lax.scan(body, eps0, None, length=n)
                return imgs[-1]

            img = frames(jnp.float32(0.0))
            jax.block_until_ready(img)
            t0 = time.perf_counter()
            jax.block_until_ready(frames(jnp.float32(0.0)))
            s = (time.perf_counter() - t0) / n
            P[tag] = {"seconds_per_frame": s, "fps": 1.0 / s,
                      "tris": n_tris, "method": method}
            print("mesh:", P[tag], flush=True)

    if "gradstep" in want:
        # Inverse-rendering step cost: classic reverse-scan engine vs the
        # record/replay engine (monte_carlo.render_replay, PERF.md §6.5).
        # Material-stage loops record once and replay every step; the
        # receipt reports both the per-step replay grad and the one-off
        # record pass.  Gradients are asserted equal (allclose) in-run.
        import dataclasses

        def grad_case(scene, cam, cfg, tag, isect=None, near=None,
                      isect_dif=None):
            def with_albedo(a):
                return dataclasses.replace(scene, materials=dataclasses.
                                           replace(scene.materials, albedo=a))

            def loss_std(a):
                return jnp.mean(monte_carlo.render(
                    with_albedo(a), cam, cfg, key,
                    intersect_fn=isect_dif or isect,
                    nearest_t_fn=near) ** 2)

            rec_fn = jax.jit(lambda a: monte_carlo.record_trace(
                with_albedo(a), cam, cfg, key,
                intersect_fn=isect, nearest_t_fn=near))

            def loss_rep(a, recs):
                return jnp.mean(monte_carlo.render_from_trace(
                    with_albedo(a), cam, cfg, key, recs) ** 2)

            a0 = scene.materials.albedo
            g_std = jax.jit(jax.value_and_grad(loss_std))
            g_rep = jax.jit(jax.value_and_grad(loss_rep))
            recs = jax.block_until_ready(rec_fn(a0))
            t_rec = timeit(rec_fn, a0)
            t_rep = timeit(g_rep, a0, recs)
            t_std = timeit(g_std, a0)
            v1, gr1 = g_std(a0)
            v2, gr2 = g_rep(a0, recs)
            assert np.allclose(np.asarray(gr1), np.asarray(gr2),
                               rtol=1e-4, atol=1e-6), "replay grads diverged"
            P[tag] = {"grad_std_ms": t_std * 1e3,
                      "grad_replay_ms": t_rep * 1e3,
                      "record_pass_ms": t_rec * 1e3,
                      "speedup_material_stage": t_std / t_rep,
                      "speedup_geometry_stage": t_std / (t_rep + t_rec),
                      "loss_equal": bool(np.asarray(v1) == np.asarray(v2))}
            print(tag + ":", P[tag], flush=True)

        gcfg = RenderConfig(width=448, height=448, spp=4, max_depth=8)
        grad_case(cornell.cornell_scene(), cornell.cornell_camera(), gcfg,
                  "grad_step_cornell")
        msc = cornell.cornell_mesh_scene()
        bundle = mesh_model.prepare(msc, method="packet")
        grad_case(msc, cornell.cornell_camera(),
                  RenderConfig(width=448, height=448, spp=2, max_depth=8),
                  "grad_step_mesh_bunny",
                  isect=mesh_model.make_intersect_fn(bundle, sort_rays=True),
                  near=mesh_model.make_nearest_t_fn(bundle, sort_rays=True),
                  isect_dif=mesh_model.make_intersect_fn(
                      bundle, sort_rays=True, differentiable=True))
        P["grad_step_mesh_bunny"]["tris"] = int(msc.triangles.v0.shape[0])

    if "jbf" in want or "temporal" in want:
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        cfg = RenderConfig(width=w, height=h, max_depth=16, rr_survival=0.8)
        g = dmodel.render_gbuffer(scene, cam, cfg, key, 0)
        g = jax.tree.map(jnp.asarray, g)
        if "jbf" in want:
            for k in (7, 16, 32):
                dense = jax.jit(lambda gg, kk=k: denoise.joint_bilateral(
                    gg, kk))
                fast = jax.jit(lambda gg, kk=k:
                               denoise.joint_bilateral_atrous(gg, kk))
                sd = timeit(dense, g)
                sf = timeit(fast, g)
                P[f"jbf_k{k}"] = {"dense_s": sd, "atrous_s": sf,
                                  "speedup": sd / sf}
                print(f"jbf k={k}:", P[f"jbf_k{k}"], flush=True)
        if "temporal" in want:
            tmp = jax.jit(lambda gg: denoise.temporal(gg, gg, 3, 1.0, 0.2))
            P["temporal"] = {"seconds": timeit(tmp, g)}
            print("temporal:", P["temporal"], flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

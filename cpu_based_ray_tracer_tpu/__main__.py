"""Application layer: ``python -m cpu_based_ray_tracer_tpu``.

The TPU-native equivalent of the reference's Walnut application loop
(``Walnut/EntryPoint.h:10-21`` + per-stage ``mainloop.cpp``): a headless CLI
that renders any evolution stage to PNG/PPM, runs long progressive renders
with checkpoint/resume, sweeps the Denoiser's ImGui parameter matrix
(``Denoiser/.../mainloop.cpp:17-283``), and drives a scripted fly-camera
sequence with temporal reaccumulation (``initial framework/.../
mainloop.cpp:57-66`` reaccumulate-on-move, here as an actual animation).

Subcommands
-----------
render     one image of any stage:      --stage mc --spp 256 --out img.png
           (stages: offline initial nppt whitted mesh mesh-mc mc denoiser)
           resumable MC accumulation:   --checkpoint state.npz (Ctrl-C safe)
sweep      denoiser parameter matrix -> grid of PNGs + manifest
fly        scripted WASD/mouse camera path through Cornell, denoised 1-SPP
           frames with temporal reprojection (the GIF-demo analog)
artifacts  regenerate every golden/showcase artifact (tools/make_goldens.py)
bench      the headline benchmark JSON line (bench.py)

``--cpu`` forces the CPU backend (default is whatever jax.devices() offers —
the TPU chip when tunneled).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")


def _u8(img, gamma):
    import numpy as np
    from cpu_based_ray_tracer_tpu.ops import tonemap
    return np.asarray(tonemap.quantize_u8(img, gamma))


def _write(path, u8):
    from cpu_based_ray_tracer_tpu.utils import image as im
    if path.endswith(".ppm"):
        im.write_ppm(path, u8)
    else:
        im.write_png(path, u8)
    print("wrote", path)


# ---------------------------------------------------------------------------
# Stage registry: stage name -> (render_fn(cfg, key) -> (linear_img, gamma)).
# Display conventions follow the reference: offline/NPPT gamma-correct,
# the later GUI stages display linear radiance (Renderer.cpp:130-133).
# ---------------------------------------------------------------------------

def _render_stage(stage: str, cfg, key):
    import jax.numpy as jnp
    from cpu_based_ray_tracer_tpu.models import (
        initial, mesh as mesh_model, monte_carlo, nppt, offline, whitted,
        denoiser as dmodel)
    from cpu_based_ray_tracer_tpu.scenes import (
        cornell, initial_scene, meshes, rtiow, whitted_scene)

    if stage == "offline":
        import jax
        scene = rtiow.offline_two_sphere_scene()
        cam = rtiow.offline_camera(cfg.width / cfg.height)
        if jax.default_backend() != "cpu":
            from cpu_based_ray_tracer_tpu.ops import fused_rtiow
            img = fused_rtiow.render_fused(scene, cam, cfg, key)
        else:
            img = offline.render(scene, cam, cfg, key)
        return img, cfg.gamma
    if stage == "initial":
        img = initial.render(initial_scene.initial_scene(),
                             initial_scene.initial_camera(), cfg, key)
        return img, 1.0
    if stage == "nppt":
        import jax
        if jax.default_backend() != "cpu":
            from cpu_based_ray_tracer_tpu.ops import fused_rtiow
            img = fused_rtiow.render_fused(rtiow.nppt_scene(),
                                           rtiow.nppt_camera(), cfg, key)
        else:
            img = nppt.render(rtiow.nppt_scene(), rtiow.nppt_camera(), cfg,
                              key)
        return img, cfg.gamma
    if stage == "whitted":
        img = whitted.render(whitted_scene.whitted_scene(),
                             whitted_scene.whitted_camera(), cfg)
        return img, 1.0
    if stage == "mesh":
        bundle = mesh_model.prepare(meshes.bunny_teapot_scene())
        img = mesh_model.render(bundle, meshes.bvh_stage_camera(), cfg)
        return img, 1.0
    if stage == "mesh-mc":
        import jax
        scene = cornell.cornell_mesh_scene()   # bunny (or stand-in) in box
        cam = cornell.cornell_camera()
        if jax.default_backend() != "cpu":
            from cpu_based_ray_tracer_tpu.ops import fused_mesh
            img = fused_mesh.render_turbo_mesh(scene, cam, cfg, key)
        else:
            bundle = mesh_model.prepare(scene, method="packet")
            img = mesh_model.render_mc(bundle, cam, cfg, key)
        return img, 1.0
    if stage == "mc":
        import jax
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        if jax.default_backend() != "cpu":
            # Fused Pallas engine on accelerators in EQUAL-SPP mode: the
            # reference's fixed-spp estimator, bit-compatible with the CPU
            # engines (advisor r3: render_turbo's equal-time stop rule made
            # TPU and CPU renders differ for the same seed/config).
            img = monte_carlo.render_turbo_exact(scene, cam, cfg, key)
        else:
            img = monte_carlo.render_fast(scene, cam, cfg, key)
        return img, 1.0
    if stage == "denoiser":
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        params = dmodel.DenoiserParams(jbf_half_size=16)
        prev, color = None, None
        for i in range(max(cfg.spp, 1)):   # spp doubles as history frames
            color, prev = dmodel.render_frame(scene, cam, cfg, key, i,
                                              prev, params)
        return color, 1.0
    raise SystemExit(f"unknown stage {stage!r}")


def cmd_render(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.utils import profiling
    from cpu_based_ray_tracer_tpu.utils import rng, checkpoint as ckpt

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, rr_survival=args.rr)
    key = rng.render_key(args.seed)
    log = profiling.RunLog(args.runlog)
    log.emit("render_start", stage=args.stage, config=dataclasses.asdict(cfg),
             seed=args.seed, backend=jax.default_backend())

    if args.checkpoint and args.stage == "mc":
        # Long-run progressive MC with interrupt/resume (SURVEY §5
        # failure-detection analog): accumulate in chunks, checkpoint the
        # (accum, samples_done, seed) state after each chunk.
        from cpu_based_ray_tracer_tpu.models import monte_carlo
        from cpu_based_ray_tracer_tpu.scenes import cornell
        scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
        chunk = cfg.replace(spp=min(args.checkpoint_every, cfg.spp))
        seed = rng.seed_from_key(key)
        acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        done = 0
        if os.path.exists(args.checkpoint):
            acc, done, saved_seed = ckpt.load_render_state(args.checkpoint,
                                                           chunk)
            if int(np.asarray(saved_seed)) != int(np.asarray(seed)):
                raise SystemExit(
                    f"checkpoint {args.checkpoint} was accumulated with seed "
                    f"{int(np.asarray(saved_seed))}, not --seed {args.seed} — "
                    "mixing RNG streams in one accumulator would bias the "
                    "image; pass the original seed (or a fresh path)")
            print(f"resumed at {done}/{cfg.spp} spp")
        step = jax.jit(lambda a, s: monte_carlo.render_wavefront(
            scene, cam, chunk, key, a, s))
        t0 = time.time()
        while done < cfg.spp:
            acc, done = step(acc, done)
            done = int(done)
            ckpt.save_render_state(args.checkpoint, acc, done, seed, chunk)
            log.emit("mc_chunk", spp_done=done, spp_target=cfg.spp,
                     seconds=time.time() - t0)
            print(f"{done}/{cfg.spp} spp ({time.time() - t0:.0f}s)",
                  flush=True)
        # Normalize by the sample count actually accumulated: chunks advance
        # in steps of checkpoint-every, so `done` may exceed cfg.spp (e.g.
        # --spp 50 --checkpoint-every 32 accumulates 64) and a resumed state
        # may already be past the target — dividing by cfg.spp would brighten
        # the image by done/spp.
        img, gamma = np.asarray(acc) / max(done, 1), 1.0
    else:
        t0 = time.time()
        img, gamma = _render_stage(args.stage, cfg, key)
        jax.block_until_ready(img)
        print(f"rendered {args.stage} in {time.time() - t0:.1f}s")
        log.emit("render_done", stage=args.stage, seconds=time.time() - t0)

    _write(args.out, _u8(img, gamma))
    log.close()


def cmd_sweep(args):
    """Denoiser parameter matrix (the reference's Control Panel buttons,
    ``Denoiser/.../mainloop.cpp:17-283``): JBF kernel x temporal blend x
    clamping, each re-running the 1-SPP pipeline with fresh history."""
    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.models import denoiser as dmodel
    from cpu_based_ray_tracer_tpu.scenes import cornell
    from cpu_based_ray_tracer_tpu.utils import rng

    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=args.width, height=args.height, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    manifest = {}
    for jbf in args.jbf:
        for alpha in args.alpha:
            for clamp in ([True, False] if args.clamp_ablation else [True]):
                p = dmodel.DenoiserParams(
                    jbf_half_size=jbf, current_frame_weighting=alpha,
                    immediate_clamping=clamp)
                prev, color = None, None
                for i in range(args.frames):
                    color, prev = dmodel.render_frame(scene, cam, cfg, key,
                                                      i, prev, p)
                name = f"jbf{jbf}_a{int(alpha * 100)}" + (
                    "" if clamp else "_noclamp")
                _write(os.path.join(args.outdir, name + ".png"),
                       _u8(color, 1.0))
                manifest[name] = dataclasses.asdict(p)
    with open(os.path.join(args.outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def cmd_fly(args):
    """Scripted fly-camera path: WASD/mouse input frames fed to
    FlyCameraController (``initial framework/.../Camera.cpp:23-87``), each
    pose rendered 1-SPP and temporally denoised against the moving history
    (motion-vector reprojection, ``Denoiser.h:235-328``)."""
    import numpy as np
    from cpu_based_ray_tracer_tpu import camera as cam_mod
    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.models import denoiser as dmodel
    from cpu_based_ray_tracer_tpu.scenes import cornell
    from cpu_based_ray_tracer_tpu.utils import rng

    scene = cornell.cornell_scene()
    base = cornell.cornell_camera()
    ctl = cam_mod.FlyCameraController(
        position=np.asarray(base.position, np.float64),
        forward=np.asarray(base.forward, np.float64),
        up=np.asarray(base.up, np.float64),
        vfov_degrees=float(base.vfov_degrees))
    # Scripted input: strafe right while yawing left — parallax everywhere.
    script = ([({"d"}, (0.0, 0.0))] * (args.frames // 2)
              + [({"w"}, (-2.0, 0.0))] * (args.frames - args.frames // 2))
    cameras = []
    for keys, mouse in script:
        ctl = ctl.moved(keys, mouse, dt=0.05)
        cameras.append(ctl.camera())

    cfg = RenderConfig(width=args.width, height=args.height, max_depth=16,
                       rr_survival=0.8)
    params = dmodel.DenoiserParams(jbf_half_size=args.jbf)
    frames = dmodel.render_sequence(scene, cameras, cfg,
                                    rng.render_key(args.seed), params)
    os.makedirs(args.outdir, exist_ok=True)
    for i, fr in enumerate(frames):
        _write(os.path.join(args.outdir, f"frame_{i:03d}.png"), _u8(fr, 1.0))


def cmd_artifacts(args):
    import runpy
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.argv = ["make_goldens.py", "--tier", args.tier] + (
        ["--cpu"] if args.cpu else []) + (
        ["--check"] if getattr(args, "check", False) else [])
    runpy.run_path(os.path.join(root, "tools", "make_goldens.py"),
                   run_name="__main__")


def cmd_bench(args):
    import runpy
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m cpu_based_ray_tracer_tpu",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render one stage to PNG/PPM")
    r.add_argument("--stage", default="mc",
                   choices=["offline", "initial", "nppt", "whitted", "mesh",
                            "mesh-mc", "mc", "denoiser"])
    r.add_argument("--width", type=int, default=400)
    r.add_argument("--height", type=int, default=400)
    r.add_argument("--spp", type=int, default=64)
    r.add_argument("--depth", type=int, default=16)
    r.add_argument("--rr", type=float, default=0.8)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--out", default="render.png")
    r.add_argument("--checkpoint", default=None,
                   help="npz path: MC renders resume from it if present")
    r.add_argument("--checkpoint-every", type=int, default=32,
                   help="spp per checkpointed chunk")
    r.add_argument("--runlog", default=None,
                   help="append structured JSON-lines run records here "
                        "(default: print them)")
    r.set_defaults(fn=cmd_render)

    s = sub.add_parser("sweep", help="denoiser parameter-matrix sweep")
    s.add_argument("--width", type=int, default=256)
    s.add_argument("--height", type=int, default=256)
    s.add_argument("--frames", type=int, default=8)
    s.add_argument("--jbf", type=int, nargs="+", default=[7, 16, 32])
    s.add_argument("--alpha", type=float, nargs="+", default=[0.1, 0.2, 0.5])
    s.add_argument("--clamp-ablation", action="store_true")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--outdir", default="sweep_out")
    s.set_defaults(fn=cmd_sweep)

    f = sub.add_parser("fly", help="scripted fly-camera denoised sequence")
    f.add_argument("--width", type=int, default=256)
    f.add_argument("--height", type=int, default=256)
    f.add_argument("--frames", type=int, default=16)
    f.add_argument("--jbf", type=int, default=16)
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--outdir", default="fly_out")
    f.set_defaults(fn=cmd_fly)

    a = sub.add_parser("artifacts", help="regenerate all golden artifacts")
    a.add_argument("--tier", default="test", choices=["test", "showcase",
                                                      "all"])
    a.add_argument("--check", action="store_true",
                   help="drift guard: re-render a fast showcase subset on "
                        "the current backend and compare vs the committed "
                        "artifacts (exit 1 on drift)")
    a.set_defaults(fn=cmd_artifacts)

    b = sub.add_parser("bench", help="headline benchmark JSON line")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if args.cpu:
        _force_cpu()
    args.fn(args)


if __name__ == "__main__":
    main()

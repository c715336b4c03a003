"""Headline benchmark: rays/s/chip on the Monte Carlo Cornell box.

Prints one JSON line per measured pass and the HEADLINE LAST:
{"metric": "rays_per_s_per_chip_mc_cornell", "value": N, "unit": "rays/s",
 "vs_baseline": N}.  Baseline: the reference CPU renderer sustains ~1e6
rays/s (BASELINE.md — 300 SPP in ~5 min at the 883x900 viewport on an
i9-11980HK).

Engine under test: the FUSED Pallas persistent-wavefront kernel
(``ops.fused`` — bounce loop + state resident in VMEM; see PERF.md for the
roofline).  A secondary line reports the pure-XLA wavefront stepper so an
engine-level regression cannot hide behind the kernel (and vice versa).

Ray accounting is honest: only lanes alive at each bounce (primary + shadow
+ indirect rays actually contributing to the estimator) are counted via the
engines' own counters, not the masked dead lanes.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

# Persistent compile cache: the XLA wavefront scan takes minutes to compile
# over the TPU tunnel; repeated bench runs should pay it once.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from cpu_based_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from cpu_based_ray_tracer_tpu.models import monte_carlo  # noqa: E402
from cpu_based_ray_tracer_tpu.ops import fused  # noqa: E402
from cpu_based_ray_tracer_tpu.scenes import cornell  # noqa: E402
from cpu_based_ray_tracer_tpu.utils import profiling, rng  # noqa: E402

CPU_BASELINE_RAYS_PER_S = 1.0e6


def _throughput(stepper, state, n_steps: int, n_iters: int = 5):
    """(rays/s, ms/step) of a jitted wavefront stepper."""
    import dataclasses

    state = stepper(state)
    jax.block_until_ready(state.acc)          # compile + warm-up
    # The engines' honest ray counter is i32 (fine per call, ~0.4G rays);
    # zero it after warm-up so a multi-call timing loop cannot wrap.
    state = dataclasses.replace(state, nrays=state.nrays * 0)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = stepper(state)
    jax.block_until_ready(state.acc)
    dt = time.perf_counter() - t0
    rays = int(np.asarray(state.nrays))
    if rays < 0:
        raise RuntimeError("ray counter wrapped; lower n_iters/n_steps")
    return rays / dt, dt / (n_iters * n_steps) * 1e3


def _sanity(scene):
    """On-chip numerical tripwires run before any timing (r3 lessons).

    Two silent-corruption classes were caught this round only because a
    render LOOKED wrong: MXU default-bf16 'gathers' (ops/gather.py) and an
    XLA-TPU fusion miscompile of jnp.cross+norm (ops/vec.cross).  These
    asserts re-check both on every bench run on the real backend."""
    import jax.numpy as jnp

    tr = scene.triangles
    area_host = 0.5 * np.linalg.norm(
        np.cross(np.asarray(tr.e1), np.asarray(tr.e2)), axis=-1)
    area_dev = np.asarray(jax.jit(lambda: tr.area)())
    np.testing.assert_allclose(area_dev, area_host, rtol=1e-5,
                               err_msg="triangle areas corrupt under jit "
                                       "(cross+norm fusion)")
    from cpu_based_ray_tracer_tpu.ops import gather
    table = jnp.asarray(np.linspace(0.0, 7.7, 64).reshape(16, 4),
                        jnp.float32)
    idx = jnp.asarray(np.arange(16)[::-1])
    got = np.asarray(jax.jit(lambda: gather.take_rows(table, idx))())
    np.testing.assert_array_equal(got, np.asarray(table)[::-1],
                                  err_msg="one-hot gather not bit-exact "
                                          "(MXU precision)")


def _regression_gate(fresh: dict) -> None:
    """Fail loudly when a fresh number regresses >10% vs the last committed
    round receipt (VERDICT r3 next #8 — the r1->r2 -9.7% slip went unnoticed
    for a round).  Compares against the newest BENCH_r*.json in the repo
    root; prints a PERF_REGRESSION line per offender and exits non-zero when
    BENCH_STRICT=1 (default: loud line, rc 0, so the driver still records
    the headline)."""
    import glob
    import os
    import re

    files = sorted(glob.glob(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "BENCH_r*.json")))
    if not files:
        return
    try:
        tail = json.load(open(files[-1]))["tail"]
    except Exception:
        return
    committed = {}
    for line in tail.splitlines():
        m = re.match(r"\{.*\}", line.strip())
        if not m:
            continue
        try:
            rec = json.loads(m.group(0))
            committed[rec.get("metric")] = rec.get("value")
        except Exception:
            continue
    regressed = []
    for metric, val in fresh.items():
        old = committed.get(metric)
        if old and old > 0 and val < 0.90 * old:
            regressed.append((metric, val, old))
            print(json.dumps({
                "metric": "PERF_REGRESSION", "offender": metric,
                "value": val, "committed": old,
                "ratio": round(val / old, 4), "vs": files[-1]}))
    if regressed and os.environ.get("BENCH_STRICT") == "1":
        raise SystemExit(f"perf regression >10% on {len(regressed)} "
                         f"metric(s) vs {files[-1]}")


def main():
    scene = cornell.cornell_scene()
    camera = cornell.cornell_camera()
    _sanity(scene)
    # Reference-matched workload: the 883x900 viewport (BASELINE.md), RR 0.8.
    cfg = RenderConfig(width=896, height=896, spp=4, max_depth=16,
                       rr_survival=0.8)
    key = rng.render_key(0)
    log = profiling.RunLog("bench_runs.jsonl")
    state0 = monte_carlo.wavefront_init(scene, camera, cfg, key)

    # Secondary: the XLA wavefront engine (differentiable-path twin).  Fewer
    # steps per call — its per-step cost is ~3.5x the fused kernel's and its
    # scan compiles slowly over the tunnel.
    ns_xla = 16
    xla_stepper = jax.jit(lambda st: monte_carlo.wavefront_steps(
        scene, camera, cfg, key, st, ns_xla))
    xla_rays, xla_ms = _throughput(xla_stepper, state0, ns_xla, n_iters=3)
    print(json.dumps({"metric": "mc_cornell_xla_wavefront", "value": xla_rays,
                      "unit": "rays/s", "ms_per_step": round(xla_ms, 4)}))

    # Mesh-MC secondary: the fused compaction engine over the accelerated
    # bunny-in-Cornell (the reference MC stage's BVH-backed architecture;
    # 9.2 Mray/s in r3 via the XLA+packet path).
    from cpu_based_ray_tracer_tpu.ops import fused_mesh

    mscene = cornell.cornell_mesh_scene()
    mp = fused_mesh.pack_mesh_scene(mscene)
    rp = -(-cfg.height * cfg.width // 4096) * 4096
    mstate = monte_carlo.wavefront_init(mscene, camera, cfg, key)
    mstate, mof, _ = fused_mesh.wavefront_steps_fused_mesh(
        mp, camera, cfg, key, mstate, 16, cap_main=rp // 8,
        cap_shadow=rp // 12)
    jax.block_until_ready(mstate.acc)          # compile + warm-up
    import dataclasses as _dc
    mstate = _dc.replace(mstate, nrays=mstate.nrays * 0)
    t0 = time.perf_counter()
    for _ in range(3):
        mstate, mof, _ = fused_mesh.wavefront_steps_fused_mesh(
            mp, camera, cfg, key, mstate, 16, cap_main=rp // 8,
            cap_shadow=rp // 12)
    jax.block_until_ready(mstate.acc)
    mdt = time.perf_counter() - t0
    print(json.dumps({"metric": "mc_bunny_mesh_fused",
                      "value": int(np.asarray(mstate.nrays)) / mdt,
                      "unit": "rays/s",
                      "tris": int(mscene.triangles.count),
                      "overflow": int(np.asarray(mof))}))

    # Headline: fused Pallas persistent-wavefront kernel.
    fs = fused.pack_scene(scene)
    n_steps = 256
    stepper = jax.jit(lambda st: fused.wavefront_steps_fused(
        fs, camera, cfg, key, st, n_steps))
    rays_per_s, ms = _throughput(stepper, state0, n_steps, n_iters=4)
    log.emit("bench", metric="rays_per_s_per_chip_mc_cornell",
             value=rays_per_s, ms_per_step=ms, xla_rays_per_s=xla_rays,
             backend=jax.default_backend())
    print(json.dumps({"metric": "mc_cornell_fused_ms_per_step",
                      "value": round(ms, 4), "unit": "ms"}))
    _regression_gate({"mc_cornell_xla_wavefront": xla_rays,
                      "rays_per_s_per_chip_mc_cornell": rays_per_s})
    print(json.dumps({
        "metric": "rays_per_s_per_chip_mc_cornell",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / CPU_BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()

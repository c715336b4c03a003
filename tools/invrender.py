"""Inverse-rendering example: recover the Cornell wall albedos from a render.

Renders a target Cornell image with the true materials, resets every
non-emissive albedo to grey 0.5, and runs Adam through the differentiable
MC estimator (``models.inverse``) until the wall colors come back.  Writes
target / initial / recovered images + a JSON report.

Usage: python tools/invrender.py [--cpu] [--steps 80] [--size 64]
                                 [--outdir invrender_out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--outdir", default="invrender_out")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.models import inverse, monte_carlo
    from cpu_based_ray_tracer_tpu.ops import tonemap
    from cpu_based_ray_tracer_tpu.scenes import cornell
    from cpu_based_ray_tracer_tpu.utils import image as im, rng

    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                       max_depth=4, rr_survival=0.8)
    key = rng.render_key(0)
    os.makedirs(args.outdir, exist_ok=True)

    target = monte_carlo.render(scene, cam, cfg, key)
    t0 = time.time()
    res = inverse.recover_albedo(scene, cam, cfg, key, target,
                                 n_steps=args.steps)
    dt = time.time() - t0

    true_alb = np.asarray(scene.materials.albedo)
    got_alb = np.asarray(res.params)
    losses = np.asarray(res.losses)
    err = np.abs(true_alb - got_alb)[~np.asarray(scene.materials.emissive)]
    report = {
        "steps": args.steps, "seconds": dt,
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "loss_reduction": float(losses[0] / max(losses[-1], 1e-12)),
        "albedo_true": true_alb.tolist(), "albedo_recovered": got_alb.tolist(),
        "albedo_max_abs_err": float(err.max()),
    }
    grey = inverse.render_with_albedo(
        scene, cam, cfg, key,
        np.full_like(true_alb, 0.5))
    for name, img in [("target", target), ("initial", grey),
                      ("recovered", res.image)]:
        im.write_png(os.path.join(args.outdir, name + ".png"),
                     np.asarray(tonemap.quantize_u8(img, 1.0)))
    with open(os.path.join(args.outdir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

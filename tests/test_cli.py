"""Application-layer smoke tests: the ``python -m cpu_based_ray_tracer_tpu``
CLI renders stages, checkpoints/resumes, and sweeps denoiser params
(the reference's Walnut mainloop equivalents, headless)."""

import os

import numpy as np

from cpu_based_ray_tracer_tpu.__main__ import main
from cpu_based_ray_tracer_tpu.utils import image as im


def test_cli_render_offline(tmp_path):
    out = str(tmp_path / "offline.png")
    main(["render", "--stage", "offline", "--width", "64", "--height", "36",
          "--spp", "2", "--depth", "8", "--out", out])
    img = im.read_png(out)
    assert img.shape == (36, 64, 3)
    assert img.std() > 0  # not a blank frame


def test_cli_render_mc_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "state.npz")
    out1 = str(tmp_path / "a.png")
    out2 = str(tmp_path / "b.png")
    args = ["render", "--stage", "mc", "--width", "16", "--height", "16",
            "--depth", "2", "--checkpoint", ck, "--checkpoint-every", "2"]
    main(args + ["--spp", "2", "--out", out1])
    assert os.path.exists(ck)
    # Resume on top of the saved state up to 4 spp.
    main(args + ["--spp", "4", "--out", out2])
    a = im.read_png(out1).astype(np.int32)
    b = im.read_png(out2).astype(np.int32)
    assert a.shape == b.shape == (16, 16, 3)
    assert np.abs(a - b).mean() < 64  # same scene, more samples


def test_cli_sweep(tmp_path):
    outdir = str(tmp_path / "sweep")
    main(["sweep", "--width", "16", "--height", "16", "--frames", "2",
          "--jbf", "2", "--alpha", "0.2", "--outdir", outdir])
    assert os.path.exists(os.path.join(outdir, "jbf2_a20.png"))
    assert os.path.exists(os.path.join(outdir, "manifest.json"))

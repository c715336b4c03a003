"""Multi-host simulation: a 2-process CPU ``jax.distributed`` run renders the
row-sharded Cornell image over the GLOBAL 8-device mesh (4 virtual devices per
process) and must reproduce the single-process image bit-for-bit, each process
contributing only its addressable row slabs.

This is the DCN-path analog the reference never had (it is single-process;
SURVEY §2.9) — the same shard_map renderer, a mesh that spans processes, and
gloo-backed CPU collectives standing in for ICI/DCN.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
port = sys.argv[3]; outdir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from cpu_based_ray_tracer_tpu.parallel import dist
dist.initialize(coordinator_address="localhost:" + port,
                num_processes=nproc, process_id=pid)
import numpy as np
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.parallel import render_sharded
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

assert len(jax.devices()) == 4 * nproc, len(jax.devices())
mesh = dist.global_mesh()
scene = dist.replicate(cornell.cornell_scene(), mesh)
camera = dist.replicate(cornell.cornell_camera(), mesh)
cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
img = render_sharded(scene, camera, cfg, rng.render_key(0), mesh)
jax.block_until_ready(img)

# Grad parity across processes: the mesh-wide psum of shard_map's transpose.
import jax.numpy as jnp
def loss(albedo):
    s = scene.replace(materials=scene.materials.replace(albedo=albedo))
    return jnp.mean(render_sharded(s, camera, cfg, rng.render_key(0), mesh))
g = jax.grad(loss)(scene.materials.albedo)

rows = dist.local_rows(img, mesh)
np.savez(os.path.join(outdir, f"proc{pid}.npz"),
         grad=np.asarray(jax.device_get(
             g.addressable_shards[0].data)),
         **{f"row{r}": v for r, v in rows.items()})
print("WORKER_OK", pid)
"""


def test_two_process_render_matches_single_process():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    with tempfile.TemporaryDirectory() as tmp:
        script = os.path.join(tmp, "worker.py")
        with open(script, "w") as f:
            f.write(_WORKER)
        procs = [subprocess.Popen(
            [sys.executable, script, str(i), "2", port, tmp],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0 and f"WORKER_OK {i}" in out, out[-3000:]

        # Assemble each process's row slabs; together they tile the image.
        data = [np.load(os.path.join(tmp, f"proc{i}.npz")) for i in range(2)]
        rows = {}
        for d in data:
            for k in d.files:
                if k.startswith("row"):
                    rows[int(k[3:])] = d[k]

    # Single-process reference (8 local virtual devices, same mesh size).
    from cpu_based_ray_tracer_tpu.config import RenderConfig
    from cpu_based_ray_tracer_tpu.parallel import make_mesh, render_sharded
    from cpu_based_ray_tracer_tpu.scenes import cornell
    from cpu_based_ray_tracer_tpu.utils import rng
    import jax
    import jax.numpy as jnp

    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    mesh = make_mesh(8)
    ref = np.asarray(render_sharded(scene, cam, cfg, rng.render_key(0), mesh))

    assert sorted(rows) == [0, 2, 4, 6, 8, 10, 12, 14]
    for r0, slab in rows.items():
        np.testing.assert_array_equal(slab, ref[r0:r0 + slab.shape[0]])

    # Gradients agree across processes and with the single-process run.
    def loss(albedo):
        s = scene.replace(materials=scene.materials.replace(albedo=albedo))
        return jnp.mean(render_sharded(s, cam, cfg, rng.render_key(0), mesh))
    g_ref = np.asarray(jax.grad(loss)(scene.materials.albedo))
    for d in data:
        np.testing.assert_allclose(d["grad"], g_ref, rtol=1e-5, atol=1e-7)

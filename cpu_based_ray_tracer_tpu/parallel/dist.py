"""Multi-host distribution glue.

The reference is a single-process shared-memory CPU program — its only
"communication" is the Vulkan staging-buffer upload of the finished frame
(``Walnut/Image.cpp:184-257``).  The TPU-native framework instead scales over
*processes*: ``jax.distributed`` wires the hosts of a pod slice together, the
device mesh spans every chip of every host, and the same ``shard_map``
renderers from ``parallel.shard`` run unchanged — XLA routes the collectives
over ICI within a slice and DCN across hosts.

Design contract (BASELINE "scene/BVH replicated per host"):

- every process constructs the identical scene pytree host-side (the scene
  constructors are deterministic) and ``replicate`` uploads it to every local
  device — no cross-host scene broadcast is ever needed;
- the image's row axis is sharded over the *global* mesh, so each process
  computes only its devices' row slabs; the counter-based RNG keys lanes by
  absolute pixel index, making the N-process render bit-identical to the
  1-process one (tested two-process in tests/test_distributed.py);
- scene-parameter gradients are ``psum``-ed across the global mesh by
  shard_map's transpose — the multi-host all-reduce rides DCN.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpu_based_ray_tracer_tpu.parallel.mesh import TILE_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Wire this process into the JAX distributed system.

    On Cloud TPU pods all arguments are auto-detected (call with none).  For
    the CPU-backend multi-process simulation used in tests, pass explicit
    ``coordinator_address``/``num_processes``/``process_id`` and the CPU
    collectives implementation is switched to gloo (the CPU backend's only
    cross-process collective transport).
    """
    # NB: must not touch the backend before distributed.initialize — even
    # jax.default_backend()/jax.devices() would initialize XLA and fail it.
    # Gloo is needed whenever the CPU backend will serve the collectives:
    # either explicitly requested, or (platforms unset) when the caller is
    # running the explicit-argument multi-process simulation — on a real
    # accelerator pod all arguments are auto-detected, so explicit args +
    # unset platforms means the CPU path.  Setting the CPU collectives
    # implementation is harmless if an accelerator is present.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    explicit = coordinator_address is not None
    if str(platforms).startswith("cpu") or (not platforms and explicit):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_mesh(axis: str = TILE_AXIS) -> Mesh:
    """1-D mesh over every device of every process (the tile/row axis)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def replicate(tree, mesh: Mesh):
    """Upload a host-side pytree replicated onto every device of ``mesh``.

    Works multi-process because each process holds the identical host value
    and supplies its own addressable shards.
    """
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.make_array_from_callback(
        np.shape(x), spec, lambda idx: np.asarray(x)[idx]), tree)


def local_rows(global_image, mesh: Mesh):
    """Gather this process's addressable row slabs of a row-sharded image as
    {row0: ndarray} — the per-host piece of the frame (for host-side IO)."""
    out = {}
    for shard in global_image.addressable_shards:
        row0 = shard.index[0].start or 0
        out[row0] = np.asarray(shard.data)
    return out

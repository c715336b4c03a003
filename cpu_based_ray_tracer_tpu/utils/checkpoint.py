"""Checkpoint / resume.

The reference has none: progressive accumulation lives in RAM and resets on
any resize/move (``initial framework/.../Renderer.cpp:42``).  Long renders
(the reference ran 53-minute 3000-SPP accumulations, BASELINE.md) and
inverse-rendering optimizations need durable state:

- ``save_render_state`` / ``load_render_state``: the progressive-render
  triple (accumulated radiance, samples done, RNG seed) + a config hash that
  refuses to resume across incompatible configs;
- ``save_pytree`` / ``load_pytree``: any pytree of arrays (e.g. optimizer
  state) to one npz.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import jax
import jax.numpy as jnp
import numpy as np


def config_hash(cfg) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_render_state(path, accum, samples_done: int, seed, cfg) -> None:
    np.savez_compressed(
        path, accum=np.asarray(accum),
        samples_done=np.asarray(samples_done),
        seed=np.asarray(seed),
        config_hash=np.asarray(config_hash(cfg)))


def load_render_state(path, cfg):
    """-> (accum, samples_done, seed).  Raises ValueError when the saved
    state was produced under an incompatible RenderConfig."""
    with np.load(path) as z:
        saved = str(z["config_hash"])
        if saved != config_hash(cfg):
            raise ValueError(
                f"checkpoint config hash {saved} != current "
                f"{config_hash(cfg)} — refusing to resume")
        return (jnp.asarray(z["accum"]), int(z["samples_done"]),
                jnp.asarray(z["seed"]))


def save_pytree(path, tree) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(
        path, __treedef__=np.asarray(str(treedef)),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree(path, like):
    """Restore arrays saved by ``save_pytree`` into the structure of
    ``like`` (structural template; its treedef must match)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        if str(z["__treedef__"]) != str(treedef):
            raise ValueError("pytree structure mismatch")
        saved = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, saved)

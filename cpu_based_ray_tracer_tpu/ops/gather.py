"""Gather-free lookups for tiny tables.

TPU profile fact (bench ablation, see git history): a single (R,) dynamic
gather from a small table costs ~1 ms at R ~ 800k — MORE than a fused
32-triangle intersection pass.  Scene lookups (material rows, winning
triangle attributes, light-sample rows) are gathers from tables with 4..few
thousand rows, so the hot integrators route them through a **one-hot matmul**
instead: ``onehot(idx) @ table`` runs on the MXU and fuses with its
producers.  Crossover is scene-size dependent; ``take`` picks automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this many rows the one-hot contraction's R*K FLOPs lose to a real
# gather (and the one-hot operand stops fitting nicely); measured on v5e.
ONE_HOT_MAX_ROWS = 2048

# At or below this many rows an unrolled select chain beats even the
# one-hot contraction: a single 800k-lane contraction measures ~2.8 ms on
# the v5e (r5, tools history) while K x C selects fuse into neighbors for
# ~0.1 ms.  Selects move table bits exactly, like the HIGHEST one-hot.
SELECT_MAX_ROWS = 8


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (K, C) float, idx (R,) int -> (R, C): unrolled selects for
    tiny tables, one-hot matmul for small ones, plain gather otherwise.

    precision=HIGHEST is load-bearing on the one-hot path: the TPU MXU's
    default precision multiplies in bf16, which ROUNDS THE GATHERED VALUES
    to 8 mantissa bits (r3 bug: the Cornell light's y=5.487 became 5.5,
    teleporting every NEE sample above the ceiling — every shadow ray
    occluded, near-black renders).  With HIGHEST the one-hot rows reproduce
    the f32 table bits exactly; a gather must be a gather."""
    k = table.shape[0]
    if k <= SELECT_MAX_ROWS:
        out = jnp.broadcast_to(table[0][None, :],
                               idx.shape + (table.shape[1],))
        for kk in range(1, k):
            out = jnp.where((idx == kk)[:, None], table[kk][None, :], out)
        return out
    if k > ONE_HOT_MAX_ROWS:
        return table[idx]
    oh = (idx[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :])
    return jnp.dot(oh.astype(table.dtype), table,
                   preferred_element_type=table.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def take_packed(idx: jnp.ndarray, *columns):
    """Gather several per-row attributes with ONE contraction.

    ``columns``: arrays shaped (K,) or (K, Ci), all float-castable.  Returns
    the same structure gathered at ``idx`` ((R,) / (R, Ci)), computed by
    packing into a single (K, sum Ci) table.
    """
    parts = []
    widths = []
    for c in columns:
        c2 = c[:, None] if c.ndim == 1 else c
        parts.append(c2.astype(jnp.float32))
        widths.append(c2.shape[1])
    packed = jnp.concatenate(parts, axis=1)
    out = take_rows(packed, idx)
    res = []
    off = 0
    for c, w in zip(columns, widths):
        piece = out[:, off:off + w]
        off += w
        res.append(piece[:, 0] if c.ndim == 1 else piece)
    return tuple(res)

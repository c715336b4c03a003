"""Area-light sampling.

The reference samples its single emissive mesh by descending an
area-augmented BVH with a running area budget
(``Monte Carlo Path Tracer/.../BVH.h:103-130`` + ``TriangleMesh.h:69-89``),
giving a uniform-by-area point with pdf = 1 / total_area
(``BVH.h:107``).  TPU-first replacement: a triangle-area prefix sum +
``searchsorted`` — the same distribution, O(log n), fully vectorized, and
differentiable where it matters (the sampled *location* is a fixed-barycentric
affine combination of the vertices, so geometry gradients flow; the discrete
triangle choice is detached).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.ops import gather, vec
from cpu_based_ray_tracer_tpu.scene import Scene


class LightSample(NamedTuple):
    position: jax.Array   # (R, 3)
    normal: jax.Array     # (R, 3) light-surface unit geometric normal
    emission: jax.Array   # (R, 3) radiance Le of the sampled emitter
    pdf: jax.Array        # (R,) = 1 / total emissive area
    valid: jax.Array      # (R,) bool — False when the scene has no emitter


def sample_area_light(scene: Scene, u_choice, u_tri1, u_tri2) -> LightSample:
    """Uniform-by-area samples on the scene's emissive triangles (the
    reference's ``SamplingAreaLight``, Renderer.h:163-180), one per lane.

    ``u_choice``/``u_tri1``/``u_tri2``: (R,) U[0,1) draws — triangle choice by
    area CDF and the in-triangle barycentric point.  The reference assumes
    exactly one emissive mesh; any number of emissive triangles works here
    with the same estimator (pdf = 1/total emissive area).
    """
    tr, mats = scene.triangles, scene.materials
    emissive_tri = mats.emissive[tr.material]                  # (N,)
    areas = jnp.where(emissive_tri, tr.area, 0.0)              # (N,)
    total = jnp.sum(areas)
    valid = total > 0.0

    cdf = jnp.cumsum(areas)
    # Detached discrete choice (BVH area descent in the reference);
    # searchsorted(side='right') == count of cdf entries <= budget, a dense
    # compare-reduce (cheaper than a gather-based search on TPU).
    budget = jax.lax.stop_gradient(u_choice * total)
    idx = jnp.sum(jax.lax.stop_gradient(cdf)[None, :] <= budget[:, None],
                  axis=-1)
    idx = jnp.clip(idx, 0, tr.count - 1)

    # Per-triangle emission table (tiny N-row gather from the K-row material
    # table), then ONE one-hot contraction for all per-lane rows.
    tri_emission = mats.emission[tr.material]                  # (N, 3)
    v0, e1, e2, normal, emission = gather.take_packed(
        idx, tr.v0, tr.e1, tr.e2, tr.normal, tri_emission)

    # Uniform barycentric point with the reference's parameterization
    # (TriangleMesh.h:82-86: x = 1 - sqrt(u), split remainder by v).
    w = vec.triangle_from(u_tri1, u_tri2)                      # (R, 3)
    p = v0 + w[:, 1:2] * e1 + w[:, 2:3] * e2
    # (w0*A + w1*B + w2*C == v0 + w1*e1 + w2*e2)

    n = u_choice.shape[0]
    return LightSample(
        position=p,
        normal=normal,
        emission=emission,
        pdf=jnp.where(valid, 1.0 / jnp.maximum(total, 1e-20), 0.0)
            * jnp.ones((n,), v0.dtype),
        valid=valid & jnp.ones((n,), bool),
    )

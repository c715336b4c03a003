"""Unified render configuration.

The reference has three generations of configuration (SURVEY.md §5): the
offline ``#define`` control panel (``offline prototype/.../main.cpp:15-22``),
the NPPT mutable global singletons (``NPPTToolbox.h:34-44``), and the
Denoiser's ImGui bool matrix (``Denoiser/.../Renderer.h:35-59``).  Here it is
one frozen (hashable, jit-static) dataclass.
"""

from __future__ import annotations

import dataclasses

from cpu_based_ray_tracer_tpu.scene import DIFFUSE_ON_SPHERE


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 400
    height: int = 225
    spp: int = 8
    # RTIOW stages use bounce depth 50 (main.cpp / NPPTToolbox.h:52); Whitted
    # uses 5 (World.h:54); MC uses unbounded RR recursion which we truncate at
    # a fixed scan depth (0.8^16 ~ 2.8% residual paths; raise for goldens).
    max_depth: int = 50
    # Shadow-acne offset: RTIOW t_min 0.001 (main.cpp ShadowAcneElimination /
    # NPPTToolbox.h:51); Whitted/MC offset the origin by 1e-5
    # (WhittedUtilities.h:18 INTERSECTION_CORRECTION).
    t_min: float = 1e-3
    eps_offset: float = 1e-5
    gamma: float = 2.0
    diffuse_model: int = DIFFUSE_ON_SPHERE  # main.cpp:19 DiffuseMode
    # Monte Carlo stage:
    rr_survival: float = 0.8  # Monte Carlo .../Renderer.h:199 (UI: 0.5/0.8/0.9)
    shadow_tolerance: float = 1e-2  # Renderer.cpp:186 "+ 0.01f"
    # Differentiable visibility: 0 = the reference's hard shadow test; > 0 =
    # sigmoid-relaxed NEE visibility with this temperature (world units) so
    # occluder-geometry gradients flow through the shadow term.
    soft_shadow_beta: float = 0.0
    # Whitted stage:
    whitted_depth: int = 5      # World.h:54 max_bounce_depth
    # Ray-tree lane cap, in multiples of the pixel count: level k's lane
    # buffer is min(2^k, whitted_lane_cap) * n_pixels, with live lanes
    # compacted to the front by Fresnel weight.  The reference evaluates the
    # full 2^depth tree (Renderer.h:226-251); only glass/mirror hits spawn,
    # so live lanes stay ~O(n_pixels) and the cap never binds on the
    # reference scenes (asserted in tests/test_whitted.py).  If a glass-heavy
    # scene exceeds it, the lowest-weight lanes are truncated (an explicit
    # approximation knob like the depth cap itself).  0 = exact 2^depth
    # buffers (the oracle).
    whitted_lane_cap: int = 2
    # Engine knobs (no analogue in the reference):
    # 0 = auto: the Whitted stage chunks at min(h*w, 16384) lanes (measured
    # fastest on v5e; knife-edge lanes may differ by 1 ulp vs unchunked —
    # tests/test_whitted.py), other stages take the whole image at once.
    # Any other value = rays per chunk everywhere.
    ray_chunk: int = 0

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

"""Device-mesh sharding and multi-host helpers.

The reference's only parallelism is a per-pixel ``std::for_each(std::execution
::par)`` thread fan-out on one CPU (``offline prototype/.../main.cpp:157-183``;
``Denoiser/.../Renderer.cpp:238-248``).  The TPU-native analog implemented
here: the pixel/tile axis is sharded over a ``jax.sharding.Mesh`` with
``shard_map`` (scene/BVH replicated, as the BASELINE prescribes), samples are
scanned on-chip, and scene-parameter gradients are ``psum``-ed across the mesh
during the backward pass.
"""

from cpu_based_ray_tracer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicated, row_sharded)
from cpu_based_ray_tracer_tpu.parallel.shard import (  # noqa: F401
    render_sharded, render_tiles, wavefront_init_sharded,
    wavefront_steps_sharded)

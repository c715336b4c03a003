import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng

scene = cornell.cornell_scene(); camera = cornell.cornell_camera()
cfg = RenderConfig(width=48, height=48, spp=2, max_depth=6)
key = rng.render_key(7)
a = np.asarray(monte_carlo.render(scene, camera, cfg, key))
b = np.asarray(monte_carlo.render_replay(scene, camera, cfg, key))
d = np.abs(a - b)
bad = np.argwhere(d.max(-1) > 0)
print("nbad:", len(bad), "maxdiff:", d.max())
if len(bad):
    y, x = bad[0]
    print("first bad pixel", y, x, a[y, x], b[y, x])
    # per-sample trace compare on that pixel lane
    seed = rng.seed_from_key(key)
    for s in range(cfg.spp):
        o, dd, pixel = monte_carlo._primary_rays(camera, cfg, seed, s)
        r1 = monte_carlo.trace(scene, o, dd, cfg, seed=seed, pixel=pixel, sample=s)
        _, rec = monte_carlo.trace(scene, o, dd, cfg, seed=seed, pixel=pixel, sample=s, return_record=True)
        r2 = monte_carlo.trace(scene, o, dd, cfg, seed=seed, pixel=pixel, sample=s, record=rec)
        lane = y * cfg.width + x
        print("s", s, np.asarray(r1[lane]), np.asarray(r2[lane]),
              "rec prim/is_tri/hit/vis per bounce:",
              np.asarray(rec.prim[:, lane]), np.asarray(rec.is_triangle[:, lane]),
              np.asarray(rec.hit[:, lane]), np.asarray(rec.visible[:, lane]))

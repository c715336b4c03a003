"""Monte Carlo over accelerated meshes (VERDICT r2 item 3).

The reference's MC stage traces every path and shadow ray through its BVH
(``Monte Carlo Path Tracer/.../Renderer.cpp:41,183-184``); these tests pin
our equivalent: the MC estimator driven through the packet-culled Pallas
intersector (``models.mesh``) on the bunny-in-Cornell scene must agree with
dense brute force, and must be bit-identical under row sharding.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import mesh as mesh_model
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.parallel import mesh as pmesh
from cpu_based_ray_tracer_tpu.parallel import shard
from cpu_based_ray_tracer_tpu.scenes import cornell, meshes
from cpu_based_ray_tracer_tpu.utils import rng


def _scene():
    # Icosphere stand-in keeps the test hermetic (no reference checkout);
    # 320 triangles + 22 box triangles exercises multi-cluster culling.
    return cornell.cornell_mesh_scene(meshes.icosphere(2, radius=1.0))


def test_cornell_mesh_scene_shape():
    scene = _scene()
    assert scene.triangles.count == 22 + 320
    # The mesh stands on the floor inside the box (scaled units).
    v0 = np.asarray(scene.triangles.v0[22:])
    assert v0[:, 1].min() > -1e-6
    assert v0[:, 1].max() < 2.0
    assert 0.0 < v0[:, 0].min() and v0[:, 0].max() < 5.56


def test_mc_mesh_packet_matches_brute():
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=48, height=48, spp=2, max_depth=3,
                       rr_survival=0.8)
    key = rng.render_key(11)
    brute = mesh_model.prepare(scene, method="brute")
    packet = mesh_model.prepare(scene, method="packet", cluster_size=64)
    a = np.asarray(mesh_model.render_mc(brute, cam, cfg, key))
    b = np.asarray(mesh_model.render_mc(packet, cam, cfg, key))
    # Same Möller-Trumbore formulation in both intersectors -> same hits;
    # only reduction order may differ.
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_mc_mesh_sharded_equals_unsharded():
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=2, max_depth=3,
                       rr_survival=0.8)
    key = rng.render_key(5)
    bundle = mesh_model.prepare(scene, method="packet", cluster_size=64)
    ifn = mesh_model.make_intersect_fn(bundle)
    nfn = mesh_model.make_nearest_t_fn(bundle)

    st0 = mc.wavefront_init(scene, cam, cfg, key)
    ref = mc.wavefront_steps(scene, cam, cfg, key, st0, 4,
                             intersect_fn=ifn, nearest_t_fn=nfn)

    m = pmesh.make_mesh()
    st_sh = shard.wavefront_init_sharded(scene, cam, cfg, key, m)
    out = shard.wavefront_steps_sharded(scene, cam, cfg, key, st_sh, 4, m,
                                        intersect_fn=ifn, nearest_t_fn=nfn)
    np.testing.assert_array_equal(np.asarray(ref.n_done),
                                  np.asarray(out.n_done))
    np.testing.assert_array_equal(np.asarray(ref.acc), np.asarray(out.acc))
    assert int(ref.nrays) == int(out.nrays)


def test_mc_mesh_energy_sane():
    # The bunny-in-Cornell render must light up like the box render: nonzero
    # radiance everywhere the box is visible, no NaN/inf anywhere.
    scene = _scene()
    cam = cornell.cornell_camera()
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=4,
                       rr_survival=0.8)
    img = np.asarray(mesh_model.render_mc(
        mesh_model.prepare(scene, method="packet", cluster_size=64),
        cam, cfg, rng.render_key(2)))
    assert np.isfinite(img).all()
    assert img.max() > 0.05

"""Monte Carlo Cornell-box stage: estimator, light sampling, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.ops import sampling
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import rng


def test_light_sampling_uniform_on_light():
    scene = cornell.cornell_scene()
    u = jax.random.uniform(jax.random.key(0), (3, 4096))
    ls = sampling.sample_area_light(scene, u[0], u[1], u[2])
    p = np.asarray(ls.position)
    assert bool(np.asarray(ls.valid).all())
    # All samples on the light quad: y = 5.487, x in [2.13, 3.43],
    # z in [2.27, 3.32] (light.obj coords * 0.01).
    np.testing.assert_allclose(p[:, 1], 5.487, atol=1e-5)
    assert p[:, 0].min() >= 2.13 - 1e-5 and p[:, 0].max() <= 3.43 + 1e-5
    assert p[:, 2].min() >= 2.27 - 1e-5 and p[:, 2].max() <= 3.32 + 1e-5
    # pdf = 1 / light area; area = 1.30 * 1.05 (scaled).
    np.testing.assert_allclose(np.asarray(ls.pdf), 1.0 / (1.30 * 1.05),
                               rtol=1e-4)
    # Uniformity: mean near the quad center, both halves equally likely.
    np.testing.assert_allclose(p[:, 0].mean(), (2.13 + 3.43) / 2, atol=0.02)
    np.testing.assert_allclose(p[:, 2].mean(), (2.27 + 3.32) / 2, atol=0.02)
    # Emission is the light material's radiance (Renderer.cpp:34).
    np.testing.assert_allclose(np.asarray(ls.emission)[0], (47.8, 38.6, 31.1),
                               rtol=1e-6)


def test_cornell_render_look():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=64, height=64, spp=16, max_depth=6)
    img = np.asarray(jax.jit(
        lambda k: monte_carlo.render(scene, cam, cfg, k))(rng.render_key(0)))
    assert np.isfinite(img).all() and (img >= 0).all()
    h, w, _ = img.shape
    left = img[h // 2, 2:8].mean(0)     # red wall
    right = img[h // 2, -8:-2].mean(0)  # green wall
    assert left[0] > left[1] and left[0] > left[2]
    assert right[1] > right[0] and right[1] > right[2]
    # The ceiling light region is the brightest thing in the image.
    assert img.max() > 5.0  # emission 47.8 where the light is visible
    # Interior is lit (direct NEE contributes even at 6 bounces).
    assert img[h // 2, w // 2].mean() > 0.05


def test_emitter_only_on_primary():
    """A primary ray hitting the emitter returns exactly its emission and is
    done (Renderer.cpp:151-161): deeper scans add nothing for that ray."""
    scene = cornell.cornell_scene()
    cam = cornell.cornell_camera()
    # Aim at a point well inside one light triangle (the exact quad center
    # lies on the triangulation diagonal — a seam where fp contraction can
    # let the ray slip between both triangles).
    target = jnp.array([2.9, 5.487, 2.9])
    o = cam.position[None, :]
    d = (target - cam.position)[None, :]
    d = d / jnp.linalg.norm(d)
    seed = rng.seed_from_key(rng.render_key(1))
    pix = jnp.zeros((1,), jnp.uint32)
    r1 = np.asarray(monte_carlo.trace(scene, o, d, RenderConfig(max_depth=1),
                                      seed=seed, pixel=pix, sample=0))
    r4 = np.asarray(monte_carlo.trace(scene, o, d, RenderConfig(max_depth=4),
                                      seed=seed, pixel=pix, sample=0))
    np.testing.assert_allclose(r1[0], (47.8, 38.6, 31.1), rtol=1e-5)
    np.testing.assert_array_equal(r1, r4)


def test_deeper_bounces_add_energy():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    base = RenderConfig(width=24, height=24, spp=64)
    key = rng.render_key(2)
    m1 = np.asarray(monte_carlo.render(scene, cam, base.replace(max_depth=2),
                                       key)).mean()
    m2 = np.asarray(monte_carlo.render(scene, cam, base.replace(max_depth=8),
                                       key)).mean()
    assert m2 > m1


def test_material_gradients_vs_finite_diff():
    """BASELINE metric: pixel gradients w.r.t. material albedo match finite
    differences.  Same RNG key on both sides -> the estimator is a smooth
    function of the albedo and grads must match to fd accuracy."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=12, height=12, spp=8, max_depth=3)
    key = rng.render_key(3)

    def loss(albedo):
        s = scene.replace(materials=scene.materials.replace(albedo=albedo))
        img = monte_carlo.render(s, cam, cfg, key)
        return jnp.mean(img)

    a0 = scene.materials.albedo
    g = np.asarray(jax.grad(loss)(a0))
    assert np.isfinite(g).all()
    eps = 1e-3
    for (i, j) in [(0, 0), (1, 0), (2, 1), (3, 2)]:
        ap = a0.at[i, j].add(eps)
        am = a0.at[i, j].add(-eps)
        fd = (loss(ap) - loss(am)) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=1e-5)


def test_wavefront_matches_scan_engine():
    """The equal-spp wavefront engine traces bit-identical paths to the scan
    engine (counter-based RNG) — images agree to summation-order rounding."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=24, height=16, spp=3, max_depth=5)
    key = rng.render_key(5)
    a = np.asarray(monte_carlo.render(scene, cam, cfg, key))
    b = np.asarray(monte_carlo.render_fast(scene, cam, cfg, key))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_wavefront_ray_count_matches_scan():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=5)
    key = rng.render_key(6)
    n_scan = int(np.asarray(monte_carlo.count_rays(scene, cam, cfg, key)))
    _, _, n_wf = monte_carlo.render_wavefront(
        scene, cam, cfg, key, jnp.zeros((16, 16, 3)), 0, return_rays=True)
    assert int(np.asarray(n_wf)) == n_scan


def test_persistent_stepper_converges_to_scan():
    """Equal-time stepper: per-pixel mean over completed samples converges to
    the scan engine's estimate (same estimator, different lane scheduling)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=24, height=24, spp=48, max_depth=6)
    key = rng.render_key(7)
    st = monte_carlo.wavefront_init(scene, cam, cfg, key)
    st = monte_carlo.wavefront_steps(scene, cam, cfg, key, st, 160)
    assert int(np.asarray(st.n_done).min()) >= 1
    img = np.asarray(monte_carlo.wavefront_image(st, cfg))
    ref = np.asarray(monte_carlo.render(scene, cam, cfg, key))
    assert np.isfinite(img).all()
    # Same-mean check at matched sample counts (MC noise-limited tolerance).
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.05)


def test_stepper_state_carries_across_calls():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4)
    key = rng.render_key(8)
    one = monte_carlo.wavefront_steps(
        scene, cam, cfg, key, monte_carlo.wavefront_init(scene, cam, cfg, key),
        20)
    two = monte_carlo.wavefront_init(scene, cam, cfg, key)
    for _ in range(4):
        two = monte_carlo.wavefront_steps(scene, cam, cfg, key, two, 5)
    np.testing.assert_allclose(np.asarray(one.acc), np.asarray(two.acc),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(one.n_done),
                                  np.asarray(two.n_done))


def test_emission_gradient():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=2)
    key = rng.render_key(4)

    def loss(em):
        s = scene.replace(materials=scene.materials.replace(emission=em))
        return jnp.mean(monte_carlo.render(s, cam, cfg, key))

    e0 = scene.materials.emission
    g = np.asarray(jax.grad(loss)(e0))
    assert np.isfinite(g).all()
    # Brightening the light brightens the image.
    assert g[3].sum() > 0


def test_depth_truncation_bias_negligible():
    """Validates the documented truncation claim (monte_carlo.py module doc):
    the residual path mass beyond cfg.max_depth=16 carries negligible ENERGY.
    Same seed => identical paths up to the cap, so the depth-28 render minus
    the depth-16 render IS the truncated tail's contribution."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    key = rng.render_key(7)
    base = RenderConfig(width=24, height=24, spp=32, rr_survival=0.8)
    img16 = np.asarray(monte_carlo.render(scene, cam,
                                          base.replace(max_depth=16), key))
    img28 = np.asarray(monte_carlo.render(scene, cam,
                                          base.replace(max_depth=28), key))
    rel = np.abs(img28 - img16).mean() / max(img28.mean(), 1e-9)
    assert rel < 0.005, f"depth-16 truncation loses {rel:.2%} of energy"

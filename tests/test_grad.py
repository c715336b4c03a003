"""Gradient coverage to the BASELINE metric: pixel gradients w.r.t.
geometry / materials / camera vs finite differences (VERDICT r1 item 3;
material/emission grads live in test_mc.py since round 1).

Finite-difference caveat: under a FIXED rng key, hard visibility is a step
function of geometry/camera — an fd probe that slides a silhouette or
shadow edge across any sample measures the (huge) boundary term, which the
interior autodiff gradient correctly excludes (measured: light
y-translation fd = -49 vs interior ad = +0.003 — the light quad crossing
the ceiling plane).  So each fd gate below uses a *flip-free* direction
(motion parallel to the nearby surfaces / toward a wall / pure zoom), where
ad and fd agree to ~1% (validated; see the per-test picks).  The boundary
term itself is exercised through the differentiable-visibility estimator
(``cfg.soft_shadow_beta``), whose loss is smooth end to end, so its fd
matches ad everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo, offline
from cpu_based_ray_tracer_tpu.scenes import cornell, rtiow
from cpu_based_ray_tracer_tpu.utils import rng


def _fd(loss, x0, eps):
    lj = jax.jit(loss)
    return float(lj(x0 + eps) - lj(x0 - eps)) / (2 * eps)


# --------------------------------------------------------------------------
# Camera gradients (pose + intrinsics) through the MC renderer.
# --------------------------------------------------------------------------

def _cam_loss(scene, cam, cfg, key):
    def loss(pos, vfov):
        c = cam_mod.PerspectiveCamera(position=pos, forward=cam.forward,
                                      up=cam.up, vfov_degrees=vfov)
        return jnp.mean(monte_carlo.render(scene, c, cfg, key))
    return loss


def test_camera_position_gradient_vs_fd():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=10, height=10, spp=4, max_depth=2)
    key = rng.render_key(11)
    loss = _cam_loss(scene, cam, cfg, key)

    g = np.asarray(jax.grad(loss, argnums=0)(cam.position,
                                             cam.vfov_degrees))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # Flip-free fd direction: dolly along the (almost-z) view axis — the
    # Cornell walls stay on the same pixels.  x/y pans slide silhouettes
    # across samples and measure the boundary term instead.
    fd = _fd(lambda z: loss(cam.position.at[2].set(z), cam.vfov_degrees),
             cam.position[2], 2e-3)
    np.testing.assert_allclose(g[2], fd, rtol=5e-2, atol=1e-5)


def test_camera_vfov_gradient_vs_fd():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=10, height=10, spp=4, max_depth=2)
    key = rng.render_key(12)
    loss = _cam_loss(scene, cam, cfg, key)

    g = jax.grad(loss, argnums=1)(cam.position, cam.vfov_degrees)
    fd = _fd(lambda v: loss(cam.position, v), cam.vfov_degrees, 1e-2)
    np.testing.assert_allclose(float(g), fd, rtol=8e-2, atol=1e-5)


# --------------------------------------------------------------------------
# Light geometry gradient: translate the emissive quad's vertices through
# sample_area_light (Renderer.h:163-180) AND the emitter's own geometry.
# --------------------------------------------------------------------------

def _translate_masked(scene, mask, tvec):
    tr = scene.triangles
    shift = jnp.where(mask[:, None], 1.0, 0.0) * tvec
    return scene.replace(triangles=tr.replace(v0=tr.v0 + shift))


def test_light_translation_gradient_vs_fd():
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=10, height=10, spp=4, max_depth=2)
    key = rng.render_key(13)
    is_em = scene.materials.emissive[scene.triangles.material]

    def loss(t):
        return jnp.mean(monte_carlo.render(
            _translate_masked(scene, is_em, t), cam, cfg, key))

    t0 = jnp.zeros(3, jnp.float32)
    g = np.asarray(jax.grad(loss)(t0))
    assert np.isfinite(g).all()
    # Flip-free directions: slide the light IN its plane (x/z).  Validated
    # ad vs fd: x -0.001784 / -0.001796, z 0.005085 / 0.005111.  The
    # y (off-plane) fd measures the ceiling-crossing boundary term (-49!).
    for i in (0, 2):
        fd = _fd(lambda v, i=i: loss(t0.at[i].set(v)), t0[i], 2e-3)
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-5)


# --------------------------------------------------------------------------
# Sphere geometry gradients (RTIOW/offline stage): center and radius flow
# through the analytic quadratic hit (Sphere.cpp:13-43 math).  Probed with
# interior rays (silhouette-safe) straight through trace().
# --------------------------------------------------------------------------

def _interior_rays():
    # 8 rays from the origin into the middle of the RED sphere (center
    # (+r, 0, -1), r = cos(pi/4)): never within 0.3 of its silhouette.
    # The red sphere: its albedo (1,0,0) passes the sky's RED channel,
    # which varies with direction (the white->blue lerp) — the blue
    # sphere's (0,0,1) would pass only the constant-1 blue channel and
    # make every direction gradient legitimately zero.
    r = float(np.cos(np.pi / 4.0))
    targets = np.array([[r + 0.1 * i, 0.05 * j, -1.0]
                        for i in (-1, 0, 1, 2) for j in (-1, 1)], np.float32)
    d = targets / np.linalg.norm(targets, axis=-1, keepdims=True)
    o = np.zeros_like(d)
    return jnp.asarray(o), jnp.asarray(d)


def test_sphere_geometry_gradient_vs_fd():
    scene = rtiow.offline_two_sphere_scene()
    cfg = RenderConfig(width=8, height=1, spp=1, max_depth=2)
    o, d = _interior_rays()
    seed = rng.seed_from_key(rng.render_key(14))
    pixel = jnp.arange(o.shape[0], dtype=jnp.uint32)

    def loss_center(cx):
        centers = scene.spheres.center.at[1, 0].set(cx)
        s = scene.replace(spheres=scene.spheres.replace(center=centers))
        return jnp.mean(offline.trace(s, o, d, cfg, seed=seed, pixel=pixel,
                                      sample=0))

    c0 = scene.spheres.center[1, 0]
    g = jax.grad(loss_center)(c0)
    fd = _fd(loss_center, c0, 1e-3)
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6
    np.testing.assert_allclose(float(g), fd, rtol=5e-2, atol=1e-6)

    def loss_radius(r0):
        radii = scene.spheres.radius.at[1].set(r0)
        s = scene.replace(spheres=scene.spheres.replace(radius=radii))
        return jnp.mean(offline.trace(s, o, d, cfg, seed=seed, pixel=pixel,
                                      sample=0))

    rr = scene.spheres.radius[1]
    g = jax.grad(loss_radius)(rr)
    fd = _fd(loss_radius, rr, 1e-3)
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6
    np.testing.assert_allclose(float(g), fd, rtol=5e-2, atol=1e-6)


# --------------------------------------------------------------------------
# Differentiable visibility: the edge-relaxed soft-shadow estimator.
# --------------------------------------------------------------------------

def _tall_box_mask(scene):
    # The tall box is the last 10 triangles by construction
    # (scenes/cornell.py: boxes appended after walls, short box first).
    n = scene.triangles.count
    return jnp.arange(n) >= n - 10


def test_soft_shadow_beta_zero_limit():
    """beta -> 0 recovers the reference's hard-shadow image (up to the
    ~beta-wide penumbra band)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    key = rng.render_key(15)
    hard = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    soft = hard.replace(soft_shadow_beta=1e-4)
    a = np.asarray(monte_carlo.render(scene, cam, hard, key))
    b = np.asarray(monte_carlo.render(scene, cam, soft, key))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_soft_shadow_occluder_gradient_vs_fd():
    """The occluder-geometry gradient through the shadow term: nonzero,
    and — because the soft loss is smooth end to end — fd matches ad even
    though this is exactly the boundary term the hard estimator cannot see
    (validated ad 0.004825 vs fd 0.004798 at beta 0.15)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=16, height=16, spp=4, max_depth=2,
                       soft_shadow_beta=0.15)
    key = rng.render_key(16)
    mask = _tall_box_mask(scene)

    def loss(tx):
        t = tx * jnp.asarray([1.0, 0.0, 0.0])
        return jnp.mean(monte_carlo.render(
            _translate_masked(scene, mask, t), cam, cfg, key))

    g = jax.grad(loss)(jnp.float32(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-5
    fd = _fd(loss, jnp.float32(0.0), 1e-3)
    np.testing.assert_allclose(float(g), fd, rtol=5e-2, atol=1e-5)

    # The hard estimator's gradient exists (interior term) but carries no
    # occluder-visibility signal; it must at least stay finite.
    g_hard = jax.grad(
        lambda tx: jnp.mean(monte_carlo.render(
            _translate_masked(scene, mask, tx * jnp.asarray([1., 0., 0.])),
            cam, cfg.replace(soft_shadow_beta=0.0), key)))(jnp.float32(0.0))
    assert np.isfinite(float(g_hard))

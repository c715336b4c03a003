"""Cameras and ray generation.

Two camera models cover every stage of the reference:

- ``ThinLensCamera``: the RTIOW look-from/look-at camera with aperture/DoF of
  the offline prototype (``offline prototype/.../Camera.h:29-62``).
- ``PerspectiveCamera``: the interactive GUI camera.  The reference precomputes
  a per-pixel world-space ray-direction *buffer* on the host every frame
  (``initial framework/.../Camera.cpp:115-132``); TPU-first we instead compute
  directions inside the jitted ray-gen from the inverse projection/view
  transform — no host buffer, no HBM round trip, and the per-frame pixel jitter
  of the MC stage (``Monte Carlo Path Tracer/.../Camera.cpp:121``) is just a
  fresh RNG fold-in.

Image convention: row 0 is the TOP scanline.  (The reference stores row 0 at
NDC y=-1 and flips at display time; we bake the flip into ray-gen so arrays are
viewable directly.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpu_based_ray_tracer_tpu.ops import vec
from cpu_based_ray_tracer_tpu.scene import _pytree


@_pytree
class ThinLensCamera:
    """RTIOW thin-lens camera (reference ``offline prototype/.../Camera.h:29-62``).

    focus distance = |look_at - look_from| as in the reference (Camera.h:44);
    aperture 0 disables DoF (config flag ``DepthOfField`` at main.cpp:20).
    """

    origin: jax.Array            # (3,)
    lower_left: jax.Array        # (3,) lower-left corner of the image plane
    horizontal: jax.Array        # (3,) full-width image-plane vector
    vertical: jax.Array          # (3,) full-height image-plane vector
    u: jax.Array                 # (3,) camera basis (right)
    v: jax.Array                 # (3,) camera basis (up)
    lens_radius: jax.Array       # () aperture / 2


def make_thin_lens_camera(look_from, look_at, up, vfov_degrees, aspect_ratio,
                          aperture=0.0, dtype=jnp.float32) -> ThinLensCamera:
    look_from = np.asarray(look_from, np.float64)
    look_at = np.asarray(look_at, np.float64)
    up = np.asarray(up, np.float64)
    theta = np.radians(vfov_degrees)
    half_h = np.tan(theta / 2.0)
    half_w = aspect_ratio * half_h
    w = look_from - look_at
    focus = np.linalg.norm(w)
    w = w / focus
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    origin = look_from
    lower_left = origin - half_w * focus * u - half_h * focus * v - focus * w
    return ThinLensCamera(
        origin=jnp.asarray(origin, dtype),
        lower_left=jnp.asarray(lower_left, dtype),
        horizontal=jnp.asarray(2 * half_w * focus * u, dtype),
        vertical=jnp.asarray(2 * half_h * focus * v, dtype),
        u=jnp.asarray(u, dtype), v=jnp.asarray(v, dtype),
        lens_radius=jnp.asarray(aperture / 2.0, dtype),
    )


def thin_lens_rays(cam: ThinLensCamera, s: jax.Array, t: jax.Array,
                   lens_u1: jax.Array, lens_u2: jax.Array):
    """Rays for image-plane coords s,t in [0,1] (any broadcastable shape).

    Mirrors ``Camera::extract_ray`` (offline prototype/.../Camera.h:56-62):
    origin jittered on the lens disk, direction to the focus-plane point.
    ``s`` runs left->right, ``t`` runs bottom->top as in RTIOW.
    ``lens_u1``/``lens_u2``: U[0,1) draws for the aperture disk sample.
    """
    disk = vec.disk_from(lens_u1, lens_u2) * cam.lens_radius
    offset = cam.u * disk[..., 0:1] + cam.v * disk[..., 1:2]
    origin = cam.origin + offset
    target = (cam.lower_left + s[..., None] * cam.horizontal
              + t[..., None] * cam.vertical)
    return origin, vec.normalize(target - origin)


@_pytree
class PerspectiveCamera:
    """GUI fly-camera pose.  Only the pose is a pytree; width/height are static
    arguments of the ray-gen so re-rendering after a camera move does not
    retrace (the reference instead recomputes a host-side direction buffer,
    ``initial framework/.../Camera.cpp:115-132``)."""

    position: jax.Array  # (3,)
    forward: jax.Array   # (3,) unit
    up: jax.Array        # (3,) unit (world up)
    vfov_degrees: jax.Array  # ()


def make_perspective_camera(position, forward, up=(0.0, 1.0, 0.0),
                            vfov_degrees=45.0, dtype=jnp.float32
                            ) -> PerspectiveCamera:
    fwd = np.asarray(forward, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    return PerspectiveCamera(
        position=jnp.asarray(position, dtype),
        forward=jnp.asarray(fwd, dtype),
        up=jnp.asarray(np.asarray(up, np.float64), dtype),
        vfov_degrees=jnp.asarray(vfov_degrees, dtype),
    )


def camera_basis(cam: PerspectiveCamera):
    """Right/up'/forward orthonormal basis (glm::lookAt convention,
    ``Monte Carlo Path Tracer/.../Camera.cpp:110``)."""
    right = vec.normalize(vec.cross(cam.forward, cam.up))
    true_up = vec.cross(right, cam.forward)
    return right, true_up, cam.forward


def perspective_rays(cam: PerspectiveCamera, width: int, height: int,
                     jitter: jax.Array | None = None):
    """World-space unit ray directions for every pixel, (H, W, 3).

    Equivalent to the reference's NDC -> inverse-projection -> normalize ->
    inverse-view chain (``Monte Carlo Path Tracer/.../Camera.cpp:113-131``):
    for glm::perspectiveFov the camera-space direction reduces to
    ``(ndc_x * tan(vfov/2) * aspect, ndc_y * tan(vfov/2), -1)`` — the near/far
    clip planes cancel under normalization.

    ``jitter``: (H, W, 2) uniforms in [0,1) for in-pixel MSAA jitter (the MC
    stage jitters every frame, Camera.cpp:121); None = pixel centers (the
    Denoiser stage uses centers, ``Denoiser/.../Camera.cpp:132-133``).
    """
    return perspective_rays_slab(cam, width, height, 0, height, jitter)


def perspective_rays_slab(cam: PerspectiveCamera, width: int, height: int,
                          row0: int, n_rows: int,
                          jitter: jax.Array | None = None):
    """Ray directions for the row slab [row0, row0 + n_rows) of a
    width x height image, (n_rows, W, 3).  Used by the row-sharded renderer;
    ``perspective_rays`` is the full-image special case."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(n_rows, dtype=jnp.float32) + row0
    xx, yy = jnp.meshgrid(x, y)  # (n_rows, W)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    ndc_x = (xx + jx) / width * 2.0 - 1.0
    # Row 0 = top scanline: flip the reference's bottom-up NDC.
    ndc_y = -((yy + jy) / height * 2.0 - 1.0)
    t = jnp.tan(jnp.radians(cam.vfov_degrees) / 2.0)
    aspect = width / height
    right, true_up, fwd = camera_basis(cam)
    d = (ndc_x[..., None] * (t * aspect) * right
         + ndc_y[..., None] * t * true_up + fwd)
    return vec.normalize(d)


def perspective_ray_at(cam: PerspectiveCamera, width: int, height: int,
                       pixel: jax.Array, jx: jax.Array, jy: jax.Array):
    """Unit ray direction for flat row-major ``pixel`` indices, (R, 3).

    Per-lane form of ``perspective_rays`` — identical math, but indexed by the
    absolute pixel counter so a lane can regenerate its own primary ray at any
    time (the wavefront integrator's path-regeneration step).  ``jx``/``jy``:
    in-pixel jitter in [0, 1)."""
    pixel = jnp.asarray(pixel)
    x = (pixel % width).astype(jnp.float32)
    y = (pixel // width).astype(jnp.float32)
    ndc_x = (x + jx) / width * 2.0 - 1.0
    ndc_y = -((y + jy) / height * 2.0 - 1.0)  # row 0 = top scanline
    t = jnp.tan(jnp.radians(cam.vfov_degrees) / 2.0)
    aspect = width / height
    right, true_up, fwd = camera_basis(cam)
    d = (ndc_x[..., None] * (t * aspect) * right
         + ndc_y[..., None] * t * true_up + fwd)
    return vec.normalize(d)


def view_proj_matrices(cam: PerspectiveCamera, width: int, height: int,
                       near: float = 0.1, far: float = 100.0):
    """(view, proj) 4x4 matrices matching glm::lookAt / glm::perspectiveFov
    (RH, NDC z in [-1,1]).  Needed by the temporal denoiser's reprojection
    through the *previous* frame's matrices (``Denoiser/.../Denoiser.h:270-274``,
    matrices saved at ``Renderer.cpp:251-253``)."""
    right, true_up, fwd = camera_basis(cam)
    eye = cam.position
    view = jnp.stack([
        jnp.concatenate([right, -jnp.dot(right, eye)[None]]),
        jnp.concatenate([true_up, -jnp.dot(true_up, eye)[None]]),
        jnp.concatenate([-fwd, jnp.dot(fwd, eye)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=eye.dtype),
    ])  # row-major: view @ [p;1]
    f = 1.0 / jnp.tan(jnp.radians(cam.vfov_degrees) / 2.0)
    aspect = width / height
    proj = jnp.array([[0.0] * 4] * 4, dtype=eye.dtype)
    proj = proj.at[0, 0].set(f / aspect)
    proj = proj.at[1, 1].set(f)
    proj = proj.at[2, 2].set(-(far + near) / (far - near))
    proj = proj.at[2, 3].set(-(2.0 * far * near) / (far - near))
    proj = proj.at[3, 2].set(-1.0)
    return view, proj


@dataclasses.dataclass(frozen=True)
class FlyCameraController:
    """Host-side WASD/mouse fly-camera state machine mirroring the reference's
    interactive camera (``initial framework/.../Camera.cpp:23-87``): speed 5,
    quaternion pitch/yaw from mouse deltas.  Pure-python (runs between frames);
    produces a ``PerspectiveCamera`` pose pytree."""

    position: np.ndarray
    forward: np.ndarray
    up: np.ndarray
    vfov_degrees: float = 45.0
    speed: float = 5.0           # Camera.cpp:44
    rotation_speed: float = 0.3  # Camera.cpp:: mouse sensitivity

    def moved(self, keys: set[str], mouse_delta=(0.0, 0.0), dt: float = 0.016
              ) -> "FlyCameraController":
        fwd = self.forward / np.linalg.norm(self.forward)
        up = np.asarray(self.up, np.float64)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        pos = np.asarray(self.position, np.float64).copy()
        step = self.speed * dt
        if "w" in keys: pos += fwd * step      # noqa: E701
        if "s" in keys: pos -= fwd * step      # noqa: E701
        if "a" in keys: pos -= right * step    # noqa: E701
        if "d" in keys: pos += right * step    # noqa: E701
        if "space" in keys: pos += up * step   # noqa: E701
        if "shift" in keys: pos -= up * step   # noqa: E701
        dx, dy = mouse_delta
        if dx or dy:
            yaw = -dx * self.rotation_speed
            pitch = -dy * self.rotation_speed
            fwd = _rotate(fwd, up, yaw)
            right = np.cross(fwd, up); right /= np.linalg.norm(right)
            fwd = _rotate(fwd, right, pitch)
        return dataclasses.replace(self, position=pos, forward=fwd)

    def camera(self) -> PerspectiveCamera:
        return make_perspective_camera(self.position, self.forward, self.up,
                                       self.vfov_degrees)


def _rotate(v: np.ndarray, axis: np.ndarray, angle_rad: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return (v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1 - c))

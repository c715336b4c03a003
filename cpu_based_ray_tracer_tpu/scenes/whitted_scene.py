"""Whitted-stage scene (``Whitted Style Ray Tracer/.../Renderer.cpp:27-49``):
diffuse sphere + glass sphere + two-triangle chessboard floor + two point
lights; constant sky (0.2, 0.7, 0.8) (World.h:53)."""

from __future__ import annotations

import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.scene import (DIFFUSE_GLOSSY,
                                            REFLECTIVE_REFRACTIVE,
                                            TEX_CHESSBOARD, MaterialBuilder,
                                            PointLights, Scene, make_scene,
                                            make_spheres, make_triangles)
import jax.numpy as jnp

SKY = (0.2, 0.7, 0.8)
# Chessboard palette (TriangleMesh.h:85-86).
CHESS_A = (0.815, 0.235, 0.031)
CHESS_B = (0.937, 0.937, 0.231)
CHESS_FREQUENCY = 5.0


def whitted_scene() -> Scene:
    mb = MaterialBuilder()
    # Entity defaults: ior 1.3, kd 0.8, ks 0.2, exponent 25 (Entity.h:50-56).
    diffuse = mb.add(DIFFUSE_GLOSSY, albedo=(0.6, 0.7, 0.8), ior=1.3)
    glass = mb.add(REFLECTIVE_REFRACTIVE, ior=1.5)
    floor = mb.add(DIFFUSE_GLOSSY, ior=1.3, texture=TEX_CHESSBOARD)

    spheres = make_spheres(
        center=[[-1.0, 0.0, -12.0], [0.5, -0.5, -8.0]],
        radius=[2.0, 1.5],
        material=[diffuse, glass])

    # Floor quad {-5,-3,-6},{5,-3,-6},{5,-3,-16},{-5,-3,-16}, uv (0,0),(1,0),
    # (1,1),(0,1), indices (0,1,3),(1,2,3) (Renderer.cpp:39-43).
    v = np.array([[-5, -3, -6], [5, -3, -6], [5, -3, -16], [-5, -3, -16]],
                 np.float64)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    idx = np.array([[0, 1, 3], [1, 2, 3]])
    tris = make_triangles(v[idx], np.array([floor, floor]), uv=uv[idx])

    lights = PointLights(
        position=jnp.asarray([[-20.0, 70.0, 20.0], [30.0, 50.0, -12.0]],
                             jnp.float32),
        radiance=jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]], jnp.float32))

    return make_scene(triangles=tris, spheres=spheres, materials=mb.build(),
                      lights=lights, sky_bottom=SKY, sky_top=SKY)


def whitted_camera() -> cam_mod.PerspectiveCamera:
    """Camera at (0,0,6) facing -z, vfov 35 (Camera.h:18-19, mainloop.cpp:23)."""
    return cam_mod.make_perspective_camera((0, 0, 6), (0, 0, -1),
                                           vfov_degrees=35.0)

"""Procedural meshes + the BVH-stage scene.

The reference's mesh stage loads the Stanford bunny (scale 2, translate
(-1, 6.1, 0)) and the Utah teapot (scale 1, translate (-1, 3, 0)) from OBJ
files into a two-level BVH (``BVH Ray Tracer/.../Renderer.cpp:28-40``).  We
generate equivalent-complexity meshes procedurally (no third-party asset
files in the repo); real OBJ files load through ``utils.objio`` with the same
scale/translate contract.
"""

from __future__ import annotations

import numpy as np

from cpu_based_ray_tracer_tpu import camera as cam_mod
from cpu_based_ray_tracer_tpu.scene import (DIFFUSE_GLOSSY, MaterialBuilder,
                                            PointLights, Scene, make_scene,
                                            make_triangles)
import jax.numpy as jnp


def icosphere(subdivisions: int = 4, radius: float = 1.0) -> np.ndarray:
    """Geodesic sphere triangle soup (T, 3, 3); subdivisions=4 -> 5120 tris
    (bunny-class complexity)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ])
    tris = v[f]
    for _ in range(subdivisions):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        tris = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)])
        n = np.linalg.norm(tris, axis=-1, keepdims=True)
        tris = tris / n
    return tris * radius


def torus(major: float = 1.0, minor: float = 0.35,
          n_u: int = 48, n_v: int = 24) -> np.ndarray:
    """Torus triangle soup (teapot-class complexity: 2*n_u*n_v tris)."""
    u = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    v = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")

    def pt(uu, vv):
        x = (major + minor * np.cos(vv)) * np.cos(uu)
        y = minor * np.sin(vv)
        z = (major + minor * np.cos(vv)) * np.sin(uu)
        return np.stack([x, y, z], -1)

    u_next = np.roll(uu, -1, 0)
    v_next = np.roll(vv, -1, 1)
    p00 = pt(uu, vv)
    p10 = pt(u_next, vv)
    p01 = pt(uu, v_next)
    p11 = pt(u_next, v_next)
    quads_a = np.stack([p00, p10, p11], -2).reshape(-1, 3, 3)
    quads_b = np.stack([p00, p11, p01], -2).reshape(-1, 3, 3)
    return np.concatenate([quads_a, quads_b])


def transform(tris: np.ndarray, scale: float = 1.0,
              translate=(0.0, 0.0, 0.0)) -> np.ndarray:
    """The reference mesh loader's uniform scale + translate
    (``BVH Ray Tracer/.../TriangleMesh.h:113-151``)."""
    return tris * scale + np.asarray(translate, np.float64)


def reference_asset_dir() -> str | None:
    """Directory of the reference checkout holding the BVH-stage OBJ assets
    (override with $CRT_REFERENCE_DIR); None when unavailable."""
    import os

    root = os.environ.get("CRT_REFERENCE_DIR", "/root/reference")
    p = os.path.join(root, "BVH Ray Tracer", "8599RayTracerGUI", "src")
    return p if os.path.isdir(p) else None


def _mesh_scene(tris: np.ndarray) -> Scene:
    """Scene assembly shared by the real and stand-in mesh scenes: the
    BVH-stage Renderer ctor's materials & lights
    (``BVH Ray Tracer/.../Renderer.cpp:28-40``, ``TriangleMesh.h:138-141``:
    Diffuse_Glossy albedo (0.5,0.5,0.5), phong_diffuse 0.6, phong_specular 0,
    specular exponent 0; two white point lights at (+-20, 70, 20))."""
    mb = MaterialBuilder()
    grey = mb.add(DIFFUSE_GLOSSY, albedo=(0.5, 0.5, 0.5), ior=1.3,
                  kd=0.6, ks=0.0, spec_exp=0.0)
    mats = np.full(len(tris), grey, np.int32)
    lights = PointLights(
        position=jnp.asarray([[-20.0, 70.0, 20.0], [20.0, 70.0, 20.0]],
                             jnp.float32),
        radiance=jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32))
    return make_scene(triangles=make_triangles(tris, mats),
                      materials=mb.build(), lights=lights,
                      sky_bottom=(0.2, 0.7, 0.8), sky_top=(0.2, 0.7, 0.8))


def bunny_teapot_scene() -> Scene:
    """The reference BVH stage's ACTUAL scene: ``stanford_bunny.obj`` at
    scale 2 translate (-1, 6.1, 0) + ``utah_teapot.obj`` at scale 1 translate
    (-1, 3, 0) (``BVH Ray Tracer/.../Renderer.cpp:28-31``), loaded from the
    reference checkout's assets.  Raises FileNotFoundError when the assets
    are not present (tests skip; the stand-in ``bvh_stage_scene`` always
    works)."""
    import os

    src = reference_asset_dir()
    if src is None:
        raise FileNotFoundError("reference OBJ assets unavailable "
                                "(set $CRT_REFERENCE_DIR)")
    from cpu_based_ray_tracer_tpu.utils import objio

    bunny, _ = objio.load_obj(os.path.join(src, "stanford_bunny.obj"),
                              scale=2.0, translate=(-1.0, 6.1, 0.0))
    teapot, _ = objio.load_obj(os.path.join(src, "utah_teapot.obj"),
                               scale=1.0, translate=(-1.0, 3.0, 0.0))
    return _mesh_scene(np.concatenate([bunny, teapot]))


def bvh_stage_scene(subdivisions: int = 3) -> Scene:
    """Mesh scene mirroring the BVH stage's Renderer ctor
    (``BVH Ray Tracer/.../Renderer.cpp:28-40``): bunny stand-in at scale 2,
    translate (-1, 6.1, 0); teapot stand-in at scale 1, translate (-1, 3, 0);
    two white point lights at (+-20, 70, 20) with radiance (1,1,1); the
    reference's per-triangle mesh material (grey Diffuse_Glossy,
    ``TriangleMesh.h:138-141``)."""
    bunny = transform(icosphere(subdivisions, radius=1.0), 2.0, (-1, 6.1, 0))
    teapot = transform(torus(1.6, 0.6), 1.0, (-1, 3, 0))
    return _mesh_scene(np.concatenate([bunny, teapot]))


def bvh_stage_camera() -> cam_mod.PerspectiveCamera:
    """Camera (-1, 5, 10) facing -z, vfov 35 (``BVH Ray Tracer/.../
    Camera.h:19-20``, mainloop.cpp:22)."""
    return cam_mod.make_perspective_camera((-1, 5, 10), (0, 0, -1),
                                           vfov_degrees=35.0)


def mesh_scene_from_obj(path, scale: float = 1.0,
                        translate=(0.0, 0.0, 0.0)) -> "Scene":
    """Scene straight from an OBJ + its .mtl: per-group Kd as the diffuse
    albedo and Ke as emission (the capability the vendored loader's
    LoadMaterials enables, ``OBJ_Loader.h:673,1013-1180`` — the reference
    itself overrides mesh materials in code, so this constructor is the
    optional path that honors the files instead)."""
    from cpu_based_ray_tracer_tpu.scene import make_scene
    from cpu_based_ray_tracer_tpu.utils import objio

    tris, _uv, tri_mtl, mtls = objio.load_obj_with_materials(
        path, scale=scale, translate=translate)
    mb = MaterialBuilder()
    ids = [mb.add(DIFFUSE_GLOSSY, albedo=m["kd"], emission=m["ke"],
                  ior=max(m["ni"], 1.0), kd=0.8, ks=0.2,
                  spec_exp=max(m["ns"], 1.0)) for m in mtls]
    mats = np.asarray([ids[j] for j in tri_mtl], np.int32)
    return make_scene(triangles=make_triangles(tris, mats),
                      materials=mb.build(),
                      sky_bottom=(0.0, 0.0, 0.0), sky_top=(0.0, 0.0, 0.0))

"""SoA pytree scene representation.

The reference keeps scenes as heaps of polymorphic ``Entity*`` objects each
holding a ``Material*`` (e.g. ``BVH Ray Tracer/8599RayTracerGUI/src/Entity.h``,
``WhittedMaterial.h:16-53``).  TPU-first design: one flat structure-of-arrays
per primitive type with integer material ids, registered as JAX pytrees so the
whole scene can be jitted over, donated, replicated across a device mesh, and
differentiated with respect to (vertices, material tables, light radiance).

Only the *capabilities* are mirrored; the layout is new:

- ``Triangles``: v0/e1/e2 (+ per-triangle unit normal, uv at vertices) — the
  reference precomputes face normals per triangle too
  (``BVH Ray Tracer/.../TriangleMesh.h:57``).
- ``Spheres``: center/radius — reference ``Sphere.h`` per stage.
- ``Materials``: a single table unifying the three material systems of the
  reference (RTIOW scatter materials ``offline prototype/.../Material.h``,
  Whitted ``MaterialNature`` data bags ``WhittedMaterial.h:23-53``, and the MC
  BRDF/emission materials ``Monte Carlo Path Tracer/.../WhittedMaterial.h``).
- ``PointLights``: Whitted-stage point lights
  (``Whitted Style Ray Tracer/.../LightSource.h:16-30``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# --- Material kinds -----------------------------------------------------------
# One integer enum covering every material system in the reference.
LAMBERT = 0         # RTIOW Diffuse           (offline prototype/.../Diffuse.h)
METAL = 1           # RTIOW Metal             (offline prototype/.../Metal.h)
DIELECTRIC = 2      # RTIOW Dielectric        (offline prototype/.../Dielectric.h)
DIFFUSE_GLOSSY = 3  # Whitted Diffuse_Glossy / MC diffuse (WhittedUtilities.h:18-23)
REFLECTIVE = 4      # Whitted Reflective
REFLECTIVE_REFRACTIVE = 5  # Whitted Reflective_Refractive (glass)

# Diffuse sub-models of the RTIOW stages (offline prototype/.../Diffuse.h:29-35,
# runtime-switchable in the NPPT stage via NPPTToolbox.h:34-44).
DIFFUSE_IN_SPHERE = 0
DIFFUSE_ON_SPHERE = 1   # true Lambertian; reference default (main.cpp DiffuseMode 1)
DIFFUSE_IN_HEMISPHERE = 2

# Procedural texture ids (0 = none): reference chessboard texture
# (Whitted Style Ray Tracer/.../TriangleMesh.h:79-86).
TEX_NONE = 0
TEX_CHESSBOARD = 1


def _pytree(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _replace(obj, **kw):
    return dataclasses.replace(obj, **kw)


@_pytree
class Triangles:
    """Triangle SoA. ``e1 = v1 - v0``, ``e2 = v2 - v0`` (Möller-Trumbore edges,
    reference ``BVH Ray Tracer/.../TriangleMesh.h:19-45``); ``normal`` is the
    unit geometric normal ``normalize(cross(e1, e2))`` (reference precomputes it
    at ``TriangleMesh.h:57``)."""

    v0: jax.Array      # (N, 3) f32
    e1: jax.Array      # (N, 3) f32
    e2: jax.Array      # (N, 3) f32
    normal: jax.Array  # (N, 3) f32 unit geometric normal
    uv0: jax.Array     # (N, 2) f32 texture coords at v0 (zeros when unused)
    uv1: jax.Array     # (N, 2)
    uv2: jax.Array     # (N, 2)
    material: jax.Array  # (N,) i32 index into Materials

    @property
    def count(self) -> int:
        return self.v0.shape[0]

    @property
    def area(self) -> jax.Array:
        """Per-triangle area = |e1 x e2| / 2 (reference TriangleMesh.h:58).

        Componentwise cross (ops.vec.cross): jnp.cross fused with the norm
        MISCOMPILES under jit on the TPU backend (see vec.cross) — this
        exact expression silently inflated the Cornell light's area 1.68x
        in rounds 1-3."""
        from cpu_based_ray_tracer_tpu.ops import vec as _vec
        return 0.5 * jnp.linalg.norm(_vec.cross(self.e1, self.e2), axis=-1)

    def replace(self, **kw):
        return _replace(self, **kw)


@_pytree
class Spheres:
    """Sphere SoA (reference ``Sphere.h`` per stage).  A *negative* radius is
    legal and flips the outward normal — the reference's hollow-glass-bubble
    trick (``offline prototype/.../Dielectric.h:36-42``)."""

    center: jax.Array    # (M, 3) f32
    radius: jax.Array    # (M,) f32 (may be negative: hollow bubble)
    material: jax.Array  # (M,) i32

    @property
    def count(self) -> int:
        return self.center.shape[0]

    def replace(self, **kw):
        return _replace(self, **kw)


@_pytree
class Materials:
    """One flat material table for all integrators.

    Field usage by kind:
      - LAMBERT / METAL / DIELECTRIC (RTIOW): ``albedo``, ``fuzz`` (metal),
        ``ior`` (dielectric).
      - DIFFUSE_GLOSSY (Whitted): ``albedo`` (diffuse color), ``kd``, ``ks``,
        ``spec_exp`` (reference defaults 0.8/0.2/25 at
        ``Whitted Style Ray Tracer/.../Entity.h:50-56``), ``texture``.
      - REFLECTIVE / REFLECTIVE_REFRACTIVE (Whitted): ``ior``.
      - MC diffuse: ``albedo`` is the diffuse coefficient (BRDF = albedo/pi,
        ``Monte Carlo Path Tracer/.../WhittedMaterial.h:58-69``) and
        ``emission`` the radiance of area lights; a material is emissive iff
        ``|emission| > 1e-5`` (``WhittedMaterial.h:35``).
    """

    kind: jax.Array      # (K,) i32
    albedo: jax.Array    # (K, 3) f32
    emission: jax.Array  # (K, 3) f32
    ior: jax.Array       # (K,) f32 refractive index
    fuzz: jax.Array      # (K,) f32 metal fuzz / roughness
    kd: jax.Array        # (K,) f32 Phong diffuse coefficient
    ks: jax.Array        # (K,) f32 Phong specular coefficient
    spec_exp: jax.Array  # (K,) f32 Phong specular exponent ("specular_size_factor")
    texture: jax.Array   # (K,) i32 procedural texture id (TEX_*)

    @property
    def count(self) -> int:
        return self.kind.shape[0]

    @property
    def emissive(self) -> jax.Array:
        """(K,) bool — reference emissive test |emission| > 1e-5
        (``Monte Carlo Path Tracer/.../WhittedMaterial.h:35``)."""
        return jnp.linalg.norm(self.emission, axis=-1) > 1e-5

    def replace(self, **kw):
        return _replace(self, **kw)


@_pytree
class PointLights:
    """Whitted-stage point lights {position, radiance}
    (``Whitted Style Ray Tracer/.../LightSource.h:16-30``)."""

    position: jax.Array  # (L, 3) f32
    radiance: jax.Array  # (L, 3) f32 (the reference stores a scalar `radiance`
                         #  per light as vec3-like intensity)

    @property
    def count(self) -> int:
        return self.position.shape[0]

    def replace(self, **kw):
        return _replace(self, **kw)


@_pytree
class Scene:
    """The whole scene as one pytree.

    ``sky_top``/``sky_bottom`` express every miss-shader in the reference:
      - RTIOW gradient: lerp(white, (0.5, 0.7, 1.0)) on ray.y
        (``offline prototype/.../main.cpp:70-71``);
      - Whitted constant sky (0.2, 0.7, 0.8) (``World.h:53``): top == bottom;
      - MC night sky (12, 20, 69)/255 (``Monte Carlo Path Tracer/.../
        Renderer.cpp:146``): top == bottom.
    """

    triangles: Triangles
    spheres: Spheres
    materials: Materials
    lights: PointLights
    sky_bottom: jax.Array  # (3,) f32 color at ray.y == -1 (RTIOW: white)
    sky_top: jax.Array     # (3,) f32 color at ray.y == +1

    def replace(self, **kw):
        return _replace(self, **kw)

    def sky(self, direction: jax.Array) -> jax.Array:
        """Miss-shader radiance for unit ray ``direction`` (..., 3)."""
        t = 0.5 * (direction[..., 1:2] + 1.0)
        return (1.0 - t) * self.sky_bottom + t * self.sky_top


# --- Constructors -------------------------------------------------------------

def make_triangles(
    vertices: np.ndarray,          # (N, 3, 3) float — per-triangle vertices a,b,c
    material: np.ndarray,          # (N,) int
    uv: Optional[np.ndarray] = None,  # (N, 3, 2) float
    dtype=jnp.float32,
) -> Triangles:
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3, 3)
    v0, v1, v2 = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.where(norm > 0, norm, 1.0)
    if uv is None:
        uv = np.zeros((len(v0), 3, 2))
    uv = np.asarray(uv, dtype=np.float64).reshape(-1, 3, 2)
    return Triangles(
        v0=jnp.asarray(v0, dtype), e1=jnp.asarray(e1, dtype),
        e2=jnp.asarray(e2, dtype), normal=jnp.asarray(n, dtype),
        uv0=jnp.asarray(uv[:, 0], dtype), uv1=jnp.asarray(uv[:, 1], dtype),
        uv2=jnp.asarray(uv[:, 2], dtype),
        material=jnp.asarray(material, jnp.int32),
    )


def empty_triangles(dtype=jnp.float32) -> Triangles:
    """A single degenerate triangle that can never be hit (keeps shapes static;
    the intersector masks on a non-zero normal/determinant)."""
    z3, z2 = jnp.zeros((1, 3), dtype), jnp.zeros((1, 2), dtype)
    return Triangles(v0=z3, e1=z3, e2=z3, normal=z3, uv0=z2, uv1=z2, uv2=z2,
                     material=jnp.zeros((1,), jnp.int32))


def make_spheres(center, radius, material, dtype=jnp.float32) -> Spheres:
    return Spheres(
        center=jnp.asarray(np.atleast_2d(np.asarray(center, np.float64)), dtype),
        radius=jnp.asarray(np.atleast_1d(np.asarray(radius, np.float64)), dtype),
        material=jnp.asarray(np.atleast_1d(material), jnp.int32),
    )


def empty_spheres(dtype=jnp.float32) -> Spheres:
    """A single radius-0 sphere: the quadratic has no positive root interval,
    so it can never be hit."""
    return Spheres(center=jnp.zeros((1, 3), dtype),
                   radius=jnp.zeros((1,), dtype),
                   material=jnp.zeros((1,), jnp.int32))


def empty_lights(dtype=jnp.float32) -> PointLights:
    return PointLights(position=jnp.zeros((1, 3), dtype),
                       radiance=jnp.zeros((1, 3), dtype))


class MaterialBuilder:
    """Imperative helper to assemble the Materials SoA from per-material rows."""

    def __init__(self):
        self.rows = []

    def add(self, kind, albedo=(0.0, 0.0, 0.0), emission=(0.0, 0.0, 0.0),
            ior=1.0, fuzz=0.0, kd=0.8, ks=0.2, spec_exp=25.0,
            texture=TEX_NONE) -> int:
        """Returns the material id.  Whitted defaults kd=0.8 / ks=0.2 /
        spec_exp=25 mirror ``Whitted Style Ray Tracer/.../Entity.h:50-56``."""
        self.rows.append(dict(kind=kind, albedo=albedo, emission=emission,
                              ior=ior, fuzz=fuzz, kd=kd, ks=ks,
                              spec_exp=spec_exp, texture=texture))
        return len(self.rows) - 1

    def build(self, dtype=jnp.float32) -> Materials:
        if not self.rows:
            self.add(LAMBERT)
        g = lambda k: [r[k] for r in self.rows]  # noqa: E731
        return Materials(
            kind=jnp.asarray(g("kind"), jnp.int32),
            albedo=jnp.asarray(g("albedo"), dtype),
            emission=jnp.asarray(g("emission"), dtype),
            ior=jnp.asarray(g("ior"), dtype),
            fuzz=jnp.asarray(g("fuzz"), dtype),
            kd=jnp.asarray(g("kd"), dtype),
            ks=jnp.asarray(g("ks"), dtype),
            spec_exp=jnp.asarray(g("spec_exp"), dtype),
            texture=jnp.asarray(g("texture"), jnp.int32),
        )


def make_scene(
    triangles: Optional[Triangles] = None,
    spheres: Optional[Spheres] = None,
    materials: Optional[Materials] = None,
    lights: Optional[PointLights] = None,
    sky_bottom=(1.0, 1.0, 1.0),
    sky_top=(0.5, 0.7, 1.0),
    dtype=jnp.float32,
) -> Scene:
    if materials is None:
        materials = MaterialBuilder().build(dtype)
    return Scene(
        triangles=triangles if triangles is not None else empty_triangles(dtype),
        spheres=spheres if spheres is not None else empty_spheres(dtype),
        materials=materials,
        lights=lights if lights is not None else empty_lights(dtype),
        sky_bottom=jnp.asarray(sky_bottom, dtype),
        sky_top=jnp.asarray(sky_top, dtype),
    )

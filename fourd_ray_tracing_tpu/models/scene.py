"""Scenes as differentiable parameter pytrees.

The reference resolves scenes at GLSL compile time by pasting a
``scenes/*.frag`` snippet into the shader (executable/README.md:9-11,
SURVEY §3.5). The TPU-native equivalent: a `Scene` pytree of traced
arrays — primitive counts are static (recompile per scene shape, like a
shader recompile), but every coordinate, radius, color, glow and mirror
probability is a JAX array, so the whole renderer differentiates w.r.t.
the scene.

`intersect_scene` is the analogue of each scene's ``find_intersection``
(e.g. shader.frag:434-451): a linear closest-fold over all primitives,
with the reference's fold order (spaces, spheres, cylinders, duocylinder,
hypercube, tiger). No acceleration structure, matching the reference
("all objects iterated without smart optimizations", shader.frag:433).
Primitive loops unroll at trace time — counts are tiny (<= 8) and the
per-primitive parameters broadcast as scalars against the ray batch,
which on TPU keeps the hot loop pure VPU work.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fourd_ray_tracing_tpu.ops import geometry as geo
from fourd_ray_tracing_tpu.ops.sampler import SMALL_FLOAT
from fourd_ray_tracing_tpu.ops.sky import Environment, Sun
from fourd_ray_tracing_tpu.ops.vec4 import Vec3, Vec4, dot


class SpaceSpec(NamedTuple):
    point: Vec4
    norm: Vec4
    material: geo.Material


class SphereSpec(NamedTuple):
    center: Vec4
    r: jnp.ndarray
    material: geo.Material


class Scene(NamedTuple):
    """A full scene: primitive tuples (static length) + environment."""

    spaces: Tuple[SpaceSpec, ...] = ()
    spheres: Tuple[SphereSpec, ...] = ()
    cylinders: Tuple[geo.CylinderSpec, ...] = ()
    cylinders_union: Optional[Tuple[geo.CylinderSpec, geo.CylinderSpec]] = None
    hypercube: Optional[geo.HypercubeSpec] = None
    tiger: Optional[geo.TigerSpec] = None
    environment: Optional[Environment] = None


def intersect_scene(scene: Scene, ray_o: Vec4, ray_d: Vec4) -> geo.Intersection:
    """Closest hit over every primitive (find_intersection analogue)."""
    inter = geo.miss_like(ray_o.x)
    for sp in scene.spaces:
        inter = geo.closest(
            geo.space_intersection(sp.point, sp.norm, sp.material, ray_o, ray_d),
            inter,
        )
    for s in scene.spheres:
        inter = geo.closest(
            geo.sphere_intersection(s.center, s.r, s.material, ray_o, ray_d, True),
            inter,
        )
    for c in scene.cylinders:
        inter = geo.closest(
            geo.cylinder_intersection(
                c.point, c.axis1, c.axis2, c.r, c.material, ray_o, ray_d, True
            ),
            inter,
        )
    if scene.cylinders_union is not None:
        c1, c2 = scene.cylinders_union
        inter = geo.closest(
            geo.cylinders_union_intersection(c1, c2, ray_o, ray_d), inter
        )
    if scene.hypercube is not None:
        inter = geo.closest(
            geo.hypercube_intersection(scene.hypercube, ray_o, ray_d), inter
        )
    if scene.tiger is not None:
        inter = geo.closest(geo.tiger_intersection(scene.tiger, ray_o, ray_d), inter)
    return inter


# --- Convenience constructors (Python-float friendly) --------------------

def material(glow: float, refl_prob: float, color: tuple) -> geo.Material:
    return geo.Material.of(glow, refl_prob, color)


def space(point: tuple, norm: tuple, mat: geo.Material) -> SpaceSpec:
    return SpaceSpec(Vec4.of(*point), Vec4.of(*norm), mat)


def sphere(center: tuple, r: float, mat: geo.Material) -> SphereSpec:
    return SphereSpec(Vec4.of(*center), jnp.asarray(r, jnp.float32), mat)


def cylinder(point: tuple, axis1: tuple, axis2: tuple, r: float, mat: geo.Material):
    return geo.CylinderSpec(
        Vec4.of(*point), Vec4.of(*axis1), Vec4.of(*axis2),
        jnp.asarray(r, jnp.float32), mat,
    )


def sun(drct: tuple, angular_size: float, light: tuple, sharpness: float) -> Sun:
    return Sun(
        Vec4.of(*drct),
        jnp.asarray(angular_size, jnp.float32),
        Vec3.of(*light),
        jnp.asarray(sharpness, jnp.float32),
    )


def environment(sun_: Sun, sky_light: tuple, enabled: bool = True) -> Environment:
    return Environment(sun_, Vec3.of(*sky_light), enabled)

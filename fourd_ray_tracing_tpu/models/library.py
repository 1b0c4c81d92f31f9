"""The five canonical scenes (SURVEY §2.3, scenes/*.frag).

Parameter values transcribed from the reference scene snippets; every
number below is a traced array in the Scene pytree, hence
differentiable. Scene names are romanized from the Russian originals.
"""
from __future__ import annotations

import numpy as np

from fourd_ray_tracing_tpu.models.scene import (
    Scene,
    cylinder,
    environment,
    material,
    space,
    sphere,
    sun,
)
from fourd_ray_tracing_tpu.ops import geometry as geo
from fourd_ray_tracing_tpu.ops.vec4 import Vec4

PI = float(np.pi)


def sphere_plane_light() -> Scene:
    """'Шар, плоскость и светилник.frag': floor plane, mirror-ish sphere,
    glowing lamp sphere, soft sun (sharpness 0.8)."""
    return Scene(
        spaces=(
            space((0, 0, -1.5, 0), (0, 0, 1, 0), material(0, 0, (0.6, 0.4, 0.2))),
        ),
        spheres=(
            sphere((-1, 1, 0, 0), 1.0, material(0, 0.7, (0.2, 1.0, 0.2))),
            sphere((1, 1, 0, 0), 0.5, material(90, 0.0, (1, 1, 1))),
        ),
        environment=environment(
            sun((0, 1, 1, 0), PI * 0.09, (10, 10, 0.95), 0.8),
            (0.02, 0.06, 0.12),
        ),
    )


def room_with_sphere() -> Scene:
    """'Комната со сферой.frag': closed 4D box (8 hyperplanes), matte
    sphere + glow-200 lamp sphere, environment light disabled
    (final_light overridden to black, scene file lines 37-39)."""
    size = 3.5
    return Scene(
        spaces=(
            space((size, 0, 0, 0), (1, 0, 0, 0), material(0, 0, (0.44, 0.04, 0.67))),
            space((-size, 0, 0, 0), (1, 0, 0, 0), material(0, 0, (1.0, 1.0, 0.0))),
            space((0, size, 0, 0), (0, 1, 0, 0), material(0, 0, (1.0, 0.0, 0.0))),
            space((0, -size, 0, 0), (0, 1, 0, 0), material(0, 0, (0.0, 0.8, 0.0))),
            space((0, 0, size, 0), (0, 0, 1, 0), material(0, 0, (1.0, 1.0, 1.0))),
            space((0, 0, -size, 0), (0, 0, 1, 0), material(0, 0, (1.0, 1.0, 1.0))),
            space((0, 0, 0, size), (0, 0, 0, 1), material(0, 0, (1.0, 0.67, 0.0))),
            space((0, 0, 0, -size), (0, 0, 0, 1), material(0, 0, (0.07, 0.25, 0.67))),
        ),
        spheres=(
            sphere((0, 0, -size / 5, 0), 0.35 * size, material(0, 0, (1, 1, 1))),
            sphere((0, 0, size, 0), 0.25 * size, material(200, 0, (1, 1, 1))),
        ),
        environment=environment(
            sun((0, 1, 1, 0), PI * 0.09, (0, 0, 0), 0.0),
            (0, 0, 0),
            enabled=False,
        ),
    )


def hypercube() -> Scene:
    """'Гиперкуб.frag': white floor + 8-cell hypercube, one material per
    cell, bright sun."""
    mats = (
        material(0, 0, (0.72, 0.07, 0.20)),
        material(0, 0, (0.00, 0.61, 0.28)),
        material(0, 0, (1.00, 0.84, 0.00)),
        material(0, 0, (0.40, 0.00, 0.80)),
        material(0, 0, (1.00, 0.35, 0.00)),
        material(0, 0, (0.00, 0.27, 0.68)),
        material(0, 0, (1.00, 1.00, 1.00)),
        material(0, 0, (0.01, 0.01, 0.01)),
    )
    return Scene(
        spaces=(
            space((0, 0, -1.5, 0), (0, 0, 1, 0), material(0, 0, (1, 1, 1))),
        ),
        hypercube=geo.make_hypercube(
            Vec4.of(0, 2, 0, 0),
            Vec4.of(1, 0, 0, 0),
            Vec4.of(0, 1, 0, 0),
            Vec4.of(0, 0, 1, 0),
            Vec4.of(0, 0, 0, 1),
            1.0,
            mats,
        ),
        environment=environment(
            sun((0, 1, 1, 0), PI * 0.09, (2100, 1000, 20), 0.0),
            (0.4, 0.6, 1.53),
        ),
    )


def duocylinder() -> Scene:
    """'Четырёхмерный цилиндр.frag': floor + duocylinder (intersection of
    two axis-swapped infinite cylinders)."""
    return Scene(
        spaces=(
            space((0, 0, -1.5, 0), (0, 0, 1, 0), material(0, 0, (0.4, 0.25, 0.07))),
        ),
        cylinders_union=(
            cylinder((0, 2, 0, 0), (1, 0, 0, 0), (0, 0, 0, 1), 1.0,
                     material(0, 0, (1.0, 0.0, 0.0))),
            cylinder((0, 2, 0, 0), (0, 0, 1, 0), (0, 1, 0, 0), 1.0,
                     material(0, 0, (0.07, 0.67, 0.25))),
        ),
        environment=environment(
            sun((0, 1, 1, 0), PI * 0.09, (500, 500, 10), 0.0),
            (0.2, 0.6, 1.2),
        ),
    )


def tiger() -> Scene:
    """'Фигура tiger.frag': floor + the 4D tiger (annulus of two cylinder
    families); identical to shader.frag's built-in default scene."""
    return Scene(
        spaces=(
            space((0, 0, -1.5, 0), (0, 0, 1, 0), material(0, 0, (0.4, 0.25, 0.07))),
        ),
        tiger=geo.make_tiger(
            Vec4.of(0, 2, 0, 0),
            Vec4.of(1, 0, 0, 0),
            Vec4.of(0, 0, 0, 1),
            Vec4.of(0, 0, 1, 0),
            Vec4.of(0, 1, 0, 0),
            0.9,
            1.4,
            material(0, 0, (1.0, 0.0, 0.0)),
            material(0, 0, (0.07, 0.67, 0.25)),
        ),
        environment=environment(
            sun((0, 1, 1, 0), PI * 0.09, (500, 500, 10), 0.0),
            (0.2, 0.6, 1.2),
        ),
    )


SCENES = {
    "sphere_plane_light": sphere_plane_light,
    "room_with_sphere": room_with_sphere,
    "hypercube": hypercube,
    "duocylinder": duocylinder,
    "tiger": tiger,
}

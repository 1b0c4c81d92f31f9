"""The five canonical scenes, transcribed directly from /root/reference/scenes/*.frag.

Constants are re-transcribed here from the GLSL scene snippets — NOT
imported from the production scene library — so a transcription error on
either side fails the golden tests.
"""
from __future__ import annotations

import numpy as np

from oracle.frag import (
    PI,
    Cylinder,
    CylindersUnion,
    Material,
    OracleScene,
    Space,
    Sphere,
    SunProperties,
    init_hypercube,
    init_tiger,
    vec3,
    vec4,
)

F = np.float32


def _sun(drct, angular_size, light, sharpness) -> SunProperties:
    return SunProperties(vec4(*drct), F(angular_size), vec3(*light), F(sharpness))


def sphere_plane_light() -> OracleScene:
    """scenes/Шар, плоскость и светилник.frag:1-30."""
    return OracleScene(
        spaces=(
            Space(vec4(0, 0, -1.5, 0), vec4(0, 0, 1, 0),
                  Material.of(0, 0, (0.6, 0.4, 0.2))),
        ),
        spheres=(
            Sphere(vec4(-1, 1, 0, 0), F(1.0), Material.of(0, 0.7, (0.2, 1.0, 0.2))),
            Sphere(vec4(1, 1, 0, 0), F(0.5), Material.of(90, 0.0, (1, 1, 1))),
        ),
        sun=_sun((0, 1, 1, 0), PI * F(0.09), (10, 10, 0.95), 0.8),
        sky_light=vec3(0.02, 0.06, 0.12),
    )


def room_with_sphere() -> OracleScene:
    """scenes/Комната со сферой.frag:1-39 (final_light overridden to black)."""
    size = F(3.5)
    return OracleScene(
        spaces=(
            Space(vec4(size, 0, 0, 0), vec4(1, 0, 0, 0), Material.of(0, 0, (0.44, 0.04, 0.67))),
            Space(vec4(-size, 0, 0, 0), vec4(1, 0, 0, 0), Material.of(0, 0, (1.0, 1.0, 0.0))),
            Space(vec4(0, size, 0, 0), vec4(0, 1, 0, 0), Material.of(0, 0, (1.0, 0.0, 0.0))),
            Space(vec4(0, -size, 0, 0), vec4(0, 1, 0, 0), Material.of(0, 0, (0.0, 0.8, 0.0))),
            Space(vec4(0, 0, size, 0), vec4(0, 0, 1, 0), Material.of(0, 0, (1.0, 1.0, 1.0))),
            Space(vec4(0, 0, -size, 0), vec4(0, 0, 1, 0), Material.of(0, 0, (1.0, 1.0, 1.0))),
            Space(vec4(0, 0, 0, size), vec4(0, 0, 0, 1), Material.of(0, 0, (1.0, 0.67, 0.0))),
            Space(vec4(0, 0, 0, -size), vec4(0, 0, 0, 1), Material.of(0, 0, (0.07, 0.25, 0.67))),
        ),
        spheres=(
            Sphere(vec4(0, 0, -size / F(5.0), 0), F(0.35) * size, Material.of(0, 0, (1, 1, 1))),
            Sphere(vec4(0, 0, size, 0), F(0.25) * size, Material.of(200, 0, (1, 1, 1))),
        ),
        black_final_light=True,
    )


def hypercube() -> OracleScene:
    """scenes/Гиперкуб.frag:1-37."""
    return OracleScene(
        spaces=(
            Space(vec4(0, 0, -1.5, 0), vec4(0, 0, 1, 0), Material.of(0, 0, (1, 1, 1))),
        ),
        hypercube=init_hypercube(
            vec4(0, 2, 0, 0),
            vec4(1, 0, 0, 0), vec4(0, 1, 0, 0), vec4(0, 0, 1, 0), vec4(0, 0, 0, 1),
            1.0,
            (
                Material.of(0, 0, (0.72, 0.07, 0.20)),
                Material.of(0, 0, (0.00, 0.61, 0.28)),
                Material.of(0, 0, (1.00, 0.84, 0.00)),
                Material.of(0, 0, (0.40, 0.00, 0.80)),
                Material.of(0, 0, (1.00, 0.35, 0.00)),
                Material.of(0, 0, (0.00, 0.27, 0.68)),
                Material.of(0, 0, (1.00, 1.00, 1.00)),
                Material.of(0, 0, (0.01, 0.01, 0.01)),
            ),
        ),
        sun=_sun((0, 1, 1, 0), PI * F(0.09), (2100, 1000, 20), 0.0),
        sky_light=vec3(0.4, 0.6, 1.53),
    )


def duocylinder() -> OracleScene:
    """scenes/Четырёхмерный цилиндр.frag:1-38."""
    return OracleScene(
        spaces=(
            Space(vec4(0, 0, -1.5, 0), vec4(0, 0, 1, 0), Material.of(0, 0, (0.4, 0.25, 0.07))),
        ),
        cylinders_union=CylindersUnion(
            Cylinder(vec4(0, 2, 0, 0), vec4(1, 0, 0, 0), vec4(0, 0, 0, 1),
                     F(1.0), Material.of(0, 0, (1.0, 0.0, 0.0))),
            Cylinder(vec4(0, 2, 0, 0), vec4(0, 0, 1, 0), vec4(0, 1, 0, 0),
                     F(1.0), Material.of(0, 0, (0.07, 0.67, 0.25))),
        ),
        sun=_sun((0, 1, 1, 0), PI * F(0.09), (500, 500, 10), 0.0),
        sky_light=vec3(0.2, 0.6, 1.2),
    )


def tiger() -> OracleScene:
    """scenes/Фигура tiger.frag:1-29 (== shader.frag's built-in scene)."""
    return OracleScene(
        spaces=(
            Space(vec4(0, 0, -1.5, 0), vec4(0, 0, 1, 0), Material.of(0, 0, (0.4, 0.25, 0.07))),
        ),
        tiger=init_tiger(
            vec4(0, 2, 0, 0),
            vec4(1, 0, 0, 0), vec4(0, 0, 0, 1), vec4(0, 0, 1, 0), vec4(0, 1, 0, 0),
            0.9, 1.4,
            Material.of(0, 0, (1.0, 0.0, 0.0)), Material.of(0, 0, (0.07, 0.67, 0.25)),
        ),
        sun=_sun((0, 1, 1, 0), PI * F(0.09), (500, 500, 10), 0.0),
        sky_light=vec3(0.2, 0.6, 1.2),
    )


SCENES = {
    "sphere_plane_light": sphere_plane_light,
    "room_with_sphere": room_with_sphere,
    "hypercube": hypercube,
    "duocylinder": duocylinder,
    "tiger": tiger,
}

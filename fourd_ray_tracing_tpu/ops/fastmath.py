"""Mosaic-safe inverse trigonometry.

The TPU Pallas lowering (Mosaic) has no acos/asin/atan/atan2 primitives,
but the render kernel needs arccos for the sun's angular profile
(shader.frag:454-468 computes the angle between the ray and the sun
direction). These implementations use only ops Mosaic lowers (mul/add,
sqrt, select, compare), are float32-accurate to ~1e-7 rad (f32 ulp
scale), and are used by BOTH the jnp renderer and the Pallas megakernel
so the two stay bit-identical.

atan core: odd minimax polynomial t*P(t^2) on [0, 1] (degree 9 in t^2,
max error 7.6e-9 in f64, ~7.5e-8 evaluated in f32), range-reduced by
atan(t) = pi/2 - atan(1/t) for t > 1.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_HALF_PI = np.float32(np.pi / 2)
_PI = np.float32(np.pi)

# atan(t)/t as a polynomial in u = t^2, u in [0, 1] (see module docstring).
_ATAN_COEFFS = tuple(
    np.float32(c)
    for c in (
        0.9999999981420136,
        -0.3333329279633544,
        0.19998532570283645,
        -0.1426489237473346,
        0.10958363839007743,
        -0.08427634966170072,
        0.05845791831595609,
        -0.0317506334697238,
        0.011257683716639311,
        -0.0018775736582807062,
    )
)


def _atan_unit(t: jnp.ndarray) -> jnp.ndarray:
    """atan(t) for t in [0, 1] (Horner over u = t^2)."""
    u = t * t
    acc = jnp.full_like(u, _ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * u + c
    return acc * t


def arctan(x: jnp.ndarray) -> jnp.ndarray:
    """atan(x) over the full real line."""
    ax = jnp.abs(x)
    big = ax > 1.0
    # reciprocal guarded against 0 on the small branch (unused there)
    inv = 1.0 / jnp.where(big, ax, 1.0)
    t = jnp.where(big, inv, ax)
    core = _atan_unit(t)
    res = jnp.where(big, _HALF_PI - core, core)
    return jnp.where(x < 0.0, -res, res)


def arctan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2(y, x) with standard quadrant conventions."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = arctan(y / safe_x)
    # x > 0: base; x < 0: base +/- pi by sign of y; x == 0: +/- pi/2.
    res = jnp.where(
        x > 0.0,
        base,
        jnp.where(
            x < 0.0,
            jnp.where(y < 0.0, base - _PI, base + _PI),
            jnp.where(y < 0.0, -_HALF_PI, _HALF_PI),
        ),
    )
    return res


def arccos(x: jnp.ndarray) -> jnp.ndarray:
    """acos(x) for x in [-1, 1] via atan2(sqrt(1-x^2), x).

    sqrt((1-x)(1+x)) keeps full precision near |x| = 1 (where the sun
    disk's center lands); out-of-range inputs clamp.
    """
    x = jnp.clip(x, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0))
    return arctan2(s, x)


def arcsin(x: jnp.ndarray) -> jnp.ndarray:
    """asin(x) = pi/2 - acos(x)."""
    return _HALF_PI - arccos(x)

"""Uniform direction sampling on the unit 3-sphere S^3 in R^4.

The reference's "novel piece" (README.md:9-13): sample the 4th
coordinate w from the marginal of the uniform distribution on S^3
(density (2/pi)*sqrt(1-w^2)) by numerically inverting its CDF

    volume_by_w(w) = (w*sqrt(1-w^2) - acos(w))/pi + 1     (shader.frag:136-138)

then place the remaining 3D part uniformly on the 2-sphere of radius
sqrt(1-w^2) via the Archimedes hat-box trick (shader.frag:153-158).

Two inverse-CDF implementations:

* `w_by_volume_newton` — a faithful re-expression of the reference's
  finite-difference Newton do-while loop (shader.frag:141-150), with
  per-lane masked iteration so the vectorized result equals the scalar
  reference lane-for-lane. This is the oracle/test mode. Its
  data-dependent trip count is hostile to TPU lanes (SURVEY §7 "hard
  parts") — every lane pays for the slowest lane.

* `w_by_volume_kepler` — the TPU-native production mode. Substituting
  w = cos(x/2) turns the CDF equation into Kepler's equation

      x - sin(x) = 2*pi*(1 - v),   x in [0, 2*pi]

  solved in a *fixed* number of ops: cube-root initial guess + Halley
  iterations (cubic convergence). Same monotone map v -> w as the
  reference, so with the same RNG stream it yields the same directions
  to ~1e-6 — tighter than the reference's own 2^-12 Newton tolerance —
  at a fraction of the transcendental cost and with static control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourd_ray_tracing_tpu.ops.vec4 import Vec4

PI = np.float32(3.14159265)
TWO_PI = np.float32(2.0) * PI
# "Small value, about 2^-12" (shader.frag:24).
SMALL_FLOAT = np.float32(0.0003)


def volume_by_w(w: jnp.ndarray) -> jnp.ndarray:
    """CDF of the w-marginal of the uniform S^3 distribution (shader.frag:136-138)."""
    w = jnp.asarray(w, jnp.float32)
    return (w * jnp.sqrt(1.0 - w * w) - jnp.arccos(w)) / PI + 1.0


def w_by_volume_newton(v: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """Invert volume_by_w exactly as the reference does (shader.frag:141-150).

    Finite-difference Newton from w=0 with one-sided step SMALL_FLOAT,
    iterated per-lane until that lane's |dw| < SMALL_FLOAT (do-while
    semantics: every lane runs at least one iteration). ``max_iters``
    bounds pathological non-convergence (the GLSL loop is unbounded).
    """
    v = jnp.asarray(v, jnp.float32)
    w0 = jnp.zeros_like(v)
    active0 = jnp.ones_like(v, dtype=bool)

    def body(state):
        w, active, it = state
        old_v = volume_by_w(w)
        df = jnp.where(
            w > 0.0,
            old_v - volume_by_w(w - SMALL_FLOAT),
            volume_by_w(w + SMALL_FLOAT) - old_v,
        )
        new_w = w - SMALL_FLOAT / df * (old_v - v)
        keep_going = jnp.abs(new_w - w) >= SMALL_FLOAT
        w = jnp.where(active, new_w, w)
        active = jnp.logical_and(active, keep_going)
        return w, active, it + 1

    def cond(state):
        _, active, it = state
        return jnp.logical_and(jnp.any(active), it < max_iters)

    w, _, _ = jax.lax.while_loop(cond, body, (w0, active0, jnp.int32(0)))
    return w


def _cbrt_nonneg(x: jnp.ndarray) -> jnp.ndarray:
    """cbrt for x >= 0 via exp(log/3) — Mosaic lacks a cbrt primitive;
    double-where keeps the x=0 lane and its gradient finite."""
    pos = x > 0.0
    safe = jnp.exp(jnp.log(jnp.where(pos, x, 1.0)) * (1.0 / 3.0))
    return jnp.where(pos, safe, 0.0)


def _solve_kepler_half(c: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Solve x - sin(x) = c for c in [0, pi], x in [0, pi]."""
    # Cube-root seed: x - sin x ~ x^3/6 near 0; globally decent on [0, pi].
    x = _cbrt_nonneg(6.0 * c)
    for _ in range(iters):
        s = jnp.sin(x)
        co = jnp.cos(x)
        f = x - s - c
        fp = 1.0 - co
        fpp = s
        # Halley step; fp >= 0, add tiny eps to avoid 0/0 at x=0 (f=0 there too).
        denom = 2.0 * fp * fp - f * fpp
        x = x - 2.0 * f * fp / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    return x


def w_by_volume_kepler(v: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Fixed-op-count inverse of volume_by_w via Kepler's equation.

    Accuracy: |w_kepler - w_exact| < 1e-5 over v in [0, 1) with the
    default 2 Halley iterations — already at the float32 rounding floor
    (iterations 3 and 4 change nothing; validated against a float64
    bisection oracle) and comfortably inside the reference solver's own
    2^-12 Newton tolerance.
    """
    v = jnp.asarray(v, jnp.float32)
    c = TWO_PI * (1.0 - v)
    # Symmetry: x(2*pi - c) = 2*pi - x(c); solve on [0, pi] only.
    mirrored = c > PI
    c_half = jnp.where(mirrored, TWO_PI - c, c)
    x = _solve_kepler_half(c_half, iters)
    x = jnp.where(mirrored, TWO_PI - x, x)
    return jnp.cos(0.5 * x)


def direction_from_uniforms(
    u_w: jnp.ndarray,
    u_z: jnp.ndarray,
    u_fi: jnp.ndarray,
    *,
    method: str = "kepler",
    kepler_iters: int = 2,
) -> Vec4:
    """Map three uniforms in [0,1) to a uniform direction on S^3.

    Follows shader.frag:153-158 call-for-call: u_w picks w through the
    inverse CDF, u_z picks z uniformly in [-r, r] (hat-box), u_fi the
    azimuth. The caller draws the uniforms from the counter RNG in this
    exact order to match the reference stream.
    """
    if method == "newton":
        w = w_by_volume_newton(u_w)
    elif method == "kepler":
        w = w_by_volume_kepler(u_w, iters=kepler_iters)
    else:
        raise ValueError(f"unknown method {method!r}")
    r = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    z = (u_z * 2.0 - 1.0) * r
    rho = jnp.sqrt(jnp.maximum(r * r - z * z, 0.0))
    fi = u_fi * TWO_PI
    return Vec4(rho * jnp.cos(fi), rho * jnp.sin(fi), z, w)

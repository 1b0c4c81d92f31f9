"""Ray-primitive intersections in R^4, batched SoA, mask-based.

Each function mirrors the behavior of a reference kernel sub-component
(SURVEY §2.2, shader.frag:163-400) but is written for TPU lanes: instead
of early returns it computes a ``hit`` mask alongside distance/normal,
and scenes fold candidates with `closest` (shader.frag:181-185). All
branches become `jnp.where` selects, so a (8,128) tile of rays maps
straight onto the VPU with zero divergence cost.

Primitive parameters are scalars or broadcastable arrays — they stay
differentiable JAX values, which is what makes the whole renderer
differentiable w.r.t. scene geometry.

Conventions preserved from the reference (bit-for-bit decisions):
* miss thresholds use SMALL_FLOAT exactly where the shader does;
* `outer=False` makes front walls transparent from outside
  (shader.frag:196);
* the duocylinder clips its second cylinder against ``cylinder2.r``
  where symmetry suggests ``cylinder1.r`` — replicated deliberately
  (shader.frag:290, SURVEY C6i fidelity note);
* hypercube cell tests keep first-hit-in-order semantics, not closest
  (shader.frag:394-400).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fourd_ray_tracing_tpu.ops.sampler import SMALL_FLOAT
from fourd_ray_tracing_tpu.ops.vec4 import (
    Vec3,
    Vec4,
    dot,
    length,
    point_in_space,
    vec_in_space,
)


def _safe_length(v: Vec4) -> jnp.ndarray:
    """|v| with a denormal-scale floor inside the sqrt.

    sqrt has an infinite derivative at 0; under masked-lane execution a
    zero-length vector on a MISS lane would turn the lane's (zero)
    cotangent into 0 * inf = NaN and poison the whole image gradient —
    the standard double-where trap. The 1e-37 floor is invisible in
    float32 for any |v|^2 > ~1e-30 and keeps the derivative finite.
    """
    return jnp.sqrt(dot(v, v) + 1e-37)


def _safe_sqrt_pos(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """sqrt(x) where valid (x > 0 there), exactly 0.0 elsewhere, with
    finite gradients on invalid lanes (double-where pattern)."""
    safe = jnp.sqrt(jnp.where(valid, x, 1.0))
    return jnp.where(valid, safe, 0.0)


class Material(NamedTuple):
    """Emissive-diffuse-mirror material (shader.frag:163-167)."""

    glow: jnp.ndarray       # emissive strength
    refl_prob: jnp.ndarray  # probability of mirror reflection
    color: Vec3             # albedo / emission tint

    @staticmethod
    def of(glow: float, refl_prob: float, color: tuple) -> "Material":
        return Material(
            jnp.asarray(glow, jnp.float32),
            jnp.asarray(refl_prob, jnp.float32),
            Vec3.of(*color),
        )


class Intersection(NamedTuple):
    """SoA hit record (shader.frag:171-176) with inlined material."""

    hit: jnp.ndarray
    dist: jnp.ndarray
    norm: Vec4
    glow: jnp.ndarray
    refl_prob: jnp.ndarray
    color: Vec3

    def where(self, mask: jnp.ndarray, other: "Intersection") -> "Intersection":
        # hit select as i1 bitwise ops, not select_n over bools (Mosaic
        # lowers bool select_n through an unsupported i8->i1 trunc).
        return Intersection(
            (mask & self.hit) | (~mask & other.hit),
            jnp.where(mask, self.dist, other.dist),
            self.norm.where(mask, other.norm),
            jnp.where(mask, self.glow, other.glow),
            jnp.where(mask, self.refl_prob, other.refl_prob),
            self.color.where(mask, other.color),
        )


def miss_like(ref: jnp.ndarray) -> Intersection:
    """NOT_INTERSECT (shader.frag:178) broadcast to the ray batch shape.

    The all-false mask is a comparison, not a bool constant: Mosaic can't
    materialize an i1 vector constant (i8->i1 trunc is unsupported), and
    XLA folds the compare anyway.
    """
    zero = jnp.zeros_like(ref)
    return Intersection(
        zero > jnp.ones_like(ref),
        zero,
        Vec4(zero, zero, zero, zero),
        zero,
        zero,
        Vec3(zero, zero, zero),
    )


def _masked(hit: jnp.ndarray, dist, norm: Vec4, material: Material, ref) -> Intersection:
    """Assemble a record, broadcasting material over the ray batch."""
    shape = hit.shape
    return Intersection(
        hit,
        jnp.broadcast_to(dist, shape),
        Vec4(*(jnp.broadcast_to(c, shape) for c in norm)),
        jnp.broadcast_to(material.glow, shape),
        jnp.broadcast_to(material.refl_prob, shape),
        Vec3(*(jnp.broadcast_to(c, shape) for c in material.color)),
    )


def closest(a: Intersection, b: Intersection) -> Intersection:
    """Nearer valid hit; ties keep ``b`` (shader.frag:181-185 semantics:
    closest(new, acc) keeps acc unless new is strictly nearer)."""
    take_a = jnp.logical_and(
        a.hit, jnp.logical_or(jnp.logical_not(b.hit), a.dist < b.dist)
    )
    return a.where(take_a, b)


# --- Hypersphere (shader.frag:189-221) -----------------------------------

def sphere_intersection(
    center: Vec4,
    r,
    material: Material,
    ray_o: Vec4,
    ray_d: Vec4,
    outer: bool = True,
) -> Intersection:
    """Ray / 3-sphere intersection.

    The reference solves this with an acos/asin angle chain
    (shader.frag:197-221); here we use the algebraically identical
    quadratic form (law of cosines collapses to it), which costs one
    sqrt instead of four transcendentals and is exactly equivalent in
    reals; `sphere_intersection_trig` keeps the literal formulation for
    fidelity testing. Semantics preserved:

    * outside ray receding (len_po >= r and b < 0) -> miss (:206);
    * tangent or beyond (discriminant <= 0 <=> sin_oap >= 1) -> miss (:213);
    * outer hit from outside -> near root, else far root (:215-216);
    * degenerate origin-at-center (len_po < SMALL_FLOAT) -> b treated 0 (:202);
    * normal points (center-hit)/r, flipped when hit from outside (:218-219).
    """
    po = center - ray_o
    l2 = dot(po, po)
    l = _safe_length(po)
    b = dot(po, ray_d)
    degenerate = l < SMALL_FLOAT
    b = jnp.where(degenerate, 0.0, b)
    miss_receding = jnp.logical_and(
        jnp.logical_not(degenerate), jnp.logical_and(l >= r, b < 0.0)
    )
    disc = r * r - (l2 - b * b)
    miss_tangent = disc <= 0.0
    s = _safe_sqrt_pos(disc, jnp.logical_not(miss_tangent))
    # ``outer`` is static — resolve at trace time rather than folding a
    # literal bool into logical_and (Mosaic can't make i1 constants).
    use_near = (l > r) if outer else (l < -jnp.inf)
    dist = jnp.where(use_near, b - s, b + s)
    hit = jnp.logical_not(jnp.logical_or(miss_receding, miss_tangent))
    hit_point = ray_o + ray_d * dist
    norm = (center - hit_point) * (1.0 / r)
    norm = (-norm).where(use_near, norm)
    return _masked(hit, dist, norm, material, l)


def sphere_intersection_trig(
    center: Vec4,
    r,
    material: Material,
    ray_o: Vec4,
    ray_d: Vec4,
    outer: bool = True,
) -> Intersection:
    """Literal re-expression of the reference's trigonometric solution
    (shader.frag:197-221), for parity/fidelity testing only."""
    po = center - ray_o
    l = length(po)
    degenerate = l < SMALL_FLOAT
    dot_pord = dot(po, ray_d)
    miss_receding = jnp.logical_and(
        jnp.logical_not(degenerate), jnp.logical_and(l >= r, dot_pord < 0.0)
    )
    cos_opa = jnp.where(degenerate, 0.0, jnp.clip(dot_pord / jnp.maximum(l, 1e-30), -1.0, 1.0))
    angle_opa = jnp.arccos(cos_opa)
    sin_oap = l * jnp.sin(angle_opa) / r
    miss_tangent = sin_oap >= 1.0
    angle_oap = jnp.arcsin(jnp.clip(sin_oap, -1.0, 1.0))
    use_near = jnp.logical_and(bool(outer), l > r)
    angle_oap = jnp.where(use_near, np.float32(np.pi) - angle_oap, angle_oap)
    angle_aop = np.float32(np.pi) - angle_opa - angle_oap
    dist = jnp.sqrt(
        jnp.maximum(r * r + l * l - 2.0 * r * l * jnp.cos(angle_aop), 0.0)
    )
    hit = jnp.logical_not(jnp.logical_or(miss_receding, miss_tangent))
    norm = (center - (ray_o + ray_d * dist)) * (1.0 / r)
    norm = (-norm).where(use_near, norm)
    return _masked(hit, dist, norm, material, l)


# --- Hyperplane ("space", shader.frag:225-239) ---------------------------

def space_intersection(
    point: Vec4, norm: Vec4, material: Material, ray_o: Vec4, ray_d: Vec4
) -> Intersection:
    """Double-sided hyperplane; normal auto-oriented toward the ray origin."""
    v = point - ray_o
    dot_vn = dot(v, norm)
    sgn = jnp.sign(dot_vn)
    drct_h = norm * sgn
    cos_dh = dot(drct_h, ray_d)
    hit = cos_dh >= SMALL_FLOAT
    dist = jnp.abs(dot_vn) / jnp.where(hit, cos_dh, 1.0)
    return _masked(hit, dist, -drct_h, material, dot_vn)


# --- Infinite 4D cylinder (shader.frag:243-275) --------------------------

def cylinder_intersection(
    point: Vec4,
    axis1: Vec4,
    axis2: Vec4,
    r,
    material: Material,
    ray_o: Vec4,
    ray_d: Vec4,
    outer: bool = True,
    trig: bool = False,
) -> Intersection:
    """Cylinder infinite along two orthogonal axes: project the ray into
    the 2-plane orthogonal to both axes, circle-intersect there, un-scale
    the distance by the projected direction length (shader.frag:251-267).

    ``trig`` switches the inner circle test to the reference's literal
    trigonometric sphere solution (fidelity/oracle mode)."""
    o1 = point_in_space(ray_o, point, axis1)
    d1 = vec_in_space(ray_d, axis1)
    miss1 = _safe_length(d1) < SMALL_FLOAT

    o12 = point_in_space(o1, point, axis2)
    d12 = vec_in_space(d1, axis2)
    d12_len = _safe_length(d12)
    miss2 = d12_len < SMALL_FLOAT
    inv_len = 1.0 / jnp.where(miss2, 1.0, d12_len)
    d12_unit = d12 * inv_len

    sphere_fn = sphere_intersection_trig if trig else sphere_intersection
    inter = sphere_fn(point, r, material, o12, d12_unit, outer)
    hit = jnp.logical_and(
        inter.hit, jnp.logical_not(jnp.logical_or(miss1, miss2))
    )
    return inter._replace(hit=hit, dist=inter.dist * inv_len)


def dist_to_axes_plane(
    dist, ray_o: Vec4, ray_d: Vec4, point: Vec4, axis1: Vec4, axis2: Vec4
) -> jnp.ndarray:
    """Distance from the ray point at parameter ``dist`` to the cylinder's
    axis 2-plane (shader.frag:270-275)."""
    p = ray_o + ray_d * dist
    p1 = point_in_space(p, point, axis1)
    p12 = point_in_space(p1, point, axis2)
    return _safe_length(point - p12)


# --- Duocylinder: union of two axis-swapped cylinders (shader.frag:279-294)

class CylinderSpec(NamedTuple):
    point: Vec4
    axis1: Vec4
    axis2: Vec4
    r: jnp.ndarray
    material: Material


def cylinders_union_intersection(
    cyl1: CylinderSpec, cyl2: CylinderSpec, ray_o: Vec4, ray_d: Vec4,
    trig: bool = False,
) -> Intersection:
    """Each cylinder's hit is kept only if it lies within the *other*
    cylinder's radius. NOTE: the second clip tests against cyl2.r, not
    cyl1.r — verbatim reference behavior (shader.frag:290, SURVEY C6i)."""
    inter1 = cylinder_intersection(
        cyl1.point, cyl1.axis1, cyl1.axis2, cyl1.r, cyl1.material, ray_o, ray_d,
        True, trig,
    )
    d1 = dist_to_axes_plane(inter1.dist, ray_o, ray_d, cyl2.point, cyl2.axis1, cyl2.axis2)
    inter1 = inter1._replace(hit=jnp.logical_and(inter1.hit, d1 <= cyl2.r))

    inter2 = cylinder_intersection(
        cyl2.point, cyl2.axis1, cyl2.axis2, cyl2.r, cyl2.material, ray_o, ray_d,
        True, trig,
    )
    d2 = dist_to_axes_plane(inter2.dist, ray_o, ray_d, cyl1.point, cyl1.axis1, cyl1.axis2)
    inter2 = inter2._replace(hit=jnp.logical_and(inter2.hit, d2 <= cyl2.r))

    return closest(inter1, inter2)


# --- Tiger (shader.frag:297-341) -----------------------------------------

class TigerSpec(NamedTuple):
    """Four cylinders built by init_tiger (shader.frag:303-314)."""

    inner_cyl1: CylinderSpec
    outer_cyl1: CylinderSpec
    inner_cyl2: CylinderSpec
    outer_cyl2: CylinderSpec


def make_tiger(
    point: Vec4,
    axis1: Vec4,
    axis2: Vec4,
    axis3: Vec4,
    axis4: Vec4,
    inner_r,
    outer_r,
    material1: Material,
    material2: Material,
) -> TigerSpec:
    inner_r = jnp.asarray(inner_r, jnp.float32)
    outer_r = jnp.asarray(outer_r, jnp.float32)
    return TigerSpec(
        CylinderSpec(point, axis1, axis2, inner_r, material1),
        CylinderSpec(point, axis1, axis2, outer_r, material1),
        CylinderSpec(point, axis3, axis4, inner_r, material2),
        CylinderSpec(point, axis3, axis4, outer_r, material2),
    )


def _tiger_face(
    cyl: CylinderSpec,
    outer_cyl: CylinderSpec,
    inner_cyl: CylinderSpec,
    ray_o: Vec4,
    ray_d: Vec4,
    outer: bool,
    trig: bool = False,
) -> Intersection:
    """One face: cylinder hit clipped to the [inner_r, outer_r] annulus of
    the other cylinder family (shader.frag:317-324)."""
    inter = cylinder_intersection(
        cyl.point, cyl.axis1, cyl.axis2, cyl.r, cyl.material, ray_o, ray_d,
        outer, trig,
    )
    d_out = dist_to_axes_plane(
        inter.dist, ray_o, ray_d, outer_cyl.point, outer_cyl.axis1, outer_cyl.axis2
    )
    d_in = dist_to_axes_plane(
        inter.dist, ray_o, ray_d, inner_cyl.point, inner_cyl.axis1, inner_cyl.axis2
    )
    keep = jnp.logical_and(d_out <= outer_cyl.r, d_in >= inner_cyl.r)
    return inter._replace(hit=jnp.logical_and(inter.hit, keep))


def tiger_intersection(
    tiger: TigerSpec, ray_o: Vec4, ray_d: Vec4, trig: bool = False
) -> Intersection:
    """Closest of the 8 face tests (4 cylinders x outer in {True, False},
    shader.frag:327-341)."""
    faces = []
    for cyl, ocyl, icyl in (
        (tiger.inner_cyl1, tiger.outer_cyl2, tiger.inner_cyl2),
        (tiger.outer_cyl1, tiger.outer_cyl2, tiger.inner_cyl2),
        (tiger.inner_cyl2, tiger.outer_cyl1, tiger.inner_cyl1),
        (tiger.outer_cyl2, tiger.outer_cyl1, tiger.inner_cyl1),
    ):
        for outer in (True, False):
            faces.append(_tiger_face(cyl, ocyl, icyl, ray_o, ray_d, outer, trig))
    inter = faces[0]
    for f in faces[1:]:
        inter = closest(f, inter)
    return inter


# --- Cube & hypercube (shader.frag:344-400) ------------------------------

class CubeSpec(NamedTuple):
    """3D cube living in a hyperplane (shader.frag:345-350)."""

    space_point: Vec4
    space_norm: Vec4
    x: Vec4
    y: Vec4
    z: Vec4
    r: jnp.ndarray
    material: Material


def cube_intersection(cube: CubeSpec, ray_o: Vec4, ray_d: Vec4) -> Intersection:
    """Front-facing hyperplane hit + 3 axis-extent rejections
    (shader.frag:352-366). Returned normal is the cube's hyperplane
    normal, not flipped."""
    vec_n = -cube.space_norm
    vec_c = cube.space_point - ray_o
    h = dot(vec_c, vec_n)
    cos_dn = dot(ray_d, vec_n)
    facing = jnp.logical_and(h >= 0.0, cos_dn >= 0.0)
    dist = h / jnp.where(cos_dn == 0.0, 1e-30, cos_dn)
    p = ray_o + ray_d * dist
    vec_cp = p - cube.space_point
    inside = jnp.logical_and(
        jnp.abs(dot(vec_cp, cube.x)) <= cube.r,
        jnp.logical_and(
            jnp.abs(dot(vec_cp, cube.y)) <= cube.r,
            jnp.abs(dot(vec_cp, cube.z)) <= cube.r,
        ),
    )
    hit = jnp.logical_and(facing, inside)
    return _masked(hit, dist, cube.space_norm, cube.material, h)


class HypercubeSpec(NamedTuple):
    cubes: tuple  # 8 CubeSpec cells


def make_hypercube(
    point: Vec4,
    x: Vec4,
    y: Vec4,
    z: Vec4,
    w: Vec4,
    r,
    materials: tuple,
) -> HypercubeSpec:
    """8 cells from center + 4 axes + half-width + 8 materials, in the
    reference's cell order (+x +y +z +w -x -y -z -w, shader.frag:374-392)."""
    r = jnp.asarray(r, jnp.float32)
    mxp, myp, mzp, mwp, mxn, myn, mzn, mwn = materials
    cells = (
        CubeSpec(point + x * r, x, y, z, w, r, mxp),
        CubeSpec(point + y * r, y, x, z, w, r, myp),
        CubeSpec(point + z * r, z, x, y, w, r, mzp),
        CubeSpec(point + w * r, w, x, y, z, r, mwp),
        CubeSpec(point - x * r, -x, y, z, w, r, mxn),
        CubeSpec(point - y * r, -y, x, z, w, r, myn),
        CubeSpec(point - z * r, -z, x, y, w, r, mzn),
        CubeSpec(point - w * r, -w, x, y, z, r, mwn),
    )
    return HypercubeSpec(cells)


def hypercube_intersection(
    hypercube: HypercubeSpec, ray_o: Vec4, ray_d: Vec4
) -> Intersection:
    """First cell hit in declaration order (shader.frag:394-400 early-exit
    loop), not closest-distance — preserved exactly."""
    inter = cube_intersection(hypercube.cubes[0], ray_o, ray_d)
    for cell in hypercube.cubes[1:]:
        cand = cube_intersection(cell, ray_o, ray_d)
        take_cand = jnp.logical_and(jnp.logical_not(inter.hit), cand.hit)
        inter = cand.where(take_cand, inter)
    return inter

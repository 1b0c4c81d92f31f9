"""Scalar NumPy transcription of /root/reference/executable/shader.frag.

Every function here transcribes the same-named GLSL function, line for
line, into float32 scalar NumPy (NEP50 keeps float32 against Python
literals). Vectors are (4,)/(3,) float32 ndarrays; control flow is plain
Python (the scalar shader's real control flow, including the
data-dependent do-while of w_by_volume and the early return of trace).

The ONLY deliberate departures from the GLSL text:

* Pixel convention. GLSL's gl_FragCoord has y growing up from the
  bottom; the production framework (and these tests) index row 0 at the
  TOP of the image. `render_light` therefore computes
  scr = ((j+0.5)/W, (i+0.5)/H) exactly like the production renderer —
  the same deterministic function of (row, col), just a flipped row
  order relative to a GL window. The per-pixel math downstream of
  scr_coord is the verbatim shader.
* RNG stream layout. rng_mode="sequential" is the reference verbatim
  (rand_iter_seed initialized once per pixel, shader.frag:90-92, carried
  across the sample loop). rng_mode="per_sample" replicates the
  production's sharding-stable layout: per (pixel, sample) streams keyed
  by pixel_bits ^ hash((s+1)*0x9E3779B9), counter re-initialized to the
  seed each sample. Both layouts are implemented here independently so
  each production mode has a non-circular reference.

No imports from fourd_ray_tracing_tpu — that is the whole point.
"""
from __future__ import annotations

import dataclasses

import numpy as np

F = np.float32
PI = F(3.14159265)          # shader.frag:23
SMALL_FLOAT = F(0.0003)     # shader.frag:24
_MASK32 = 0xFFFFFFFF


def vec4(x, y, z, w) -> np.ndarray:
    return np.array([x, y, z, w], dtype=np.float32)


def vec3(x, y, z) -> np.ndarray:
    return np.array([x, y, z], dtype=np.float32)


def dot(a: np.ndarray, b: np.ndarray) -> np.float32:
    # Elementwise fma-free sum, float32 throughout (GLSL dot()).
    s = F(0.0)
    for i in range(a.shape[0]):
        s = F(s + a[i] * b[i])
    return s


def length(v: np.ndarray) -> np.float32:
    return np.sqrt(dot(v, v))


def normalize(v: np.ndarray) -> np.ndarray:
    return (v / length(v)).astype(np.float32)


def reflect(d: np.ndarray, n: np.ndarray) -> np.ndarray:
    """GLSL built-in reflect: d - 2*dot(d,n)*n."""
    return (d - F(2.0) * dot(d, n) * n).astype(np.float32)


# --- Projection helpers (shader.frag:53-79) -------------------------------

def vec_in_space(vec: np.ndarray, norm: np.ndarray) -> np.ndarray:
    return (vec - norm * dot(vec, norm)).astype(np.float32)


def vec_to_space(point: np.ndarray, sp_point: np.ndarray, sp_norm: np.ndarray):
    return (sp_norm * dot(sp_point - point, sp_norm)).astype(np.float32)


def point_in_space(point: np.ndarray, sp_point: np.ndarray, sp_norm: np.ndarray):
    return (point + vec_to_space(point, sp_point, sp_norm)).astype(np.float32)


def redirect(vec: np.ndarray, norm: np.ndarray) -> np.ndarray:
    """shader.frag:82-85."""
    d = dot(vec, norm)
    if d >= 0.0:
        return vec
    return (vec - F(2.0) * d * norm).astype(np.float32)


# --- PRNG (shader.frag:88-121) --------------------------------------------

def hash_u32(x: int) -> int:
    """shader.frag:94-102, on Python ints masked to 32 bits."""
    x &= _MASK32
    x = (x + (x << 10)) & _MASK32
    x ^= x >> 6
    x = (x + (x << 3)) & _MASK32
    x ^= x >> 11
    x = (x + (x << 15)) & _MASK32
    x ^= x >> 9
    return x & _MASK32


def float_bits(f: np.float32) -> int:
    return int(np.float32(f).view(np.uint32))


class Rng:
    """Per-fragment RNG state (uint_seed + rand_iter_seed + scr_coord),
    shader.frag:90-92 and 104-118."""

    def __init__(self, seed: int, scr_x: np.float32, scr_y: np.float32):
        self.uint_seed = seed & _MASK32
        self.rand_iter_seed = self.uint_seed
        self.pixel_bits = float_bits(scr_x) ^ ((float_bits(scr_y) << 9) & _MASK32)

    def random_uint(self) -> int:
        self.rand_iter_seed = (self.rand_iter_seed + 0x79A010A9) & _MASK32
        return hash_u32(self.pixel_bits ^ self.rand_iter_seed ^ self.uint_seed)

    def rand(self) -> np.float32:
        bits = self.random_uint()
        bits &= 0x007FFFFF
        bits |= 0x3F800000
        return F(np.uint32(bits).view(np.float32) - F(1.0))

    def rand_outcome(self, probability: np.float32) -> bool:
        # shader.frag:121: rand() > p ? false : true
        return not (self.rand() > probability)


# --- Random point on the hypersphere (shader.frag:126-158) -----------------

def volume_by_w(w: np.float32) -> np.float32:
    return F((w * np.sqrt(F(1.0) - w * w) - np.arccos(w)) / PI + F(1.0))


def w_by_volume(v: np.float32) -> np.float32:
    """The literal do-while Newton loop (shader.frag:141-150)."""
    new_w = F(0.0)
    while True:
        old_w = new_w
        old_v = volume_by_w(old_w)
        if old_w > 0.0:
            df = F(old_v - volume_by_w(F(old_w - SMALL_FLOAT)))
        else:
            df = F(volume_by_w(F(old_w + SMALL_FLOAT)) - old_v)
        new_w = F(old_w - SMALL_FLOAT / df * (old_v - v))
        if not (abs(F(new_w - old_w)) >= SMALL_FLOAT):
            return new_w


def rand_drct(rng: Rng) -> np.ndarray:
    """shader.frag:153-158 (with cyl_vec_to_vec from :128-130 inlined)."""
    w = w_by_volume(rng.rand())
    r = np.sqrt(F(1.0) - w * w)
    z = F((rng.rand() * F(2.0) - F(1.0)) * r)
    rho = np.sqrt(F(r * r - z * z))
    fi = F(rng.rand() * F(2.0) * PI)
    return vec4(rho * np.cos(fi), rho * np.sin(fi), z, w)


# --- Materials & intersections (shader.frag:163-185) -----------------------

@dataclasses.dataclass
class Material:
    glow: np.float32
    refl_prob: np.float32
    color: np.ndarray  # vec3

    @staticmethod
    def of(glow, refl_prob, color):
        return Material(F(glow), F(refl_prob), vec3(*color))


NULL_MATERIAL = Material(F(0.0), F(0.0), vec3(0, 0, 0))


@dataclasses.dataclass
class Intersection:
    did_intersect: bool
    dist: np.float32
    norm: np.ndarray  # vec4
    material: Material


def NOT_INTERSECT() -> Intersection:
    return Intersection(False, F(0.0), vec4(0, 0, 0, 0), NULL_MATERIAL)


def closest(inter1: Intersection, inter2: Intersection) -> Intersection:
    """shader.frag:181-185."""
    if not inter1.did_intersect:
        return inter2
    if not inter2.did_intersect:
        return inter1
    return inter1 if inter1.dist < inter2.dist else inter2


# --- Primitives -------------------------------------------------------------

@dataclasses.dataclass
class Sphere:
    center: np.ndarray
    r: np.float32
    material: Material


def sphere_intersection(sp: Sphere, ray_point, ray_drct, outer: bool) -> Intersection:
    """The trigonometric solution, verbatim (shader.frag:197-221)."""
    vec_po = (sp.center - ray_point).astype(np.float32)
    len_po = length(vec_po)
    r = sp.r
    if len_po < SMALL_FLOAT:
        cos_opa = F(0.0)
    else:
        dot_pord = dot(vec_po, ray_drct)
        if len_po >= r and dot_pord < 0.0:
            return NOT_INTERSECT()
        cos_opa = F(dot_pord / len_po)
        if cos_opa > 1.0:
            cos_opa = F(1.0)
        if cos_opa < -1.0:
            cos_opa = F(-1.0)
    angle_opa = np.arccos(cos_opa)
    sin_oap = F(len_po * np.sin(angle_opa) / r)
    if sin_oap >= 1.0:
        return NOT_INTERSECT()
    angle_oap = np.arcsin(sin_oap)
    if outer and len_po > r:
        angle_oap = F(PI - angle_oap)
    angle_aop = F(PI - angle_opa - angle_oap)
    dist = np.sqrt(F(r * r + len_po * len_po - F(2.0) * r * len_po * np.cos(angle_aop)))
    norm = ((sp.center - (ray_point + ray_drct * dist)) / r).astype(np.float32)
    if outer and len_po > r:
        norm = (-norm).astype(np.float32)
    return Intersection(True, F(dist), norm, sp.material)


@dataclasses.dataclass
class Space:
    point: np.ndarray
    norm: np.ndarray
    material: Material


def space_intersection(sp: Space, ray_point, ray_drct) -> Intersection:
    """shader.frag:231-239."""
    vec_v = (sp.point - ray_point).astype(np.float32)
    dot_vn = dot(vec_v, sp.norm)
    drct_h = (sp.norm * np.sign(dot_vn)).astype(np.float32)
    cos_dh = dot(drct_h, ray_drct)
    if cos_dh < SMALL_FLOAT:
        return NOT_INTERSECT()
    dist = F(abs(dot_vn) / cos_dh)
    return Intersection(True, dist, (-drct_h).astype(np.float32), sp.material)


@dataclasses.dataclass
class Cylinder:
    point: np.ndarray
    axis1: np.ndarray
    axis2: np.ndarray
    r: np.float32
    material: Material


def cylinder_intersection(cyl: Cylinder, ray_point, ray_drct, outer: bool) -> Intersection:
    """shader.frag:251-267."""
    p1 = point_in_space(ray_point, cyl.point, cyl.axis1)
    d1 = vec_in_space(ray_drct, cyl.axis1)
    if length(d1) < SMALL_FLOAT:
        return NOT_INTERSECT()

    p12 = point_in_space(p1, cyl.point, cyl.axis2)
    d12 = vec_in_space(d1, cyl.axis2)
    drct_in_plane_length = length(d12)
    if drct_in_plane_length < SMALL_FLOAT:
        return NOT_INTERSECT()
    d12 = (d12 / drct_in_plane_length).astype(np.float32)

    inter = sphere_intersection(
        Sphere(cyl.point, cyl.r, cyl.material), p12, d12, outer
    )
    inter.dist = F(inter.dist / drct_in_plane_length)
    return inter


def dist_to_axes_plane(dist, ray_point, ray_drct, cyl: Cylinder) -> np.float32:
    """shader.frag:270-275."""
    p = (ray_point + ray_drct * dist).astype(np.float32)
    p1 = point_in_space(p, cyl.point, cyl.axis1)
    p12 = point_in_space(p1, cyl.point, cyl.axis2)
    return length((cyl.point - p12).astype(np.float32))


@dataclasses.dataclass
class CylindersUnion:
    cylinder1: Cylinder
    cylinder2: Cylinder


def cylinders_union_intersection(u: CylindersUnion, ray_point, ray_drct) -> Intersection:
    """shader.frag:284-294 — including the verbatim cylinder2.r clip on
    line 290 where symmetry suggests cylinder1.r (SURVEY C6i)."""
    inter1 = cylinder_intersection(u.cylinder1, ray_point, ray_drct, True)
    if dist_to_axes_plane(inter1.dist, ray_point, ray_drct, u.cylinder2) > u.cylinder2.r:
        inter1 = NOT_INTERSECT()

    inter2 = cylinder_intersection(u.cylinder2, ray_point, ray_drct, True)
    if dist_to_axes_plane(inter2.dist, ray_point, ray_drct, u.cylinder1) > u.cylinder2.r:
        inter2 = NOT_INTERSECT()

    return closest(inter1, inter2)


@dataclasses.dataclass
class Tiger:
    inner_cyl1: Cylinder
    outer_cyl1: Cylinder
    inner_cyl2: Cylinder
    outer_cyl2: Cylinder


def init_tiger(point, axis1, axis2, axis3, axis4, inner_r, outer_r,
               material1, material2) -> Tiger:
    """shader.frag:303-314."""
    return Tiger(
        Cylinder(point, axis1, axis2, F(inner_r), material1),
        Cylinder(point, axis1, axis2, F(outer_r), material1),
        Cylinder(point, axis3, axis4, F(inner_r), material2),
        Cylinder(point, axis3, axis4, F(outer_r), material2),
    )


def tigers_face_intersection(cyl, outer_cyl, inner_cyl, ray_point, ray_drct,
                             outer: bool) -> Intersection:
    """shader.frag:317-324."""
    inter = cylinder_intersection(cyl, ray_point, ray_drct, outer)
    if dist_to_axes_plane(inter.dist, ray_point, ray_drct, outer_cyl) > outer_cyl.r:
        return NOT_INTERSECT()
    if dist_to_axes_plane(inter.dist, ray_point, ray_drct, inner_cyl) < inner_cyl.r:
        return NOT_INTERSECT()
    return inter


def tiger_intersection(t: Tiger, ray_point, ray_drct) -> Intersection:
    """shader.frag:327-341."""
    i111 = tigers_face_intersection(t.inner_cyl1, t.outer_cyl2, t.inner_cyl2, ray_point, ray_drct, True)
    i112 = tigers_face_intersection(t.inner_cyl1, t.outer_cyl2, t.inner_cyl2, ray_point, ray_drct, False)
    i121 = tigers_face_intersection(t.outer_cyl1, t.outer_cyl2, t.inner_cyl2, ray_point, ray_drct, True)
    i122 = tigers_face_intersection(t.outer_cyl1, t.outer_cyl2, t.inner_cyl2, ray_point, ray_drct, False)
    i211 = tigers_face_intersection(t.inner_cyl2, t.outer_cyl1, t.inner_cyl1, ray_point, ray_drct, True)
    i212 = tigers_face_intersection(t.inner_cyl2, t.outer_cyl1, t.inner_cyl1, ray_point, ray_drct, False)
    i221 = tigers_face_intersection(t.outer_cyl2, t.outer_cyl1, t.inner_cyl1, ray_point, ray_drct, True)
    i222 = tigers_face_intersection(t.outer_cyl2, t.outer_cyl1, t.inner_cyl1, ray_point, ray_drct, False)
    return closest(
        closest(closest(i111, i112), closest(i121, i122)),
        closest(closest(i211, i212), closest(i221, i222)),
    )


@dataclasses.dataclass
class Cube:
    space_point: np.ndarray
    space_norm: np.ndarray
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    r: np.float32
    material: Material


def cube_intersection(cube: Cube, ray_point, ray_drct) -> Intersection:
    """shader.frag:352-366."""
    vec_n = (-cube.space_norm).astype(np.float32)
    vec_c = (cube.space_point - ray_point).astype(np.float32)
    h = dot(vec_c, vec_n)
    if h < 0.0:
        return NOT_INTERSECT()
    cos_dn = dot(ray_drct, vec_n)
    if cos_dn < 0.0:
        return NOT_INTERSECT()
    with np.errstate(divide="ignore"):
        dist = F(h / cos_dn)  # cos_dn == 0 -> inf, exactly the GLSL
    point = (ray_point + ray_drct * dist).astype(np.float32)
    vec_cp = (point - cube.space_point).astype(np.float32)
    if abs(dot(vec_cp, cube.x)) > cube.r:
        return NOT_INTERSECT()
    if abs(dot(vec_cp, cube.y)) > cube.r:
        return NOT_INTERSECT()
    if abs(dot(vec_cp, cube.z)) > cube.r:
        return NOT_INTERSECT()
    return Intersection(True, dist, cube.space_norm, cube.material)


@dataclasses.dataclass
class Hypercube:
    cubes: tuple  # 8 Cube cells


def init_hypercube(point, x, y, z, w, r, materials) -> Hypercube:
    """shader.frag:374-392 (cell order +x +y +z +w -x -y -z -w)."""
    r = F(r)
    mxp, myp, mzp, mwp, mxn, myn, mzn, mwn = materials
    mk = lambda p, n, a, b, c, m: Cube(
        (p).astype(np.float32), n.astype(np.float32), a, b, c, r, m
    )
    return Hypercube((
        mk(point + x * r, x, y, z, w, mxp),
        mk(point + y * r, y, x, z, w, myp),
        mk(point + z * r, z, x, y, w, mzp),
        mk(point + w * r, w, x, y, z, mwp),
        mk(point - x * r, (-x), y, z, w, mxn),
        mk(point - y * r, (-y), x, z, w, myn),
        mk(point - z * r, (-z), x, y, w, mzn),
        mk(point - w * r, (-w), x, y, z, mwn),
    ))


def hypercube_intersection(hc: Hypercube, ray_point, ray_drct) -> Intersection:
    """First hit in cell order (shader.frag:394-400)."""
    for cube in hc.cubes:
        inter = cube_intersection(cube, ray_point, ray_drct)
        if inter.did_intersect:
            return inter
    return NOT_INTERSECT()


# --- Sun & sky (shader.frag:404-468) ----------------------------------------

@dataclasses.dataclass
class SunProperties:
    drct: np.ndarray
    angular_size: np.float32
    light: np.ndarray  # vec3
    sharpness: np.float32


@dataclasses.dataclass
class OracleScene:
    """find_intersection + final_light for one scene snippet (§2.3)."""

    spaces: tuple = ()
    spheres: tuple = ()
    cylinders: tuple = ()
    cylinders_union: CylindersUnion | None = None
    hypercube: Hypercube | None = None
    tiger: Tiger | None = None
    sun: SunProperties | None = None
    sky_light: np.ndarray | None = None
    black_final_light: bool = False  # room scene's final_light override

    def find_intersection(self, ray_point, ray_drct) -> Intersection:
        """The scene fold, in every snippet's order: spaces, spheres,
        cylinders, union, hypercube, tiger (shader.frag:434-451)."""
        inter = NOT_INTERSECT()
        for sp in self.spaces:
            inter = closest(space_intersection(sp, ray_point, ray_drct), inter)
        for s in self.spheres:
            inter = closest(sphere_intersection(s, ray_point, ray_drct, True), inter)
        for c in self.cylinders:
            inter = closest(cylinder_intersection(c, ray_point, ray_drct, True), inter)
        if self.cylinders_union is not None:
            inter = closest(
                cylinders_union_intersection(self.cylinders_union, ray_point, ray_drct),
                inter,
            )
        if self.hypercube is not None:
            inter = closest(hypercube_intersection(self.hypercube, ray_point, ray_drct), inter)
        if self.tiger is not None:
            inter = closest(tiger_intersection(self.tiger, ray_point, ray_drct), inter)
        return inter

    def final_light(self, drct: np.ndarray) -> np.ndarray:
        """shader.frag:454-468 (or the room's vec3(0) override)."""
        if self.black_final_light:
            return vec3(0, 0, 0)
        sun = self.sun
        # angle() (shader.frag:45-50)
        v_cos = F(dot(drct, sun.drct) / length(drct) / length(sun.drct))
        deviation = np.arccos(np.clip(v_cos, F(-1.0), F(1.0)))
        if deviation < sun.angular_size:
            k = F(deviation / sun.angular_size)
            s = sun.sharpness
            k = F((s * s * k / (F(1.0) - s * k) + F(1.0)) * (F(1.0) - k))
            return (sun.light * k + self.sky_light * (F(1.0) - k)).astype(np.float32)
        return self.sky_light


# --- Trace loop & main (shader.frag:471-528) --------------------------------

def trace(scene: OracleScene, ray_point, ray_drct, rng: Rng,
          reflections_amount: int, small_indent: np.float32) -> np.ndarray:
    """shader.frag:471-495, verbatim — note the direction update (and its
    rand() draws) happens on EVERY iteration including the last; only the
    miss path returns early without drawing."""
    result_light = vec3(0, 0, 0)
    unabsorbed = vec3(1, 1, 1)
    point = ray_point.astype(np.float32).copy()
    drct = ray_drct.astype(np.float32).copy()
    for _ in range(reflections_amount + 1):
        inter = scene.find_intersection(point, drct)
        if not inter.did_intersect:
            return (result_light + unabsorbed * scene.final_light(drct)).astype(np.float32)
        result_light = (
            result_light + inter.material.color * inter.material.glow * unabsorbed
        ).astype(np.float32)
        unabsorbed = (unabsorbed * inter.material.color).astype(np.float32)
        point = (point + drct * inter.dist + inter.norm * small_indent).astype(np.float32)
        if rng.rand_outcome(inter.material.refl_prob):
            drct = reflect(drct, inter.norm)
        else:
            drct = redirect(rand_drct(rng), inter.norm)
    return result_light


@dataclasses.dataclass
class OracleCamera:
    """The camera uniforms (shader.frag:16-19): focus, vec_to_mtr, per-view
    (top, right), film sizes (mtr_w = mtr_h * GOLDEN, main.cpp:37-38)."""

    focus: np.ndarray
    vec_to_mtr: np.ndarray
    top: np.ndarray
    right: np.ndarray
    mtr_width: np.float32
    mtr_height: np.float32


def ray_drct(cam: OracleCamera, scr_x: np.float32, scr_y: np.float32) -> np.ndarray:
    """shader.frag:501-505 with the production's top-row-0 convention."""
    mx = F((scr_x - F(0.5)) * cam.mtr_width)
    my = F((F(0.5) - scr_y) * cam.mtr_height)
    return normalize((cam.vec_to_mtr + cam.top * my + cam.right * mx).astype(np.float32))


def light_to_color(light: np.ndarray, coefficient: np.float32) -> np.ndarray:
    """shader.frag:509-511."""
    return (F(1.0) - F(1.0) / (coefficient * light + F(1.0))).astype(np.float32)


def _per_sample_bits(pixel_bits: int, sample_index: int) -> int:
    """The production per-(pixel, sample) stream key, re-derived
    independently: pixel_bits ^ hash((s+1) * 0x9E3779B9)."""
    fold = hash_u32(((sample_index + 1) * 0x9E3779B9) & _MASK32)
    return (pixel_bits ^ fold) & _MASK32


def render_light(scene: OracleScene, cam: OracleCamera, width: int, height: int,
                 seed: int, samples: int, reflections_amount: int,
                 small_indent: float = 0.005,
                 rng_mode: str = "sequential") -> np.ndarray:
    """Sample-averaged light, shape (H, W, 3), row 0 = top.

    scr coords match the production renderer exactly:
    scr = ((col+0.5)/W, (row+0.5)/H), computed in float32.
    """
    small_indent = F(small_indent)
    out = np.zeros((height, width, 3), np.float32)
    for i in range(height):
        scr_y = F(F(F(i) + F(0.5)) / F(height))
        for j in range(width):
            scr_x = F(F(F(j) + F(0.5)) / F(width))
            rng = Rng(seed, scr_x, scr_y)
            d = ray_drct(cam, scr_x, scr_y)
            light = vec3(0, 0, 0)
            for s in range(samples):
                if rng_mode == "per_sample":
                    rng.rand_iter_seed = rng.uint_seed
                    rng.pixel_bits = _per_sample_bits(
                        float_bits(scr_x) ^ ((float_bits(scr_y) << 9) & _MASK32), s
                    )
                light = (light + trace(
                    scene, cam.focus, d, rng, reflections_amount, small_indent
                )).astype(np.float32)
            out[i, j] = (light / F(samples)).astype(np.float32)
    return out


def render_image(scene: OracleScene, cam: OracleCamera, width: int, height: int,
                 seed: int, samples: int, reflections_amount: int,
                 small_indent: float = 0.005, light_coefficient: float = 1.0,
                 rng_mode: str = "sequential") -> np.ndarray:
    """Tone-mapped image (shader.frag:522-525), shape (H, W, 3)."""
    light = render_light(
        scene, cam, width, height, seed, samples, reflections_amount,
        small_indent, rng_mode,
    )
    return light_to_color(light, F(light_coefficient))

"""Per-primitive intersection tests (SURVEY §4.2-4.3, C6f-C6k checklist)."""
import numpy as np
import jax.numpy as jnp

from fourd_ray_tracing_tpu.ops import geometry as geo
from fourd_ray_tracing_tpu.ops.vec4 import Vec4, dot, length

MAT = geo.Material.of(0.0, 0.0, (1.0, 0.5, 0.25))


def v4(*c):
    return Vec4.of(*c)


def batch_rays(origins, dirs):
    o = np.asarray(origins, np.float32)
    d = np.asarray(dirs, np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return (
        Vec4(*(jnp.asarray(o[..., k]) for k in range(4))),
        Vec4(*(jnp.asarray(d[..., k]) for k in range(4))),
    )


class TestSphere:
    def test_head_on_hit(self):
        o, d = batch_rays([[0, 0, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 1.0, MAT, o, d, True)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 4.0, atol=1e-5)
        # outward normal back toward ray
        np.testing.assert_allclose(float(inter.norm.y[0]), -1.0, atol=1e-5)

    def test_receding_miss(self):
        o, d = batch_rays([[0, 0, 0, 0]], [[0, -1, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 1.0, MAT, o, d, True)
        assert not bool(inter.hit[0])

    def test_inside_hits_far_wall(self):
        o, d = batch_rays([[0, 4.5, 0, 0]], [[0, -1, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 1.0, MAT, o, d, True)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 0.5, atol=1e-5)
        # normal points from hit toward center (not flipped when inside)
        np.testing.assert_allclose(float(inter.norm.y[0]), 1.0, atol=1e-5)

    def test_outer_false_passes_front_wall(self):
        o, d = batch_rays([[0, 0, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 1.0, MAT, o, d, False)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 6.0, atol=1e-5)

    def test_beyond_tangent_miss(self):
        o, d = batch_rays([[0, 0, 1.5, 0]], [[0, 1, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 1.0, MAT, o, d, True)
        assert not bool(inter.hit[0])

    def test_origin_at_center(self):
        o, d = batch_rays([[0, 5, 0, 0]], [[1, 0, 0, 0]])
        inter = geo.sphere_intersection(v4(0, 5, 0, 0), 2.0, MAT, o, d, True)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 2.0, atol=1e-5)

    def test_matches_trig_form(self, rng_np):
        n = 2000
        o_np = rng_np.normal(size=(n, 4)) * 3
        d_np = rng_np.normal(size=(n, 4))
        o, d = batch_rays(o_np, d_np)
        for outer in (True, False):
            a = geo.sphere_intersection(v4(0.3, -0.2, 0.5, 0.1), 1.3, MAT, o, d, outer)
            b = geo.sphere_intersection_trig(
                v4(0.3, -0.2, 0.5, 0.1), 1.3, MAT, o, d, outer
            )
            hits_a, hits_b = np.asarray(a.hit), np.asarray(b.hit)
            # hit decisions agree except possibly at ulp-level tangency
            assert (hits_a == hits_b).mean() > 0.999
            both = hits_a & hits_b
            np.testing.assert_allclose(
                np.asarray(a.dist)[both], np.asarray(b.dist)[both], atol=2e-3
            )

    def test_normals_unit(self, rng_np):
        o_np = rng_np.normal(size=(500, 4)) * 3
        d_np = rng_np.normal(size=(500, 4))
        o, d = batch_rays(o_np, d_np)
        inter = geo.sphere_intersection(v4(0, 0, 0, 0), 1.0, MAT, o, d, True)
        hits = np.asarray(inter.hit)
        norms = np.asarray(length(inter.norm))
        np.testing.assert_allclose(norms[hits], 1.0, atol=1e-4)


class TestSpace:
    def test_hit_from_both_sides(self):
        o, d = batch_rays([[0, 0, 2, 0], [0, 0, -2, 0]], [[0, 0, -1, 0], [0, 0, 1, 0]])
        inter = geo.space_intersection(v4(0, 0, 0, 0), v4(0, 0, 1, 0), MAT, o, d)
        assert bool(inter.hit[0]) and bool(inter.hit[1])
        np.testing.assert_allclose(np.asarray(inter.dist), [2.0, 2.0], atol=1e-6)
        # normal faces the ray origin
        assert float(inter.norm.z[0]) > 0
        assert float(inter.norm.z[1]) < 0

    def test_parallel_miss(self):
        o, d = batch_rays([[0, 0, 2, 0]], [[1, 0, 0, 0]])
        inter = geo.space_intersection(v4(0, 0, 0, 0), v4(0, 0, 1, 0), MAT, o, d)
        assert not bool(inter.hit[0])

    def test_receding_miss(self):
        o, d = batch_rays([[0, 0, 2, 0]], [[0, 0, 1, 0]])
        inter = geo.space_intersection(v4(0, 0, 0, 0), v4(0, 0, 1, 0), MAT, o, d)
        assert not bool(inter.hit[0])

    def test_oblique_distance(self):
        s2 = 1.0 / np.sqrt(2.0)
        o, d = batch_rays([[0, 0, 1, 0]], [[s2, 0, -s2, 0]])
        inter = geo.space_intersection(v4(0, 0, 0, 0), v4(0, 0, 1, 0), MAT, o, d)
        np.testing.assert_allclose(float(inter.dist[0]), np.sqrt(2.0), atol=1e-5)


class TestCylinder:
    # Cylinder through origin, infinite along x (axis1) and w (axis2), r=1:
    # the set { y^2 + z^2 = 1 } — a circle in the (y, z) plane.
    def cyl(self):
        return dict(
            point=v4(0, 0, 0, 0), axis1=v4(1, 0, 0, 0), axis2=v4(0, 0, 0, 1), r=1.0
        )

    def test_perpendicular_hit(self):
        o, d = batch_rays([[0, -3, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.cylinder_intersection(
            **self.cyl(), material=MAT, ray_o=o, ray_d=d, outer=True
        )
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 2.0, atol=1e-5)

    def test_oblique_hit_distance_rescaled(self):
        # 45 degrees between ray and the x axis: projected dir length 1/sqrt(2)
        s2 = 1.0 / np.sqrt(2.0)
        o, d = batch_rays([[0, -3, 0, 0]], [[s2, s2, 0, 0]])
        inter = geo.cylinder_intersection(
            **self.cyl(), material=MAT, ray_o=o, ray_d=d, outer=True
        )
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 2.0 * np.sqrt(2.0), atol=1e-5)

    def test_axis_parallel_miss(self):
        o, d = batch_rays([[0, -3, 0, 0]], [[1, 0, 0, 0]])
        inter = geo.cylinder_intersection(
            **self.cyl(), material=MAT, ray_o=o, ray_d=d, outer=True
        )
        assert not bool(inter.hit[0])

    def test_dist_to_axes_plane(self):
        o, d = batch_rays([[0, -3, 0, 0]], [[0, 1, 0, 0]])
        dd = geo.dist_to_axes_plane(
            jnp.asarray([3.0]), o, d, v4(0, 0, 0, 0), v4(1, 0, 0, 0), v4(0, 0, 0, 1)
        )
        # point (0,0,0,0) is on the axes plane
        np.testing.assert_allclose(float(dd[0]), 0.0, atol=1e-6)
        dd = geo.dist_to_axes_plane(
            jnp.asarray([1.0]), o, d, v4(0, 0, 0, 0), v4(1, 0, 0, 0), v4(0, 0, 0, 1)
        )
        np.testing.assert_allclose(float(dd[0]), 2.0, atol=1e-6)


class TestDuocylinder:
    def specs(self):
        c1 = geo.CylinderSpec(v4(0, 0, 0, 0), v4(1, 0, 0, 0), v4(0, 0, 0, 1),
                              jnp.float32(1.0), MAT)
        c2 = geo.CylinderSpec(v4(0, 0, 0, 0), v4(0, 0, 1, 0), v4(0, 1, 0, 0),
                              jnp.float32(1.0), MAT)
        return c1, c2

    def test_hit_inside_other_radius(self):
        c1, c2 = self.specs()
        o, d = batch_rays([[0, -3, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.cylinders_union_intersection(c1, c2, o, d)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 2.0, atol=1e-5)

    def test_clipped_outside_other_radius(self):
        c1, c2 = self.specs()
        # Ray hits cylinder1's surface at x=5: distance from (5,?,?,0) to
        # cylinder2's axes plane (x=w=0 plane -> distance sqrt(x^2+w^2)=5) > r
        o, d = batch_rays([[5, -3, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.cylinders_union_intersection(c1, c2, o, d)
        assert not bool(inter.hit[0])


class TestTiger:
    def tiger(self):
        return geo.make_tiger(
            v4(0, 0, 0, 0),
            v4(1, 0, 0, 0), v4(0, 0, 0, 1),
            v4(0, 0, 1, 0), v4(0, 1, 0, 0),
            0.9, 1.4, MAT, MAT,
        )

    def test_hits_annulus(self):
        # Family-1 cylinders: circle y^2+z^2 in {0.9, 1.4}; clip by family-2
        # distance sqrt(x^2+w^2) within [0.9, 1.4]. Ray along +y at x=1.1:
        o, d = batch_rays([[1.1, -5, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.tiger_intersection(self.tiger(), o, d)
        assert bool(inter.hit[0])

    def test_miss_through_hole(self):
        # x=0 -> family-2 distance 0 < inner_r for family-1 faces; and the
        # ray stays at sqrt(x^2+w^2)=0 so family-2 faces (radius in y,x? no:
        # family-2 measures sqrt(y^2+z^2) at... ) – center line passes clean
        # through the tiger's hole.
        o, d = batch_rays([[0, -5, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.tiger_intersection(self.tiger(), o, d)
        assert not bool(inter.hit[0])


class TestHypercube:
    def cube(self):
        mats = tuple(
            geo.Material.of(0.0, 0.0, (i / 8, 0.5, 1 - i / 8)) for i in range(8)
        )
        return geo.make_hypercube(
            v4(0, 0, 0, 0),
            v4(1, 0, 0, 0), v4(0, 1, 0, 0), v4(0, 0, 1, 0), v4(0, 0, 0, 1),
            1.0, mats,
        )

    def test_face_hit(self):
        o, d = batch_rays([[0, -3, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.hypercube_intersection(self.cube(), o, d)
        assert bool(inter.hit[0])
        np.testing.assert_allclose(float(inter.dist[0]), 2.0, atol=1e-5)
        # -y cell's material is index 5
        np.testing.assert_allclose(float(inter.color.x[0]), 5 / 8, atol=1e-6)

    def test_corner_miss(self):
        o, d = batch_rays([[3, -3, 3, 3]], [[0, 1, 0, 0]])
        inter = geo.hypercube_intersection(self.cube(), o, d)
        assert not bool(inter.hit[0])

    def test_from_inside_misses_all_cells(self):
        # One-sided faces: invisible from inside (shader.frag:356-358).
        o, d = batch_rays([[0, 0, 0, 0]], [[0, 1, 0, 0]])
        inter = geo.hypercube_intersection(self.cube(), o, d)
        assert not bool(inter.hit[0])


class TestProperties:
    """Property tests (SURVEY §4.3)."""

    def test_distances_nonnegative_and_normals_unit(self, rng_np):
        o_np = rng_np.normal(size=(3000, 4)) * 4
        d_np = rng_np.normal(size=(3000, 4))
        o, d = batch_rays(o_np, d_np)
        tiger = geo.make_tiger(
            v4(0, 2, 0, 0), v4(1, 0, 0, 0), v4(0, 0, 0, 1),
            v4(0, 0, 1, 0), v4(0, 1, 0, 0), 0.9, 1.4, MAT, MAT,
        )
        records = [
            geo.sphere_intersection(v4(0, 2, 0, 0), 1.0, MAT, o, d, True),
            geo.space_intersection(v4(0, 0, -1.5, 0), v4(0, 0, 1, 0), MAT, o, d),
            geo.cylinder_intersection(
                v4(0, 2, 0, 0), v4(1, 0, 0, 0), v4(0, 0, 0, 1), 1.0, MAT, o, d, True
            ),
            geo.tiger_intersection(tiger, o, d),
        ]
        for inter in records:
            hits = np.asarray(inter.hit)
            dist = np.asarray(inter.dist)
            assert (dist[hits] >= 0).all()
            n = np.asarray(length(inter.norm))
            np.testing.assert_allclose(n[hits], 1.0, atol=1e-3)
            # normal faces the incoming ray: dot(norm, d) <= ~0
            facing = np.asarray(dot(inter.norm, d))
            assert (facing[hits] <= 1e-3).all()

"""Fast fused intersection (models/scene.py:intersect_scene_fast) vs the
literal spec fold, per canonical scene, over random ray batches.

Agreement contract: identical hit masks and fields away from mask edges
(grazing hits / degenerate origins); the squared-space reformulation may
flip classification of rays within ~1e-5 of an edge, so a small
disagreement fraction is tolerated and bounded.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.scene import (
    intersect_scene_fast,
    intersect_scene_spec,
)
from fourd_ray_tracing_tpu.ops.vec4 import Vec4, normalize


def random_rays(rng, n, spread=4.0):
    o = Vec4(*(jnp.asarray(rng.uniform(-spread, spread, n), jnp.float32)
               for _ in range(4)))
    d = normalize(Vec4(*(jnp.asarray(rng.normal(size=n), jnp.float32)
                         for _ in range(4))))
    return o, d


@pytest.mark.parametrize("scene_name", sorted(library.SCENES))
def test_fast_matches_spec(scene_name, rng_np):
    scene = library.SCENES[scene_name]()
    o, d = random_rays(rng_np, 4096)
    fast = jax.jit(intersect_scene_fast)(scene, o, d)
    spec = jax.jit(intersect_scene_spec)(scene, o, d)

    hit_f = np.asarray(fast.hit)
    hit_s = np.asarray(spec.hit)
    disagree = hit_f != hit_s
    assert disagree.mean() < 0.005, f"hit masks differ on {disagree.mean():.2%}"

    both = np.logical_and(hit_f, hit_s)
    # Distances agree where both hit the same object (ties/edges may pick
    # a different object at ulp level -- bounded by the same fraction).
    dd = np.abs(np.asarray(fast.dist) - np.asarray(spec.dist))[both]
    same_obj = dd < 1e-3
    assert same_obj.mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(fast.dist)[both][same_obj],
        np.asarray(spec.dist)[both][same_obj],
        atol=5e-5, rtol=1e-4,
    )
    for cf, cs in zip(fast.norm, spec.norm):
        diff = np.abs(np.asarray(cf) - np.asarray(cs))[both][same_obj]
        assert np.quantile(diff, 0.999) < 1e-3
    for name in ("glow", "refl_prob"):
        a = np.asarray(getattr(fast, name))[both][same_obj]
        b = np.asarray(getattr(spec, name))[both][same_obj]
        np.testing.assert_allclose(a, b, atol=1e-6)
    for cf, cs in zip(fast.color, spec.color):
        np.testing.assert_allclose(
            np.asarray(cf)[both][same_obj], np.asarray(cs)[both][same_obj],
            atol=1e-6,
        )


def test_fast_miss_record_matches_spec_semantics(rng_np):
    # A ray pointing away from everything: dist 0, hit False, zero fields.
    scene = library.sphere_plane_light()
    o = Vec4.of(0.0, -50.0, 10.0, 0.0)
    d = normalize(Vec4.of(0.0, -1.0, 0.5, 0.0))
    o = Vec4(*(jnp.broadcast_to(c, (8,)) for c in o))
    d = Vec4(*(jnp.broadcast_to(c, (8,)) for c in d))
    rec = intersect_scene_fast(scene, o, d)
    assert not np.asarray(rec.hit).any()
    np.testing.assert_array_equal(np.asarray(rec.dist), 0.0)


def test_plane_pair_fold_bit_identical(rng_np):
    """Opposite-wall pairing (plane_pair_hints + the 2-select nearest-wall
    candidate) must be BIT-identical to the per-plane fold: same
    distances, hits, oriented normals and materials on random rays."""
    from fourd_ray_tracing_tpu.models.scene import (
        plane_norm_hints,
        plane_pair_hints,
    )

    scene = library.room_with_sphere()
    hints = plane_norm_hints(scene)
    pairs = plane_pair_hints(scene, hints)
    assert pairs is not None
    pair_list, singles = pairs
    assert len(pair_list) == 4 and singles == ()  # 8 walls -> 4 axis pairs

    o_np = rng_np.uniform(-4.2, 4.2, size=(2048, 4)).astype(np.float32)
    d_np = rng_np.normal(size=(2048, 4)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec4.unstack(jnp.asarray(o_np))
    d = Vec4.unstack(jnp.asarray(d_np.astype(np.float32)))

    a = intersect_scene_fast(scene, o, d, plane_hints=hints)
    b = intersect_scene_fast(scene, o, d, plane_hints=hints, plane_pairs=pairs)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.dist), np.asarray(b.dist))
    for ca, cb in zip(a.norm, b.norm):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(a.glow), np.asarray(b.glow))
    for ca, cb in zip(a.color, b.color):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_plane_pair_hints_unavailable_cases():
    from fourd_ray_tracing_tpu.models.scene import (
        plane_norm_hints,
        plane_pair_hints,
    )

    # Single-plane scenes: nothing to pair.
    scene = library.tiger()
    assert plane_pair_hints(scene, plane_norm_hints(scene)) is None
    # No hints -> no pairing.
    assert plane_pair_hints(library.room_with_sphere(), None) is None


def test_plane_pair_fold_mixed_scene(rng_np):
    """Pairing with negative unit normals, unpaired singles and a
    non-unit-normal plane (which must NOT pair) — still bit-identical."""
    from fourd_ray_tracing_tpu.models.scene import (
        Scene,
        material,
        plane_norm_hints,
        plane_pair_hints,
        space,
    )

    scene = Scene(spaces=(
        space((2, 0, 0, 0), (-1, 0, 0, 0), material(0, 0, (1, 0, 0))),   # pair A
        space((0, 5, 0, 0), (0, 1, 0, 0), material(0, 0, (0, 1, 0))),    # single (no partner)
        space((-2, 0, 0, 0), (1, 0, 0, 0), material(0, 0, (0, 0, 1))),   # pair A
        space((0, 0, 3, 0), (0, 0, 2, 0), material(0, 0, (1, 1, 0))),    # non-unit: single
        space((0, 0, -3, 0), (0, 0, 1, 0), material(0, 0, (1, 0, 1))),   # no partner (other is non-unit)
    ))
    hints = plane_norm_hints(scene)
    pairs = plane_pair_hints(scene, hints)
    assert pairs is not None
    pair_list, singles = pairs
    assert pair_list == ((2, 0, 0),)  # offsets -2 < 2 along x
    assert set(singles) == {1, 3, 4}

    o_np = rng_np.uniform(-4, 4, size=(1024, 4)).astype(np.float32)
    d_np = rng_np.normal(size=(1024, 4)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec4.unstack(jnp.asarray(o_np))
    d = Vec4.unstack(jnp.asarray(d_np.astype(np.float32)))
    a = intersect_scene_fast(scene, o, d, plane_hints=hints)
    b = intersect_scene_fast(scene, o, d, plane_hints=hints, plane_pairs=pairs)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.dist), np.asarray(b.dist))
    for ca, cb in zip(a.norm, b.norm):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    for ca, cb in zip(a.color, b.color):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


@pytest.mark.parametrize("which", ["tiger", "duocylinder"])
def test_shared_projection_fast_paths(which, rng_np):
    """tiger_intersection_fast / cylinders_union_intersection_fast (one
    projection per cylinder family, clips in squared space) vs the
    literal per-face re-projection: same hits, distances/normals to
    ~1e-5 (re-associated float ops)."""
    from fourd_ray_tracing_tpu.ops import geometry as geo

    o_np = rng_np.uniform(-4, 4, size=(4096, 4)).astype(np.float32)
    d_np = rng_np.normal(size=(4096, 4)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec4.unstack(jnp.asarray(o_np))
    d = Vec4.unstack(jnp.asarray(d_np.astype(np.float32)))

    if which == "tiger":
        t = library.tiger().tiger
        a = geo.tiger_intersection(t, o, d)
        b = geo.tiger_intersection_fast(t, o, d)
    else:
        u = library.duocylinder().cylinders_union
        a = geo.cylinders_union_intersection(u[0], u[1], o, d)
        b = geo.cylinders_union_intersection_fast(u[0], u[1], o, d)

    flips = np.asarray(a.hit) != np.asarray(b.hit)
    assert flips.mean() <= 0.001, f"{flips.sum()} hit flips"
    both = np.asarray(a.hit) & np.asarray(b.hit)
    rel = np.abs(np.asarray(a.dist)[both] - np.asarray(b.dist)[both]) / np.maximum(
        np.asarray(a.dist)[both], 1.0
    )
    assert rel.max() < 1e-4
    for ca, cb in zip(a.norm, b.norm):
        assert np.abs(np.asarray(ca)[both] - np.asarray(cb)[both]).max() < 1e-4
    assert (np.asarray(a.glow)[both] == np.asarray(b.glow)[both]).all()


def test_hypercube_fast_matches_literal(rng_np):
    """hypercube_intersection_fast (8 shared dots, static cell signs) vs
    the literal 8x cube_intersection: same hits/materials, distances to
    ulp re-association, first-hit-in-order semantics preserved."""
    from fourd_ray_tracing_tpu.ops import geometry as geo

    hc = library.hypercube().hypercube
    o_np = rng_np.uniform(-4, 4, size=(4096, 4)).astype(np.float32)
    d_np = rng_np.normal(size=(4096, 4)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec4.unstack(jnp.asarray(o_np))
    d = Vec4.unstack(jnp.asarray(d_np.astype(np.float32)))
    a = geo.hypercube_intersection(hc, o, d)
    b = geo.hypercube_intersection_fast(hc, o, d)
    flips = np.asarray(a.hit) != np.asarray(b.hit)
    assert flips.mean() <= 0.001
    both = np.asarray(a.hit) & np.asarray(b.hit)
    rel = np.abs(np.asarray(a.dist)[both] - np.asarray(b.dist)[both]) / np.maximum(
        np.asarray(a.dist)[both], 1.0
    )
    assert rel.max() < 1e-5
    for ca, cb in zip(a.norm, b.norm):
        np.testing.assert_array_equal(np.asarray(ca)[both], np.asarray(cb)[both])
    np.testing.assert_array_equal(np.asarray(a.glow)[both], np.asarray(b.glow)[both])


def test_hypercube_fast_without_generator_params(rng_np):
    """A HypercubeSpec built directly from cells (no generator params)
    falls back to the literal path."""
    from fourd_ray_tracing_tpu.ops import geometry as geo

    hc = library.hypercube().hypercube
    bare = geo.HypercubeSpec(hc.cubes)
    o = Vec4.of(0.0, -2.0, 0.0, 0.0)
    d = Vec4.of(0.0, 1.0, 0.0, 0.0)
    o = Vec4(*(jnp.broadcast_to(c, (4,)) for c in o))
    d = Vec4(*(jnp.broadcast_to(c, (4,)) for c in d))
    a = geo.hypercube_intersection_fast(bare, o, d)
    b = geo.hypercube_intersection(hc, o, d)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))


@pytest.mark.parametrize("scene_name", ["tiger", "duocylinder", "hypercube"])
def test_axis_hints_bit_identical(scene_name, rng_np):
    """Static axis-alignment hints (axis_alignment_hints + the aligned
    cylinder-family/hypercube candidates) must be BIT-identical to the
    unhinted fold: the dropped dot-product terms are exact float zeros."""
    from fourd_ray_tracing_tpu.models.scene import axis_alignment_hints

    scene = library.SCENES[scene_name]()
    hints = axis_alignment_hints(scene)
    assert hints is not None  # every shipped composite scene is aligned

    o_np = rng_np.uniform(-4, 4, size=(4096, 4)).astype(np.float32)
    d_np = rng_np.normal(size=(4096, 4)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec4.unstack(jnp.asarray(o_np))
    d = Vec4.unstack(jnp.asarray(d_np.astype(np.float32)))

    a = intersect_scene_fast(scene, o, d)
    b = intersect_scene_fast(scene, o, d, axis_hints=hints)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.dist), np.asarray(b.dist))
    for ca, cb in zip(a.norm, b.norm):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(a.glow), np.asarray(b.glow))
    for ca, cb in zip(a.color, b.color):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_axis_hints_derivation_cases():
    from fourd_ray_tracing_tpu.models.scene import (
        Scene,
        axis_alignment_hints,
        cylinder,
        material,
    )

    # Aligned cylinder -> per-component hints.
    mat = material(0, 0, (1, 1, 1))
    s = Scene(cylinders=(
        cylinder((0, 0, 0, 0), (0, 0, -1, 0), (0, 0, 0, 1), 1.0, mat),))
    h = axis_alignment_hints(s)
    assert h.cylinders == (((2, -1.0), (3, 1.0)),)

    # Rotated axes -> not aligned -> None.
    r2 = 0.7071067811865476
    s2 = Scene(cylinders=(
        cylinder((0, 0, 0, 0), (0, 0, r2, r2), (0, 0, -r2, r2), 1.0, mat),))
    assert axis_alignment_hints(s2) is None

    # Two axes on the SAME component (degenerate): not aligned.
    s3 = Scene(cylinders=(
        cylinder((0, 0, 0, 0), (0, 0, 1, 0), (0, 0, 1, 0), 1.0, mat),))
    assert axis_alignment_hints(s3) is None

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

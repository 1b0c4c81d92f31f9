"""Pallas megakernel vs the jnp renderer (interpret mode on the CPU mesh).

On real TPU hardware the kernel output is bitwise-identical to the jnp
pipeline (validated via bench.py / manual runs); here the interpreter
executes the same kernel logic, so any tiling/index/RNG-stream bug in
the megakernel shows up as a pixel mismatch.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from helpers import assert_images_close

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.renderer import RenderConfig, render_light
from fourd_ray_tracing_tpu.ops.pallas.megakernel import (
    render_image_pallas,
    render_light_pallas,
)
from fourd_ray_tracing_tpu.ops.vec4 import Vec4

CFG = RenderConfig(
    width=32, height=16, samples=2, reflections_amount=2, rng_mode="per_sample"
)


def default_camera():
    return cam.camera_from_state(
        Vec4.of(0.0, -2.0, 0.0, 0.0),
        cam.CameraAngles(jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        1.5,
        2.0,
    )


@pytest.mark.parametrize("scene_name", ["sphere_plane_light", "room_with_sphere"])
def test_megakernel_matches_jnp_renderer(scene_name):
    scene = library.SCENES[scene_name]()
    camera = default_camera()
    ref = np.asarray(render_light(scene, camera, CFG, 7))
    out = np.asarray(render_light_pallas(scene, camera, CFG, 7))
    assert out.shape == ref.shape
    assert_images_close(out, ref, atol=1e-5, boundary_frac=0.02)


def test_megakernel_rejects_sequential_rng():
    cfg = RenderConfig(width=32, height=16, samples=2, rng_mode="sequential")
    with pytest.raises(ValueError):
        render_light_pallas(library.tiger(), default_camera(), cfg, 1)


def test_megakernel_view_batched():
    """One launch renders all three orthogonal sections (the TPU-native
    replacement for three sequential draws, three_window_group.cpp:42-46)."""
    scene = library.sphere_plane_light()
    angles = cam.CameraAngles(jnp.float32(0.1), jnp.float32(0.0), jnp.float32(0.2))
    orient = cam.orientation_from_angles(angles.fi, angles.te, angles.psi)
    tops, rights = cam.batched_view_bases(orient)
    camera = cam.Camera(
        focus=Vec4.of(0, -2, 0, 0),
        vec_to_mtr=orient.forward * jnp.float32(1.5),
        top=tops,
        right=rights,
        mtr_width=jnp.float32(2.0 * cam.GOLDEN),
        mtr_height=jnp.float32(2.0),
    )
    ref = np.asarray(render_light(scene, camera, CFG, 3))
    out = np.asarray(render_light_pallas(scene, camera, CFG, 3))
    assert out.shape == (3, CFG.height, CFG.width, 3)
    assert_images_close(out, ref, atol=1e-5, boundary_frac=0.02)


def test_megakernel_tonemapped_range():
    img = np.asarray(
        render_image_pallas(library.tiger(), default_camera(), CFG, 9)
    )
    assert (img >= 0).all() and (img <= 1).all()

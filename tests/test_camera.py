"""Camera basis & movement tests (src/controls.cpp semantics)."""
import numpy as np
import jax.numpy as jnp

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.ops.vec4 import dot, length


def np_vec(v):
    return np.array([float(v.x), float(v.y), float(v.z), float(v.w)], np.float32)


def basis_matrix(orient):
    return np.stack(
        [np_vec(orient.forward), np_vec(orient.top), np_vec(orient.right),
         np_vec(orient.w_drct)]
    )


def test_identity_orientation():
    o = cam.orientation_from_angles(0.0, 0.0, 0.0)
    np.testing.assert_allclose(np_vec(o.forward), [0, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.top), [0, 0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.right), [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.w_drct), [0, 0, 0, 1], atol=1e-6)


def test_basis_always_orthonormal(rng_np):
    for _ in range(50):
        fi, te, psi = rng_np.uniform(-np.pi, np.pi, 3)
        o = cam.orientation_from_angles(fi, te, psi)
        b = basis_matrix(o)
        np.testing.assert_allclose(b @ b.T, np.eye(4), atol=1e-5)


def test_yaw_rotates_forward_toward_right():
    # rotate(fi, forward, right): forward' = forward*cos + right*sin
    o = cam.orientation_from_angles(np.pi / 2, 0.0, 0.0)
    np.testing.assert_allclose(np_vec(o.forward), [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.right), [0, -1, 0, 0], atol=1e-6)


def test_pitch_rotates_forward_toward_top():
    o = cam.orientation_from_angles(0.0, np.pi / 2, 0.0)
    np.testing.assert_allclose(np_vec(o.forward), [0, 0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.top), [0, -1, 0, 0], atol=1e-6)


def test_psi_rotates_top_toward_w():
    o = cam.orientation_from_angles(0.0, 0.0, np.pi / 2)
    np.testing.assert_allclose(np_vec(o.top), [0, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np_vec(o.w_drct), [0, 0, -1, 0], atol=1e-6)


def test_composition_order_psi_fi_te():
    # Golden check against an independent matrix composition: start from
    # identity rows [fwd, top, right, w] and apply the three Givens
    # rotations in the reference order (controls.cpp:78-85).
    fi, te, psi = 0.3, -0.4, 0.7
    fwd, top, right, w = (
        np.array([0, 1, 0, 0.0]),
        np.array([0, 0, 1, 0.0]),
        np.array([1, 0, 0, 0.0]),
        np.array([0, 0, 0, 1.0]),
    )

    def rot(a, x, y):
        return np.cos(a) * x + np.sin(a) * y, -np.sin(a) * x + np.cos(a) * y

    top, w = rot(psi, top, w)
    fwd, right = rot(fi, fwd, right)
    fwd, top = rot(te, fwd, top)

    o = cam.orientation_from_angles(fi, te, psi)
    np.testing.assert_allclose(np_vec(o.forward), fwd, atol=1e-6)
    np.testing.assert_allclose(np_vec(o.top), top, atol=1e-6)
    np.testing.assert_allclose(np_vec(o.right), right, atol=1e-6)
    np.testing.assert_allclose(np_vec(o.w_drct), w, atol=1e-6)


def test_horizontal_movement_ignores_pitch():
    # W/S move along horizontalForward regardless of te (controls.cpp:120-127).
    o = cam.orientation_from_angles(0.5, 1.2, 0.0)
    hf = np_vec(o.horizontal_forward)
    assert abs(hf[2]) < 1e-6  # no z (vertical) component
    f, moved = cam.move_focus(
        cam.Vec4.of(0, 0, 0, 0), o, cam.MoveKeys(forward=True), 2.0, 3.0
    )
    fv = np_vec(f)
    np.testing.assert_allclose(np.linalg.norm(fv), 6.0, atol=1e-5)
    assert abs(fv[2]) < 1e-5


def test_move_diagonal_normalized():
    o = cam.orientation_from_angles(0.0, 0.0, 0.0)
    f, moved = cam.move_focus(
        cam.Vec4.of(0, 0, 0, 0), o, cam.MoveKeys(forward=True, right=True), 1.0, 1.0
    )
    np.testing.assert_allclose(np.linalg.norm(np_vec(f)), 1.0, atol=1e-5)


def test_no_keys_no_motion():
    o = cam.orientation_from_angles(0.0, 0.0, 0.0)
    f, moved = cam.move_focus(cam.Vec4.of(1, 2, 3, 4), o, cam.MoveKeys(), 1.0, 1.0)
    np.testing.assert_allclose(np_vec(f), [1, 2, 3, 4], atol=1e-6)
    assert not bool(moved)


def test_angle_normalization():
    assert abs(abs(float(cam.normalize_angle(3 * np.pi))) - np.pi) < 1e-5
    # -3*pi wraps to +/-pi (equivalent angles; float boundary may give either)
    assert abs(abs(float(cam.normalize_angle(-3 * np.pi))) - np.pi) < 1e-5
    assert abs(float(cam.normalize_angle(0.5))) - 0.5 < 1e-6
    assert abs(float(cam.normalize_angle(0.5 + 2 * np.pi)) - 0.5) < 1e-5
    a = cam.CameraAngles(
        jnp.float32(0.0), jnp.float32(2.0), jnp.float32(0.0)
    ).normalized()
    assert abs(float(a.te) - np.pi / 2) < 1e-6  # te clamped to [-pi/2, pi/2]


def test_view_bases():
    o = cam.orientation_from_angles(0.1, 0.2, 0.3)
    tops, rights = cam.batched_view_bases(o)
    assert np.asarray(tops.x).shape == (3,)
    np.testing.assert_allclose(np_vec_at(tops, 0), np_vec(o.top), atol=1e-6)
    np.testing.assert_allclose(np_vec_at(rights, 1), np_vec(o.w_drct), atol=1e-6)
    np.testing.assert_allclose(np_vec_at(tops, 2), np_vec(o.w_drct), atol=1e-6)


def np_vec_at(v, i):
    return np.array(
        [float(v.x[i]), float(v.y[i]), float(v.z[i]), float(v.w[i])], np.float32
    )

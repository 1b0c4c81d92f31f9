"""Native C++ host layer vs the pure-Python/jnp equivalents."""
import numpy as np
import jax.numpy as jnp
import pytest

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.utils.config import parse_properties_text

native = pytest.importorskip("fourd_ray_tracing_tpu.native.binding")

try:
    native.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="no C++ toolchain to build libfourd_native"
)

SAMPLE = """
# comment
a = 1
window.main.width = 850   # trailing comment
  spaced.key   =   value with spaces
dup = first
dup = second
noequals line
= novalue
"""


def test_native_parser_matches_python():
    assert native.parse_properties(SAMPLE) == parse_properties_text(SAMPLE)


def test_native_camera_basis_matches_jnp():
    for fi, te, psi in [(0.0, 0.0, 0.0), (0.3, -0.2, 0.5), (2.9, 1.2, -0.7)]:
        s = native.new_camera_state(fi=fi, te=te, psi=psi)
        o = cam.orientation_from_angles(
            jnp.float32(fi), jnp.float32(te), jnp.float32(psi)
        )
        for name, vec in [
            ("forward", o.forward), ("top", o.top), ("right", o.right),
            ("w_drct", o.w_drct), ("h_forward", o.horizontal_forward),
            ("h_right", o.horizontal_right), ("v_top", o.vertical_top),
        ]:
            got = np.array(list(getattr(s, name)))
            want = np.array([float(vec.x), float(vec.y), float(vec.z), float(vec.w)])
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)


def test_native_rotation_normalization():
    s = native.new_camera_state(fi=3.0, te=1.4)
    native.rotate(s, d_fi=0.5)  # wraps past pi
    assert -np.pi < s.fi <= np.pi
    native.rotate(s, d_te=1.0)  # clamps at pi/2
    assert abs(s.te) <= np.pi / 2 + 1e-6


def test_native_psi_constraint():
    s = native.new_camera_state(psi_constraint=(0.0, np.radians(45)))
    native.rotate(s, d_psi=10.0)
    assert abs(s.psi) <= np.radians(45) + 1e-6


def test_native_move_matches_jnp():
    s = native.new_camera_state(fi=0.3, te=0.1, psi=0.05, focus=(0, -2, 0, 0))
    moved = native.move(s, native.KEY_FORWARD | native.KEY_TOP, 0.25, 3.0)
    assert moved

    o = cam.orientation_from_angles(
        jnp.float32(0.3), jnp.float32(0.1), jnp.float32(0.05)
    )
    from fourd_ray_tracing_tpu.ops.vec4 import Vec4

    new_focus, moved_j = cam.move_focus(
        Vec4.of(0, -2, 0, 0), o, cam.MoveKeys(forward=True, top=True),
        jnp.float32(0.25), jnp.float32(3.0),
    )
    assert bool(moved_j)
    got = np.array(list(s.focus))
    want = np.array([float(c) for c in new_focus])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_no_keys_no_move():
    s = native.new_camera_state()
    f0 = list(s.focus)
    assert not native.move(s, 0, 0.5, 3.0)
    assert list(s.focus) == f0

"""ctypes binding to the native host layer (libfourd_native.so).

Builds lazily with g++ on first use (no pip deps; the reference builds
its host with CMake, CMakeLists.txt:1-15 — here a one-liner compile is
the whole build). All callers degrade gracefully to pure Python when a
toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, Optional

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libfourd_native.so"
_SOURCES = [_DIR / "properties.cc", _DIR / "controls.cc"]
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class FourdCameraState(ctypes.Structure):
    """Mirror of FourdCameraState in controls.cc (field order is ABI)."""

    _fields_ = [
        ("fi", ctypes.c_float),
        ("te", ctypes.c_float),
        ("psi", ctypes.c_float),
        ("constrain_psi", ctypes.c_int32),
        ("psi_center", ctypes.c_float),
        ("psi_radius", ctypes.c_float),
        ("focus", ctypes.c_float * 4),
        ("forward", ctypes.c_float * 4),
        ("top", ctypes.c_float * 4),
        ("right", ctypes.c_float * 4),
        ("w_drct", ctypes.c_float * 4),
        ("h_forward", ctypes.c_float * 4),
        ("h_right", ctypes.c_float * 4),
        ("v_top", ctypes.c_float * 4),
    ]


KEY_FORWARD = 1 << 0
KEY_BACK = 1 << 1
KEY_RIGHT = 1 << 2
KEY_LEFT = 1 << 3
KEY_TOP = 1 << 4
KEY_DOWN = 1 << 5
KEY_W_POS = 1 << 6
KEY_W_NEG = 1 << 7


def _build() -> None:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        *(str(s) for s in _SOURCES),
        "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        newest_src = max(s.stat().st_mtime for s in _SOURCES)
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < newest_src:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fourd_parse_properties.argtypes = [ctypes.c_char_p]
        lib.fourd_parse_properties.restype = ctypes.c_void_p
        lib.fourd_free.argtypes = [ctypes.c_void_p]
        lib.fourd_camera_update.argtypes = [ctypes.POINTER(FourdCameraState)]
        lib.fourd_camera_rotate.argtypes = [
            ctypes.POINTER(FourdCameraState),
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.fourd_camera_rotate.restype = ctypes.c_int32
        lib.fourd_camera_move.argtypes = [
            ctypes.POINTER(FourdCameraState),
            ctypes.c_uint32, ctypes.c_float, ctypes.c_float,
        ]
        lib.fourd_camera_move.restype = ctypes.c_int32
        _lib = lib
        return lib


def parse_properties(text: str) -> Dict[str, str]:
    """Parse a properties file with the C++ parser (properties.cc)."""
    lib = load()
    ptr = lib.fourd_parse_properties(text.encode("utf-8"))
    if not ptr:
        raise MemoryError("fourd_parse_properties returned null")
    try:
        raw = ctypes.string_at(ptr).decode("utf-8")
    finally:
        lib.fourd_free(ptr)
    out: Dict[str, str] = {}
    for record in raw.split("\x1e"):
        if not record:
            continue
        key, _, value = record.partition("\x1f")
        out[key] = value
    return out


def new_camera_state(
    fi: float = 0.0,
    te: float = 0.0,
    psi: float = 0.0,
    focus=(0.0, 0.0, 0.0, 0.0),
    psi_constraint=None,
) -> FourdCameraState:
    """Fresh camera state with bases computed (initControls analogue,
    controls.cpp:140-159)."""
    lib = load()
    s = FourdCameraState()
    s.fi, s.te, s.psi = fi, te, psi
    if psi_constraint is not None:
        s.constrain_psi = 1
        s.psi_center, s.psi_radius = psi_constraint
    for i, v in enumerate(focus):
        s.focus[i] = v
    lib.fourd_camera_update(ctypes.byref(s))
    return s


def rotate(s: FourdCameraState, d_fi=0.0, d_te=0.0, d_psi=0.0) -> bool:
    """Mouse-look/wheel rotation; True means accumulation must reset."""
    return bool(load().fourd_camera_rotate(ctypes.byref(s), d_fi, d_te, d_psi))


def move(s: FourdCameraState, keys: int, seconds: float, speed: float) -> bool:
    """Key movement; True if the focus moved (accumulation resets)."""
    return bool(load().fourd_camera_move(ctypes.byref(s), keys, seconds, speed))

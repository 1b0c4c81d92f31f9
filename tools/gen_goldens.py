"""Generate checked-in golden images from the independent oracle.

Renders every canonical scene with oracle/frag.py (the scalar NumPy
transcription of shader.frag — zero production imports) at the fixed
configs of tests/test_oracle.py and stores them as tests/goldens/*.npz.

Run from the repo root:  python tools/gen_goldens.py
Regenerate ONLY when the oracle itself is extended; production changes
must never require regenerating goldens (that would defeat them).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oracle import frag, scenes  # noqa: E402

F = np.float32
GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"

# The fixed golden configs; tests/test_oracle.py mirrors these.
SEED = 12345
# A: geometry-only (no RNG consumed): 1 spp, 0 bounces.
A_W, A_H = 32, 20
# B: full path tracing: 2 spp, 3 bounces, both RNG stream layouts.
B_W, B_H = 24, 16
B_SPP, B_BOUNCES = 2, 3


def oracle_camera(view: str = "yxz") -> frag.OracleCamera:
    """Identity-pose camera (fi=te=psi=0): basis straight from the
    reference's identity orientation (src/controls.cpp:73-76), so no
    production code is needed to build it. mtr sizes follow
    main.cpp:37-38 with matrix_height=2, GOLDEN from inc/util/math.h:9,
    computed in float32 exactly like the production camera."""
    top_right = {
        "yxz": (frag.vec4(0, 0, 1, 0), frag.vec4(1, 0, 0, 0)),
        "ywz": (frag.vec4(0, 0, 1, 0), frag.vec4(0, 0, 0, 1)),
        "yxw": (frag.vec4(0, 0, 0, 1), frag.vec4(1, 0, 0, 0)),
    }[view]
    return frag.OracleCamera(
        focus=frag.vec4(0, -2, 0, 0),
        vec_to_mtr=frag.vec4(0, 1.5, 0, 0),  # forward*(focus_to_matrix_distance=1.5)
        top=top_right[0],
        right=top_right[1],
        mtr_width=F(F(2.0) * F(1.61803399)),
        mtr_height=F(2.0),
    )


def main() -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name, make in scenes.SCENES.items():
        t0 = time.time()
        scene = make()
        cam = oracle_camera()
        a_light = frag.render_light(scene, cam, A_W, A_H, SEED, 1, 0)
        b_seq = frag.render_light(
            scene, cam, B_W, B_H, SEED, B_SPP, B_BOUNCES, rng_mode="sequential"
        )
        b_per = frag.render_light(
            scene, cam, B_W, B_H, SEED, B_SPP, B_BOUNCES, rng_mode="per_sample"
        )
        arrays = dict(a_light=a_light, b_seq=b_seq, b_per=b_per)
        if name == "sphere_plane_light":
            # One additional-view golden pins the view-basis handling.
            arrays["a_light_ywz"] = frag.render_light(
                scene, oracle_camera("ywz"), A_W, A_H, SEED, 1, 0
            )
        np.savez(GOLDEN_DIR / f"{name}.npz", **arrays)
        print(f"{name}: {time.time() - t0:.1f}s -> {GOLDEN_DIR / (name + '.npz')}")


if __name__ == "__main__":
    main()

"""Frame-loop engine: seeds, progressive accumulation, camera state.

The TPU-native equivalent of the reference app driver (src/main.cpp:56-115):

* per-frame seed: ``seed ^= generate_seed()`` (main.cpp:52-54, 86);
* ``part = 1/frame_number`` progressive blend while the camera is still
  (main.cpp:87, shader.frag:526-527);
* any camera rotation/movement resets frame_number to 1
  (controls.cpp:132, 181, 191);
* the accumulation buffer is donated to the jitted step, so XLA updates
  it in place — the explicit, race-free replacement for the reference's
  GL texture-feedback self-read (windows.cpp:42-45, flagged in SURVEY §5
  as undefined behavior NOT to replicate).
"""
from __future__ import annotations

import time
from dataclasses import replace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.models.renderer import (
    RenderConfig,
    accumulate,
    render_image,
)
from fourd_ray_tracing_tpu.models.scene import Scene
from fourd_ray_tracing_tpu.ops.vec4 import Vec4


def generate_seed(rng: np.random.Generator, wall_clock: bool = True) -> int:
    """Per-frame 32-bit seed; entropy from an RNG plus the wall clock,
    like main.cpp:52-54 (rand() xors + elapsed microseconds)."""
    s = int(rng.integers(0, 2**32))
    if wall_clock:
        s ^= time.monotonic_ns() // 1000 & 0xFFFFFFFF
    return s & 0xFFFFFFFF


class RenderEngine:
    """Owns camera state + accumulation and steps frames.

    ``deterministic`` pins the seed sequence (no wall clock) so a frame
    sequence is reproducible from (scene, config, initial state).
    """

    def __init__(
        self,
        scene: Scene,
        cfg: RenderConfig,
        focus: Vec4,
        angles: cam.CameraAngles,
        focus_to_matrix_distance: float = 1.5,
        matrix_height: float = 2.0,
        views: Sequence[str] = ("yxz",),
        movement_speed: float = 3.0,
        psi_constraint: Optional[tuple] = None,  # (center, radius) or None
        deterministic: bool = False,
        impl: str = "auto",  # "auto" | "pallas" | "xla"
    ):
        self.scene = scene
        self.cfg = cfg
        self.focus = focus
        self.angles = angles.normalized(*(psi_constraint or (None, None)))
        self.views = tuple(views)
        self.focus_to_matrix_distance = float(focus_to_matrix_distance)
        self.matrix_height = float(matrix_height)
        self.movement_speed = float(movement_speed)
        self.psi_constraint = psi_constraint
        self.frame_number = 1
        self.seed = 0
        self._np_rng = np.random.default_rng(0 if deterministic else None)
        self._deterministic = deterministic

        shape = (len(self.views), cfg.height, cfg.width, 3)
        if len(self.views) == 1:
            shape = shape[1:]
        self.accum = jnp.zeros(shape, jnp.float32)

        if impl == "auto":
            # The megakernel needs a real TPU (interpret mode is far
            # slower than XLA on CPU) and per-sample RNG streams.
            # backend name may be "tpu" or a PJRT-plugin alias ("axon");
            # anything non-cpu is a real accelerator here.
            impl = (
                "pallas"
                if jax.default_backend() != "cpu" and cfg.rng_mode == "per_sample"
                else "xla"
            )
        if impl == "pallas":
            from fourd_ray_tracing_tpu.models.scene import plane_norm_hints
            from fourd_ray_tracing_tpu.ops.pallas.megakernel import (
                render_image_pallas,
            )

            render = render_image_pallas
            # Inside the jitted step the scene leaves are Tracers, so the
            # megakernel's own hint derivation would silently no-op —
            # derive the static hyperplane zero-component hints from the
            # CONCRETE scene here, once, and bake them into the config.
            if cfg.intersect == "fast" and cfg.plane_hints is None:
                hints = plane_norm_hints(scene)
                if hints is not None:
                    cfg = replace(cfg, plane_hints=hints)
                    self.cfg = cfg
        else:
            render = render_image
        self.impl = impl

        def step(scene_, accum, camera, seed, part):
            frame = render(scene_, camera, cfg, seed)
            return accumulate(accum, frame, part)

        self._step = jax.jit(step, donate_argnums=(1,))

    # --- camera state machine (L3 analogue) ---------------------------

    def _camera(self) -> cam.Camera:
        orient = cam.orientation_from_angles(
            self.angles.fi, self.angles.te, self.angles.psi
        )
        mtr_h = jnp.float32(self.matrix_height)
        if len(self.views) == 1:
            top, right = cam.view_basis(orient, self.views[0])
        else:
            top, right = cam.batched_view_bases(orient, self.views)
        return cam.Camera(
            focus=self.focus,
            vec_to_mtr=orient.forward * jnp.float32(self.focus_to_matrix_distance),
            top=top,
            right=right,
            mtr_width=mtr_h * cam.GOLDEN,
            mtr_height=mtr_h,
        )

    def reset_accumulation(self):
        self.frame_number = 1

    def rotate(self, d_fi: float = 0.0, d_te: float = 0.0, d_psi: float = 0.0):
        """Mouse-look / wheel analogue (controls.cpp:173-191)."""
        a = cam.CameraAngles(
            self.angles.fi + jnp.float32(d_fi),
            self.angles.te + jnp.float32(d_te),
            self.angles.psi + jnp.float32(d_psi),
        )
        self.angles = a.normalized(*(self.psi_constraint or (None, None)))
        self.reset_accumulation()

    def move(self, keys: cam.MoveKeys, seconds: float):
        """Keyboard movement (controls.cpp:118-134)."""
        orient = cam.orientation_from_angles(
            self.angles.fi, self.angles.te, self.angles.psi
        )
        new_focus, moved = cam.move_focus(
            self.focus, orient, keys, jnp.float32(seconds),
            jnp.float32(self.movement_speed),
        )
        if bool(moved):
            self.focus = new_focus
            self.reset_accumulation()

    # --- frame step (L2 analogue) --------------------------------------

    def step_frame(self) -> jnp.ndarray:
        """Render one frame and blend into the accumulation buffer."""
        self.seed ^= generate_seed(self._np_rng, wall_clock=not self._deterministic)
        part = 1.0 / float(self.frame_number)
        self.frame_number += 1
        self.accum = self._step(
            self.scene, self.accum, self._camera(), np.uint32(self.seed),
            np.float32(part),
        )
        return self.accum

    def run(self, n_frames: int) -> jnp.ndarray:
        for _ in range(n_frames):
            self.step_frame()
        return self.accum

    def rays_per_frame(self) -> int:
        return (
            len(self.views) * self.cfg.width * self.cfg.height * self.cfg.samples
        )

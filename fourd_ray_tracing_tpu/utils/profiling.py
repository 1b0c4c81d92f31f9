"""Profiling & observability: rays/s counters + jax.profiler capture.

The descendant of the reference's FPS overlay (windows.cpp:49-53,
main.cpp:95-102) per SURVEY §5: structured per-step counters (rays/s,
traces/s, accumulated spp) plus on-demand XLA trace capture for
TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class FrameStats:
    frames: int = 0
    seconds: float = 0.0
    rays: int = 0
    traces: int = 0  # rays * samples-weighted bounce segments upper bound

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds else 0.0

    @property
    def rays_per_s(self) -> float:
        return self.rays / self.seconds if self.seconds else 0.0

    def as_json(self) -> str:
        return json.dumps(
            {
                "frames": self.frames,
                "seconds": round(self.seconds, 6),
                "fps": round(self.fps, 3),
                "rays_per_s": round(self.rays_per_s, 1),
            }
        )


class Meter:
    """Wall-clock meter for render steps; call inside a `measure` block.

    Blocks on device completion (block_until_ready) so timings are real
    device time, not dispatch time.
    """

    def __init__(self):
        self.stats = FrameStats()

    @contextlib.contextmanager
    def measure(self, rays: int, frames: int = 1):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "result" in holder:
                jax.block_until_ready(holder["result"])
            dt = time.perf_counter() - t0
            self.stats.frames += frames
            self.stats.seconds += dt
            self.stats.rays += rays


@contextlib.contextmanager
def trace_capture(log_dir: Optional[str]):
    """jax.profiler trace capture (viewable in TensorBoard/Perfetto)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

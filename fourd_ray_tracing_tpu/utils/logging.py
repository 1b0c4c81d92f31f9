"""Host-0-only logging + structured per-step metrics (SURVEY §5).

The reference's observability is an FPS overlay on the main window
(src/windows/windows.cpp:49-53). The multi-host analogue: every process
computes metrics, only process 0 prints — the standard discipline that
keeps N-host logs readable and stdout-parseable.
"""
from __future__ import annotations

import json
import sys
from typing import Any, Mapping

import jax


def is_host0() -> bool:
    """True on the coordinator process (single-process: always True)."""
    return jax.process_index() == 0


def log0(*args, file=None, **kwargs) -> None:
    """print() that only executes on host 0."""
    if is_host0():
        print(*args, file=file or sys.stdout, **kwargs)


def log_metrics(step: int, metrics: Mapping[str, Any], prefix: str = "") -> None:
    """One JSON line per step, host 0 only: loss / grad_norm / rays_per_s /
    anything jax-array-valued (converted to float)."""
    if not is_host0():
        return
    payload = {"step": int(step)}
    for k, v in metrics.items():
        try:
            payload[prefix + k] = float(v)
        except (TypeError, ValueError):
            payload[prefix + k] = str(v)
    print(json.dumps(payload))

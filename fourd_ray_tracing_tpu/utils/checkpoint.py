"""Checkpoint / resume for accumulation buffers and optimizer state.

The reference has none (SURVEY §5): its progressive accumulation lives
in a GL texture and dies on exit. Here, long accumulation runs and
inverse-rendering optimizations save/restore via orbax (single-file
checkpoints are sufficient per SURVEY §5).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def save(path: str | Path, state: Any) -> None:
    """Save a pytree (accumulation image, frame counter, optimizer state...)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str | Path, like: Any) -> Any:
    """Restore a pytree saved by `save`; `like` supplies structure/shapes."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like
    )
    return ckptr.restore(path, target)

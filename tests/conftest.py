"""Test env: force CPU with 8 virtual devices BEFORE jax imports.

Tests exercise sharding/collectives on an 8-device CPU mesh (SURVEY §4.5)
— the TPU analogue of a fake-backend harness — and all math tests run on
CPU for determinism and speed. Real-chip validation happens via bench.py
and __graft_entry__.py, not pytest.
"""
import os

# Force, not setdefault: the session environment may pin JAX_PLATFORMS to a
# real accelerator (e.g. a tunneled TPU); tests must stay on the CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A site hook may have already imported jax and pinned
# jax_platforms="<accel>,cpu" via jax.config (which overrides the env
# var) — pin it back to cpu before any backend is instantiated.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)

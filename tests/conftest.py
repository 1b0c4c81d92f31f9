"""Test env: force CPU with 8 virtual devices BEFORE jax imports.

Tests exercise sharding/collectives on an 8-device CPU mesh (SURVEY §4.5)
— the TPU analogue of a fake-backend harness — and all math tests run on
CPU for determinism and speed. Real-chip validation happens via bench.py
and __graft_entry__.py, not pytest.
"""
import os

# Force, not setdefault: the session environment may pin JAX_PLATFORMS to a
# real accelerator (e.g. a tunneled TPU); tests must stay on the CPU mesh.
# FOURD_TEST_TPU=1 opts out, for the TPU-gated hardware tests
# (test_pallas.py::test_megakernel_bitwise_on_tpu).
_USE_TPU = os.environ.get("FOURD_TEST_TPU") == "1"
if not _USE_TPU:
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

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is almost entirely XLA
# compiles (2-CPU host); caching them makes re-runs near-instant.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)

import os

import jax

# A site hook may pin the accelerator platform via jax.config, which
# overrides the JAX_PLATFORMS env var — honor an explicit env request
# (tests/conftest.py and the tools do the same).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from fourd_ray_tracing_tpu.app import main

raise SystemExit(main())

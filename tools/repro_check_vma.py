"""Minimal repro for the check_vma=False workaround (VERDICT r4 #7).

Pinned behavior (jax 0.9.0, CPU interpret mode and TPU alike): a
`pl.pallas_call` whose operands mix REPLICATED inputs (a params vector,
identical on every device) with a per-device VARYING scalar (our tile0
offset, derived from `jax.lax.axis_index`) trips shard_map's replication
checker INSIDE pallas' lowering/interpret machinery:

    ValueError: "Primitive dynamic_slice requires varying manual axes
    to match, but got [frozenset({'d'}), frozenset()]. Please open an
    issue at https://github.com/jax-ml/jax/issues and as a temporary
    workaround pass the check_vma=False argument to `jax.shard_map`"

(the production kernels hit the same checker on different internal
primitives — `add` chains in the grad kernel's SMEM stores)

The mixing happens between pallas-internal constants and our operands,
so `jax.lax.pvary` on OUR operands cannot fix it — the checker would
need pallas itself to pvary its internals. Production entry points
(megakernel.sharded_render_light_pallas,
gradkernel.sharded_loss_and_grad_pallas) therefore pass
check_vma=False, with semantics covered by the bit-identity tests
(tests/test_sharding.py, tests/test_gradkernel.py).

The guard test tests/test_sharding.py::test_check_vma_workaround_still_needed
runs this repro with check_vma=True and is strict-xfail: the day a jax
upgrade makes it pass, the suite goes red and the workaround (grep
`_CHECK_VMA`) should be deleted.

Run directly for a human-readable report:  python tools/repro_check_vma.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_repro(check_vma: bool):
    """One shard_map'd pallas_call with a varying tile0-style operand.

    Returns the (n_dev, 4) result; raises when the replication checker
    rejects the pallas internals (check_vma=True today).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()[:2]
    mesh = jax.sharding.Mesh(np.array(devices), ("d",))

    def kernel(params_ref, tile0_ref, out_ref):
        # The production kernels' shape: a replicated params vector and
        # a per-device varying scalar offset, combined in-kernel.
        pid = pl.program_id(0) + tile0_ref[0]
        for k in range(4):
            out_ref[0, k] = params_ref[k] + pid.astype(jnp.float32)

    def local(params):
        tile0 = jax.lax.axis_index("d").astype(jnp.int32).reshape(1)
        if check_vma:
            # The production annotation: outputs declared varying over
            # the mesh axis (megakernel._launch_forward's vma argument).
            out_shape = jax.ShapeDtypeStruct(
                (1, 4), jnp.float32, vma=frozenset(("d",))
            )
        else:
            out_shape = jax.ShapeDtypeStruct((1, 4), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
        )(params, tile0)

    params = jnp.arange(4, dtype=jnp.float32)
    return jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=P("d"),
        check_vma=check_vma,
    )(params)


def main():
    import jax

    print(f"jax {jax.__version__}")
    out = run_repro(check_vma=False)
    print(f"check_vma=False: ok, result shape {out.shape}")
    try:
        run_repro(check_vma=True)
    except Exception as e:  # noqa: BLE001 — the repro reports any failure
        print(f"check_vma=True: FAILS as pinned -> {type(e).__name__}: "
              f"{str(e)[:300]}")
        return 0
    print("check_vma=True: PASSES — jax fixed it; delete the _CHECK_VMA "
          "workaround (megakernel.py / gradkernel.py) and this repro.")
    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Measure the chip's sustained fp32 VPU peak with a saturating FMA
microbenchmark (VERDICT r2 #4: the MFU denominator must be MEASURED, not
an env var nobody sets).

The kernel is a chain of dependent-free fused multiply-adds over a
VMEM-resident tile batch: y_i = y_i * a + b repeated R times over N
independent accumulators, giving XLA/Mosaic maximal ILP with zero memory
traffic in the hot loop — the highest fp32 FLOP rate the VPU sustains on
this chip. The path tracer is pure elementwise VPU work (no matmuls), so
this — not the MXU number — is the roofline its MFU is measured against.

Usage:  python tools/vpu_peak.py            # prints one JSON line
        python tools/vpu_peak.py --update   # also bakes the measured
                                            # peak into bench.py's
                                            # DEFAULT_VPU_PEAK_GFLOPS

bench.py divides each workload's achieved GFLOP/s by this peak to report
`mfu` per bench line (BENCH_VPU_PEAK_GFLOPS still overrides).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Shapes: 8 independent (512, 128) f32 accumulators, R fma rounds each.
ROWS, COLS, N_ACC, ROUNDS = 512, 128, 8, 512
FLOPS_PER_CALL = 2 * ROWS * COLS * N_ACC * ROUNDS  # fma = 2 FLOPs


@jax.jit
def _fma_chain(ys, a, b):
    def body(_, ys):
        return tuple(y * a + b for y in ys)

    return jax.lax.fori_loop(0, ROUNDS, body, ys)


def measure(repeats: int = 5) -> float:
    """Best sustained GFLOP/s over ``repeats`` timing rounds."""
    rng = np.random.default_rng(0)
    ys = tuple(
        jnp.asarray(rng.uniform(0.5, 1.0, (ROWS, COLS)), jnp.float32)
        for _ in range(N_ACC)
    )
    a = jnp.float32(0.999999)
    b = jnp.float32(1e-7)
    ys = jax.block_until_ready(_fma_chain(ys, a, b))  # compile
    best = 0.0
    calls = 20
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(calls):
            ys = _fma_chain(ys, a, b)
        jax.block_until_ready(ys)
        dt = time.perf_counter() - t0
        best = max(best, FLOPS_PER_CALL * calls / dt / 1e9)
    return best


def main():
    peak = measure()
    payload = {
        "metric": "vpu_peak_gflops",
        "value": round(peak, 1),
        "unit": "GFLOP/s",
        "device": str(jax.devices()[0]),
        "note": "sustained fp32 fma chain, zero memory traffic",
    }
    print(json.dumps(payload), flush=True)
    if "--update" in sys.argv:
        bench_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        with open(bench_path) as f:
            src = f.read()
        new = re.sub(
            r"DEFAULT_VPU_PEAK_GFLOPS = [0-9.]+",
            f"DEFAULT_VPU_PEAK_GFLOPS = {round(peak, 1)}",
            src,
        )
        if new == src:
            raise SystemExit("DEFAULT_VPU_PEAK_GFLOPS not found in bench.py")
        with open(bench_path, "w") as f:
            f.write(new)
        print(f"baked {round(peak, 1)} GFLOP/s into bench.py", flush=True)


if __name__ == "__main__":
    main()

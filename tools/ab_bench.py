"""Interleaved A/B microbenchmark for renderer variants.

The tunneled TPU's effective throughput drifts over minutes (shared /
throttled), so back-to-back bench.py runs are not comparable. This tool
compiles every variant once, then alternates timed rounds A,B,A,B,...
and reports the per-variant BEST round (least-contended sample).

Usage: python tools/ab_bench.py 'name=ENV_ASSIGNMENTS' ... e.g.
    python tools/ab_bench.py 'tile32=BENCH_TILE_SUBLANES=32' \
                             'tile8=BENCH_TILE_SUBLANES=8'
Variants reuse bench.py's env-var knobs.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fn(env: dict):
    os.environ.update(env)
    for m in [m for m in list(sys.modules) if m == "bench"]:
        del sys.modules[m]
    import bench

    # BENCH_FRAMES_PER_LAUNCH applies here too (the heavy-scene fpl
    # sweep in the README rides this): the returned fn renders that
    # many whole frames per dispatch, so rays/launch scales with it.
    fpl = int(os.environ.get("BENCH_FRAMES_PER_LAUNCH", 1))
    fn = bench.make_renderer(frames_per_launch=fpl)
    return fn, bench.WIDTH * bench.HEIGHT * bench.SAMPLES * fpl


def main():
    specs = []
    for arg in sys.argv[1:]:
        name, _, assigns = arg.partition("=")
        env = {}
        for kv in assigns.split(","):
            k, _, v = kv.partition("=")
            env[k] = v
        specs.append((name, env))

    fns = {}
    rays_of = {}
    for name, env in specs:
        fns[name], rays_of[name] = make_fn(env)
        jax.block_until_ready(fns[name](np.uint32(1)))  # compile+warm
        print(f"compiled {name}", flush=True)

    rounds = int(os.environ.get("AB_ROUNDS", 5))
    frames = int(os.environ.get("AB_FRAMES", 8))
    best = {name: float("inf") for name, _ in specs}
    for r in range(rounds):
        for name, _ in specs:
            fn = fns[name]
            t0 = time.perf_counter()
            for i in range(frames):
                out = fn(np.uint32(100 * r + i))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / frames
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: "
                  f"{rays_of[name] / dt / 1e6:.1f} Mray/s", flush=True)
    print("--- best ---")
    for name, _ in specs:
        print(f"{name}: {rays_of[name] / best[name] / 1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()

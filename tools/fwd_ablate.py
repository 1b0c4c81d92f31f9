"""Per-stage cost attribution for the FORWARD megakernel on a heavy scene.

VERDICT r3 weak #2: heavy-scene MFU (4-6%) vs sphere-plane (21.8%) was
argued, never attributed. This tool measures the room kernel with
individual stages stubbed out (value-breaking, measurement-only):

  baseline      full production kernel (hints auto-derived)
  sampler_const S^3 sampler replaced by a constant unit direction
                (RNG draws kept) — isolates the inverse-CDF + sincos
  rng_const     masked_uniform01 returns 0.5 without hashing — isolates
                the 6-round hash chains (sampler then sees constants)
  both_const    sampler AND rng stubbed
  walls_only    scene = the 8 walls (no spheres) — fold minus spheres
  floor_spheres scene = floor + 2 spheres (no closed box) — fold minus
                the wall pairs
  bounces_k     reflections_amount = k (0/1/2) — per-bounce marginal
                cost vs fixed per-pixel cost (primary gen + pre0 hoist)

Each variant is compiled separately and timed in consecutive rounds
(never interleaved — see .claude/skills/verify/SKILL.md bench
discipline); the baseline is re-timed at the end to bound tunnel phase
drift across the run. Output: one JSON line per variant.

ABLATE_SCENE selects the workload (default room_with_sphere; tiger and
the other library scenes work too — the scene-structure variants are
derived generically by emptying one primitive group at a time, e.g.
drop_spheres on the room is round 3's "walls_only").

Usage: [ABLATE_SCENE=tiger] python tools/fwd_ablate.py [width height samples bounces]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.renderer import RenderConfig
from fourd_ray_tracing_tpu.ops.vec4 import Vec4


def _time(fn, rays, rounds=4, frames=4):
    jax.block_until_ready(fn(np.uint32(1)))
    rates = []
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(np.uint32(16 * r + i + 2))
        jax.block_until_ready(out)
        rates.append(rays * frames / (time.perf_counter() - t0))
    return min(rates), statistics.median(rates), max(rates)


FPL = int(os.environ.get("ABLATE_FPL", 8))  # frames per launch: amortize
# the tunnel's multi-ms dispatch latency so CHEAP variants (bounces_0)
# measure kernel time, not dispatch time.


def build_fn(scene, camera, cfg):
    from fourd_ray_tracing_tpu.ops.pallas.megakernel import render_image_pallas

    k = np.uint32(FPL)

    def fn(seed):
        seeds = jnp.uint32(seed) * k + jnp.arange(k, dtype=jnp.uint32)
        return render_image_pallas(scene, camera, cfg, seeds)

    return jax.jit(fn)


def main():
    args = sys.argv[1:5]
    w, h, s, b = (int(x) for x in args) if len(args) == 4 else (1280, 720, 8, 4)
    import bench
    from fourd_ray_tracing_tpu.models.renderer import (
        RenderConfig as RC,
    )
    from fourd_ray_tracing_tpu.ops import rng as rng_mod
    from fourd_ray_tracing_tpu.ops.pallas import megakernel as mk
    from fourd_ray_tracing_tpu.models import renderer as rend

    cfg = RC(
        width=w, height=h, samples=s, reflections_amount=b,
        light_coefficient=0.12, sampler_method="poly",
        rng_mode="per_sample", intersect="fast", tile_sublanes=32,
        bounce_loop="unroll",
    )
    scene_name = os.environ.get("ABLATE_SCENE", "room_with_sphere")
    room = library.SCENES[scene_name]()
    camera = bench.default_camera()
    rays = w * h * s * FPL

    orig_dir = mk.direction_from_uniforms
    orig_dir_r = rend.direction_from_uniforms
    orig_mu = rng_mod.masked_uniform01

    def const_dir(u_w, u_z, u_fi, *, method="poly", kepler_iters=2):
        half = u_w * 0.0 + np.float32(0.5)
        return Vec4(half, half, half, half)  # exact unit vector

    def const_mu(pixel_bits, seed, counter, active):
        return jnp.full(jnp.shape(pixel_bits), np.float32(0.5)), counter

    def patch(sampler=False, rngc=False):
        mk.direction_from_uniforms = const_dir if sampler else orig_dir
        rend.direction_from_uniforms = const_dir if sampler else orig_dir_r
        rng_mod.masked_uniform01 = const_mu if rngc else orig_mu

    results = {}

    def run(name, scene=room, cfg_=None, sampler=False, rngc=False):
        patch(sampler=sampler, rngc=rngc)
        try:
            fn = build_fn(scene, camera, cfg_ or cfg)
            lo, med, hi = _time(fn, rays)
        finally:
            patch()
        results[name] = med
        print(json.dumps({
            "variant": name, "gray_per_s": round(med / 1e9, 4),
            "min": round(lo / 1e9, 4), "max": round(hi / 1e9, 4),
        }), flush=True)

    import dataclasses

    run("baseline")
    run("sampler_const", sampler=True)
    run("rng_const", rngc=True)
    run("both_const", sampler=True, rngc=True)
    # Scene-structure variants: empty one primitive group at a time
    # (the delta attributes that group's fold candidates). drop_spheres
    # on the room is round 3's "walls_only"; drop_spaces leaves the
    # composite primitive alone on tiger/hypercube/duocylinder.
    empties = {"spaces": (), "spheres": (), "cylinders": (),
               "cylinders_union": None, "hypercube": None, "tiger": None}
    for field, empty in empties.items():
        if not getattr(room, field):
            continue
        # keep at least one candidate: skip if emptying leaves nothing
        variant = room._replace(**{field: empty})
        if not any(getattr(variant, f) for f in empties):
            continue
        run(f"drop_{field}", scene=variant)
    for k in (0, 1, 2):
        run(f"bounces_{k}", cfg_=dataclasses.replace(cfg, reflections_amount=k))
    run("baseline_recheck")

    base = results["baseline"]
    drift = results["baseline_recheck"] / base - 1.0
    print(json.dumps({"drift_check": round(drift, 3)}), flush=True)
    # Stage budget in % of baseline step time (time = 1/rate).
    budget = {
        name: round((1.0 / base - 1.0 / r) / (1.0 / base) * -100.0, 1)
        for name, r in results.items()
        if name != "baseline"
    }
    print(json.dumps({"time_delta_pct_vs_baseline": budget}), flush=True)


if __name__ == "__main__":
    main()

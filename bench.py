"""North-star benchmark: rays/s on the room-with-sphere scene.

Workload per BASELINE.md: 1280x720 pixels x 8 spp x 4 bounces (up to 5
ray segments per path), room-with-sphere scene, production sampler
(fixed-iteration Kepler inverse-CDF) and per-sample RNG streams.

Prints ONE JSON line: {"metric": "rays_per_second", "value": N,
"unit": "rays/s", "vs_baseline": N} where vs_baseline is relative to the
1 Gray/s/chip north-star target (BASELINE.json; the reference itself
publishes no numbers).

"rays" counts traced paths (pixels x samples), the same unit the
reference's implied workload uses (SURVEY §6: cells x spp traces/frame).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.renderer import RenderConfig
from fourd_ray_tracing_tpu.ops.vec4 import Vec4

WIDTH = int(os.environ.get("BENCH_WIDTH", 1280))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 720))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", 8))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", 4))
FRAMES = int(os.environ.get("BENCH_FRAMES", 10))
SCENE = os.environ.get("BENCH_SCENE", "room_with_sphere")
# "pallas" (megakernel, default) or "xla" (jnp pipeline)
IMPL = os.environ.get("BENCH_IMPL", "pallas")
# "unroll" (fastest steady-state) or "fori" (fastest compile)
LOOP = os.environ.get("BENCH_LOOP", "unroll")
TILE_SUBLANES = int(os.environ.get("BENCH_TILE_SUBLANES", 32))
SAMPLER = os.environ.get("BENCH_SAMPLER", "poly")
INTERSECT = os.environ.get("BENCH_INTERSECT", "fast")
SAMPLER_ITERS = int(os.environ.get("BENCH_SAMPLER_ITERS", 2))
TARGET_RAYS_PER_S = 1e9  # north-star: >= 1 Gray/s per chip


def make_renderer():
    cfg = RenderConfig(
        width=WIDTH,
        height=HEIGHT,
        samples=SAMPLES,
        reflections_amount=BOUNCES,
        light_coefficient=0.12,
        sampler_method=SAMPLER,
        rng_mode="per_sample",
        bounce_loop=LOOP,
        tile_sublanes=TILE_SUBLANES,
        sampler_iters=SAMPLER_ITERS,
        intersect=INTERSECT,
    )
    scene = library.SCENES[SCENE]()
    camera = cam.camera_from_state(
        focus=Vec4.of(0.0, -2.0, 0.0, 0.0),
        angles=cam.CameraAngles(jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        focus_to_matrix_distance=1.5,
        matrix_height=2.0,
    )
    if IMPL == "pallas":
        from fourd_ray_tracing_tpu.ops.pallas.megakernel import render_image_pallas

        return jax.jit(lambda seed: render_image_pallas(scene, camera, cfg, seed))
    from fourd_ray_tracing_tpu.models.renderer import render_image

    return jax.jit(lambda seed: render_image(scene, camera, cfg, seed))


def main():
    fn = make_renderer()
    out = jax.block_until_ready(fn(np.uint32(1)))  # compile + warm
    assert bool(jnp.isfinite(out).all()), "non-finite pixels in bench render"

    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = fn(np.uint32(i + 2))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / FRAMES

    rays = WIDTH * HEIGHT * SAMPLES
    rays_per_s = rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_second",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / TARGET_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()

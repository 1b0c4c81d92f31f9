"""Attribute the soft-silhouette kernel step's cost (VERDICT r4 #5).

The soft step is ONE two-row megakernel render + ONE two-row light-VJP
dispatch plus jnp glue (tone map x2, `object_coverage` alpha, blend,
MSE) and their AD transposes.  This tool times the pieces in isolation
on the live device so the gap between the measured step rate and the
naive "2 renders + 2 VJP sweeps" ideal is attributed, not argued —
the same discipline as tools/fwd_ablate.py for the forward kernel and
tools/train_ablate.py for the hard train step.

Variants (all at the bench soft shape, 1280x720x8x4 by default):

  fwd_pair      two-row megakernel render, no AD          (floor: render pair)
  pair_vg       value_and_grad of sum(pair) — render + light-VJP kernels only
  glue_only     tonemap+coverage+blend+MSE forward+backward on PREMADE light
                rows (no render kernels at all)
  pair_soft     the RETIRED two-dispatch soft step (pair render + pair VJP +
                jnp blend) — kept as the measured baseline the fused kernel
                replaced
  soft_full     the full soft_image_loss_pallas value_and_grad — since round
                5 the FUSED one-dispatch soft kernel (the bench line)

Round-5 measurement (room 1280x720x8x4, v5e): fwd_pair 11.1 ms,
pair_vg 22.2 ms, glue fully overlapped (soft_full-pair == pair_vg),
fused soft_full 16.5 ms => 0.446 Gray/s (pair form was 22.3 ms/0.331).

Run: python tools/soft_ablate.py  [WIDTH=.. HEIGHT=.. ROUNDS=..]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.diff import (
    object_coverage,
    pallas_render_light_pair,
    soft_image_loss_pallas,
    with_frozen_hints,
    zero_object,
)
from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.renderer import RenderConfig
from fourd_ray_tracing_tpu.ops.vec4 import Vec4

WIDTH = int(os.environ.get("WIDTH", "1280"))
HEIGHT = int(os.environ.get("HEIGHT", "720"))
SAMPLES = int(os.environ.get("SAMPLES", "8"))
BOUNCES = int(os.environ.get("BOUNCES", "4"))
ROUNDS = int(os.environ.get("ROUNDS", "30"))


def default_camera():
    angles = cam.CameraAngles(jnp.float32(0), jnp.float32(0), jnp.float32(0))
    return cam.camera_from_state(
        focus=Vec4.of(0.0, -2.0, 0.0, 0.0), angles=angles,
        focus_to_matrix_distance=1.5, matrix_height=2.0, view="yxz",
    )


FRAMES = int(os.environ.get("FRAMES", "8"))


def time_fn(fn, rounds=ROUNDS, frames=FRAMES):
    """Median seconds per call, bench-style: enqueue ``frames`` calls
    back-to-back and block ONCE — the tunnel's block_until_ready
    round-trip latency (tens of ms on axon) amortizes over the batch
    exactly as bench.time_rounds does, so these numbers are comparable
    with BENCH_r*.json lines rather than dominated by host RTT."""
    jax.block_until_ready(fn())  # compile + warm
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / frames)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    cfg = RenderConfig(
        width=WIDTH, height=HEIGHT, samples=SAMPLES,
        reflections_amount=BOUNCES, light_coefficient=0.12,
        sampler_method="poly", rng_mode="per_sample", intersect="fast",
        tile_sublanes=int(os.environ.get("TILE_SUBLANES", "32")),
    )
    scene = library.SCENES["room_with_sphere"]()
    cfg = with_frozen_hints(cfg, scene)
    camera = default_camera()
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    ref = ("spheres", 0)
    without = zero_object(scene, ref)
    rays = WIDTH * HEIGHT * SAMPLES
    seed = np.uint32(1)

    results = {}

    # --- fwd_pair: the two-row render dispatch alone -----------------------
    fwd = jax.jit(lambda s, w: pallas_render_light_pair(s, w, camera, cfg, seed))
    results["fwd_pair"] = time_fn(lambda: fwd(scene, without))

    # --- pair_vg: render pair + light-VJP pair, trivial cotangent ----------
    pvg = jax.jit(jax.value_and_grad(
        lambda s, w: jnp.sum(pallas_render_light_pair(s, w, camera, cfg, seed))
    , argnums=(0, 1)))
    results["pair_vg"] = time_fn(lambda: pvg(scene, without)[0])

    # --- glue_only: jnp tonemap/coverage/blend/MSE fwd+bwd, no kernels -----
    from fourd_ray_tracing_tpu.ops.sky import light_to_color
    from fourd_ray_tracing_tpu.ops.vec4 import Vec3

    pair0 = jax.block_until_ready(fwd(scene, without))

    def glue(s, pair):
        def tonemap(light):
            c = light_to_color(
                Vec3(light[..., 0], light[..., 1], light[..., 2]),
                jnp.float32(cfg.light_coefficient),
            )
            return c.stack(axis=-1)

        img_w, img_wo = tonemap(pair[0]), tonemap(pair[1])
        alpha = object_coverage(s, ref, camera, cfg, 0.05)[..., None]
        img = alpha * img_w + (1.0 - alpha) * img_wo
        return jnp.mean((img - target) ** 2)

    gvg = jax.jit(jax.value_and_grad(glue, argnums=(0, 1)))
    results["glue_only"] = time_fn(lambda: gvg(scene, pair0)[0])

    # --- pair_soft: the retired two-dispatch step (render pair + VJP
    # pair + jnp blend), reassembled from its public pieces ------------
    def pair_soft(s):
        pair = pallas_render_light_pair(
            s, zero_object(s, ref), camera, cfg, seed
        )
        return glue(s, pair)

    psvg = jax.jit(jax.value_and_grad(pair_soft))
    results["pair_soft"] = time_fn(lambda: psvg(scene)[0])

    # --- soft_full: the bench line ------------------------------------------
    svg = jax.jit(jax.value_and_grad(
        lambda s: soft_image_loss_pallas(s, camera, cfg, seed, target, ref, 0.05)
    ))
    results["soft_full"] = time_fn(lambda: svg(scene)[0])

    for k, t in results.items():
        print(json.dumps({
            "variant": k, "ms": round(t * 1e3, 3),
            "grays_per_s": round(rays / t / 1e9, 4),
        }))
    # Fusion win: the retired two-dispatch step minus the fused step.
    win = results["pair_soft"] - results["soft_full"]
    print(json.dumps({"variant": "fusion_win_ms", "ms": round(win * 1e3, 3)}))


if __name__ == "__main__":
    main()

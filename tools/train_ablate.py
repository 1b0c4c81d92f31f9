"""Attribute the training step's time between its stages (VERDICT r4 #1).

BENCH_r04 recorded train_scan4 = 0.557 Gray/s while the builder's own
DEBUG_SKIP_PASS2 measurement implied ~1.0 was attainable at the current
forward speed — and the 4-step scan came out BELOW the eager single
launch. This tool measures, at the north-star grad workload
(room_with_sphere, 1280x720x8spp x 4 bounces, frozen hints), a ladder of
variants that each add ONE stage, so the per-stage cost (and the scan
regression) is a measured number rather than a suspect list:

  fwd        forward megakernel render (1 frame/launch) — the floor
  pass1      grad kernel with the pass-2 reverse sweep compiled OUT
             (DEBUG_SKIP_PASS2): forward sample loop + loss cotangent
  kernel     full grad kernel, loss fetched, gradient outputs DISCARDED
             (the (tiles, P) sum/rebuild dead-code-eliminated)
  loss_grad  render_loss_and_grad_pallas complete (sum + rebuild +
             freeze) with loss AND all gradients fetched
  vg         jax.value_and_grad(pallas_image_loss) — the custom-vjp
             wrapper + cotangent scaling
  step       + adam update + apply_updates (one eager train step)
  scan4      4 full steps scanned inside one jit (bench.run_k shape)

Each line prints Gray/s and the delta vs the previous stage. Usage:

  python tools/train_ablate.py [--rounds N] [--frames N]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from fourd_ray_tracing_tpu import camera as cam
from fourd_ray_tracing_tpu.diff import (
    pallas_image_loss,
    with_frozen_hints,
)
from fourd_ray_tracing_tpu.models import library
from fourd_ray_tracing_tpu.models.renderer import RenderConfig
from fourd_ray_tracing_tpu.ops.pallas import gradkernel
from fourd_ray_tracing_tpu.ops.vec4 import Vec4

WIDTH = int(os.environ.get("BENCH_WIDTH", 1280))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 720))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", 8))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", 4))


def default_camera():
    angles = cam.CameraAngles(jnp.float32(0), jnp.float32(0), jnp.float32(0))
    return cam.camera_from_state(
        focus=Vec4.of(0.0, -2.0, 0.0, 0.0), angles=angles,
        focus_to_matrix_distance=1.5, matrix_height=2.0, view="yxz",
    )


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def time_fn(fn, rays, frames, rounds):
    _sync(fn(np.uint32(1)))  # compile + warm
    rates = []
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(np.uint32(100 * r + i + 2))
        _sync(out)
        rates.append(rays * frames / (time.perf_counter() - t0))
    return statistics.median(rates)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=WIDTH, height=HEIGHT, samples=SAMPLES,
        reflections_amount=BOUNCES, light_coefficient=0.12,
        sampler_method="poly", rng_mode="per_sample", intersect="fast",
        tile_sublanes=32,
    )
    scene = library.SCENES["room_with_sphere"]()
    kcfg = with_frozen_hints(cfg, scene)
    camera = default_camera()
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    rays = WIDTH * HEIGHT * SAMPLES
    opt = optax.adam(1e-3)

    results = []

    def report(name, med, note=""):
        prev = results[-1][1] if results else None
        results.append((name, med))
        delta = "" if prev is None else f"  (x{prev / med:.3f} vs prev)"
        print(f"{name:10s} {med / 1e9:7.3f} Gray/s{delta}  {note}",
              flush=True)

    # --- fwd: forward megakernel, 1 frame per launch ----------------------
    from fourd_ray_tracing_tpu.ops.pallas.megakernel import render_light_pallas

    fwd = jax.jit(lambda seed: render_light_pallas(scene, camera, kcfg, seed))
    report("fwd", time_fn(fwd, rays, args.frames, args.rounds),
           "forward megakernel, fpl=1")

    # --- pass1: reverse sweep compiled out --------------------------------
    gradkernel.DEBUG_SKIP_PASS2 = True
    try:
        p1 = jax.jit(lambda seed: gradkernel.render_loss_and_grad_pallas(
            scene, camera, kcfg, seed, target)[0])
        report("pass1", time_fn(p1, rays, args.frames, args.rounds),
               "grad kernel, DEBUG_SKIP_PASS2")
    finally:
        gradkernel.DEBUG_SKIP_PASS2 = False
        gradkernel._render_loss_and_grad_jit.clear_cache()

    # --- kernel: full grad kernel, grads discarded ------------------------
    k = jax.jit(lambda seed: gradkernel.render_loss_and_grad_pallas(
        scene, camera, kcfg, seed, target)[0])
    report("kernel", time_fn(k, rays, args.frames, args.rounds),
           "full kernel, grad outputs DCE'd")

    # --- loss_grad: + (tiles,P) sum + rebuild + freeze --------------------
    lg = jax.jit(lambda seed: gradkernel.render_loss_and_grad_pallas(
        scene, camera, kcfg, seed, target))

    def lg_fn(seed):
        loss, grads = lg(seed)
        return loss

    # fetch ALL outputs so nothing is DCE'd; block on the full tree
    def lg_timed(seed):
        out = lg(seed)
        return out

    report("loss_grad", time_fn(lg_timed, rays, args.frames, args.rounds),
           "+ grad sum/rebuild/freeze")

    # --- vg: value_and_grad custom-vjp wrapper ----------------------------
    vg = jax.jit(lambda s, seed: jax.value_and_grad(pallas_image_loss)(
        s, camera, kcfg, seed, target))
    report("vg", time_fn(lambda seed: vg(scene, seed), rays, args.frames,
                         args.rounds), "+ custom-vjp wrapper")

    # --- step: + adam -----------------------------------------------------
    opt_state0 = opt.init(scene)

    @jax.jit
    def one(s, o_state, seed):
        loss, grads = jax.value_and_grad(pallas_image_loss)(
            s, camera, kcfg, seed, target)
        updates, o_state = opt.update(grads, o_state, s)
        s = optax.apply_updates(s, updates)
        return s, o_state, loss

    def step_fn(seed):
        s2, o2, loss = one(scene, opt_state0, seed)
        return loss

    report("step", time_fn(step_fn, rays, args.frames, args.rounds),
           "+ adam update")

    # --- scan4: 4 steps inside one jit ------------------------------------
    def one_step(carry, seed):
        s, o_state = carry
        loss, grads = jax.value_and_grad(pallas_image_loss)(
            s, camera, kcfg, seed, target)
        updates, o_state = opt.update(grads, o_state, s)
        s = optax.apply_updates(s, updates)
        return (s, o_state), loss

    @jax.jit
    def run_k(s, o_state, seeds):
        (s, o_state), losses = jax.lax.scan(one_step, (s, o_state), seeds)
        return losses[-1]

    def scan_fn(seed):
        seeds = jnp.uint32(seed) * np.uint32(4) + jnp.arange(4, dtype=jnp.uint32)
        return run_k(scene, opt_state0, seeds)

    report("scan4", time_fn(scan_fn, rays * 4, max(1, args.frames // 4),
                            args.rounds), "4 steps per jit")

    print("\nstage deltas (ms per 7.37M-ray step):")
    base = rays / results[0][1] * 1e3
    for name, med in results:
        steps = 1
        ms = rays / med * 1e3
        print(f"  {name:10s} {ms:7.2f} ms  (+{ms - base:6.2f} vs fwd)")
        base = base


if __name__ == "__main__":
    main()

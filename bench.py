"""North-star benchmarks: rays/s on the five canonical workloads.

Default (BENCH_MODE=full) runs every BASELINE.md workload:

  1. sphere_plane_light  256x256 x 1 spp x 2 bounces, single view
  2. room_with_sphere    1280x720 x 8 spp x 4 bounces  (the HEADLINE)
  3. hypercube           1280x720 x 8 spp x 4 bounces  (diffuse sampler hot)
  4. duocylinder+tiger   three simultaneous section views (xyz/ywz/yxw),
                         batched as a leading view axis in ONE launch
  5. inverse rendering   loss+grad step on room_with_sphere at NORTH-STAR
                         resolution via the value-and-grad megakernel
                         (ops/pallas/gradkernel.py), plus the jnp
                         pipeline (per-sample remat) as the smaller
                         autodiff cross-check line

Each workload times >= BENCH_ROUNDS rounds of BENCH_FRAMES frames after a
warmup and reports min/median/max rays/s (the tunneled TPU's throughput
drifts over minutes, so a single round is not trustworthy —
tools/ab_bench.py). Per-workload JSON lines go to stdout; the FINAL line
is the headline (room-with-sphere median) in the driver's schema:

  {"metric": "rays_per_second", "value": N, "unit": "rays/s",
   "vs_baseline": N}   # vs the 1 Gray/s/chip north star (BASELINE.md:18)

Roofline accounting (SURVEY §5): per-workload FLOPs/ray from XLA's cost
analysis of the identical-math jnp pipeline (forward lines) or of the
grad kernel's own tile math (training lines, flop_model
"kernel_jaxpr_count" — gradkernel.kernel_flops_per_ray), reported as
achieved GFLOP/s; the workload streams ~nothing from HBM (scene in
SMEM, image written once), so arithmetic intensity is effectively
infinite and the kernel is VPU-compute-bound. Caveat on the training
MFU: the backward's parameter cotangents are full-tile REDUCTIONS,
which carry ~1024 counted flops per issued vector op vs 1 for the
forward's elementwise mix — so the grad lines' high apparent MFU
reflects reduction-dense arithmetic, not better issue efficiency
(README "The backward budget"). Every line also reports `mfu` = achieved /
DEFAULT_VPU_PEAK_GFLOPS, the chip's MEASURED sustained fp32 fma peak
(tools/vpu_peak.py — fetch-timed Pallas chains; the pre-round-4 15 429.5
figure was a dispatch-paced artifact and every earlier mfu was ~3x
understated; BENCH_VPU_PEAK_GFLOPS overrides). The numerator counts
USEFUL flops only (XLA cost model): masked-dead lanes, selects/masks,
and integer RNG ops occupy VPU issue slots but are not flops, which is
exactly the heavy-scene gap tools/fwd_ablate.py attributes (README
"Where the room kernel's time goes").

BENCH_MODE=single preserves the old env-knob behavior (used by
tools/ab_bench.py): one workload from BENCH_{SCENE,WIDTH,...}, one line.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax

# Persistent compile cache: TPU kernel compiles go through a remote
# tunnel that can take minutes; cache them across bench processes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
FRAMES = int(os.environ.get("BENCH_FRAMES", 8))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 5))
SCENE = os.environ.get("BENCH_SCENE", "room_with_sphere")
MODE = os.environ.get("BENCH_MODE", "full")
# "pallas" (megakernel, default) or "xla" (jnp pipeline)
IMPL = os.environ.get("BENCH_IMPL", "pallas")
# "unroll" (fastest steady-state) or "fori" (fastest compile)
LOOP = os.environ.get("BENCH_LOOP", "unroll")
TILE_SUBLANES = int(os.environ.get("BENCH_TILE_SUBLANES", 32))
SAMPLER = os.environ.get("BENCH_SAMPLER", "poly")
INTERSECT = os.environ.get("BENCH_INTERSECT", "fast")
SAMPLER_ITERS = int(os.environ.get("BENCH_SAMPLER_ITERS", 2))
# Sustained fp32 VPU peak of THIS chip, measured by tools/vpu_peak.py
# (saturating fma chain; re-run with --update after a hardware change).
# Every bench line divides its achieved GFLOP/s by this to report `mfu`.
DEFAULT_VPU_PEAK_GFLOPS = 5101.0
VPU_PEAK_GFLOPS = float(
    os.environ.get("BENCH_VPU_PEAK_GFLOPS", DEFAULT_VPU_PEAK_GFLOPS)
)
TARGET_RAYS_PER_S = 1e9  # north-star: >= 1 Gray/s per chip


def default_camera(views=("yxz",)):
    angles = cam.CameraAngles(jnp.float32(0), jnp.float32(0), jnp.float32(0))
    if len(views) == 1:
        return cam.camera_from_state(
            focus=Vec4.of(0.0, -2.0, 0.0, 0.0), angles=angles,
            focus_to_matrix_distance=1.5, matrix_height=2.0, view=views[0],
        )
    orient = cam.orientation_from_angles(angles.fi, angles.te, angles.psi)
    tops, rights = cam.batched_view_bases(orient, views)
    return cam.Camera(
        focus=Vec4.of(0.0, -2.0, 0.0, 0.0),
        vec_to_mtr=orient.forward * jnp.float32(1.5),
        top=tops, right=rights,
        mtr_width=jnp.float32(2.0) * cam.GOLDEN, mtr_height=jnp.float32(2.0),
    )


def build_cfg(width, height, samples, bounces, loop=None):
    return RenderConfig(
        width=width, height=height, samples=samples,
        reflections_amount=bounces, light_coefficient=0.12,
        sampler_method=SAMPLER, rng_mode="per_sample",
        bounce_loop=loop or LOOP, tile_sublanes=TILE_SUBLANES,
        sampler_iters=SAMPLER_ITERS, intersect=INTERSECT,
    )


def make_renderer(scene_name=None, cfg=None, views=("yxz",), impl=None,
                  frames_per_launch=1):
    """(jitted seed->image fn, rays/frame). Kept import-stable for
    tools/ab_bench.py. ``frames_per_launch`` > 1 (pallas only) renders
    that many whole frames (distinct seeds) per dispatch via the
    megakernel's grid frame axis — the interactive-scale batching that
    lifts dispatch-bound workloads off the launch-overhead floor."""
    cfg = cfg or build_cfg(WIDTH, HEIGHT, SAMPLES, BOUNCES)
    scene = library.SCENES[scene_name or SCENE]()
    if os.environ.get("BENCH_PAIRS") == "off" and cfg.intersect == "fast":
        # A/B knob: pre-set hints WITHOUT wall pairs so the pallas entry
        # point skips its auto hints+pairs derivation.
        import dataclasses

        from fourd_ray_tracing_tpu.models.scene import plane_norm_hints

        hints = plane_norm_hints(scene)
        if hints is not None:
            cfg = dataclasses.replace(cfg, plane_hints=hints)
    camera = default_camera(views)
    impl = impl or IMPL
    if impl == "pallas":
        from fourd_ray_tracing_tpu.ops.pallas.megakernel import render_image_pallas

        if frames_per_launch > 1:
            k = np.uint32(frames_per_launch)

            def fn(seed):
                seeds = jnp.uint32(seed) * k + jnp.arange(k, dtype=jnp.uint32)
                return render_image_pallas(scene, camera, cfg, seeds)

            return jax.jit(fn)
        return jax.jit(lambda seed: render_image_pallas(scene, camera, cfg, seed))
    from fourd_ray_tracing_tpu.models.renderer import render_image

    return jax.jit(lambda seed: render_image(scene, camera, cfg, seed))


def flops_per_ray(scene_name, cfg, views=("yxz",)):
    """XLA cost analysis of the identical-math jnp pipeline at a tiny
    resolution -> FLOPs per traced path (the Pallas kernel runs the same
    ops). Returns None if the backend exposes no analysis."""
    try:
        from fourd_ray_tracing_tpu.models.renderer import render_image
        import dataclasses

        small = dataclasses.replace(
            cfg, width=64, height=32, plane_hints=None, plane_pairs=None
        )
        scene = library.SCENES[scene_name]()
        camera = default_camera(views)
        compiled = (
            jax.jit(lambda seed: render_image(scene, camera, small, seed))
            .lower(np.uint32(1)).compile()
        )
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        rays = len(views) * small.width * small.height * small.samples
        return flops / rays if flops > 0 else None
    except Exception:
        return None


def _sync(out):
    """Force completion of ``out`` by fetching ONE element to the host.

    jax.block_until_ready was caught under-waiting on the tunneled axon
    backend for small-grid kernels (tools/vpu_peak.py docstring); on the
    big-grid megakernel workloads it agrees with a scalar fetch to 0.2%,
    but every timing round ends with this hard synchronization anyway.
    The fetch moves 4 bytes (a device-side slice), not the image."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def time_rounds(fn, rays, frames=FRAMES, rounds=ROUNDS):
    """min/median/max rays/s over timing rounds (compile excluded)."""
    _sync(fn(np.uint32(1)))  # compile + warm
    rates = []
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(frames):
            out = fn(np.uint32(100 * r + i + 2))
        _sync(out)
        rates.append(rays * frames / (time.perf_counter() - t0))
    return min(rates), statistics.median(rates), max(rates)


def emit(payload):
    print(json.dumps(payload), flush=True)


def run_forward_workload(name, scene_name, width, height, samples, bounces,
                         views=("yxz",), loop=None, frames_per_launch=1):
    cfg = build_cfg(width, height, samples, bounces, loop=loop)
    if IMPL != "pallas":
        frames_per_launch = 1  # grid frame axis is a megakernel feature
    fn = make_renderer(scene_name, cfg, views,
                       frames_per_launch=frames_per_launch)
    rays = len(views) * width * height * samples * frames_per_launch
    out = jax.block_until_ready(fn(np.uint32(1)))
    assert bool(jnp.isfinite(out).all()), f"non-finite pixels in {name}"
    # Small workloads are dispatch-bound per frame; run enough frames per
    # round (~4M rays) that the kernel, not the launch, is measured.
    frames = max(FRAMES, int(4e6 / rays))
    lo, med, hi = time_rounds(fn, rays, frames=frames)
    fpr = flops_per_ray(scene_name, cfg, views)
    payload = {
        "metric": "rays_per_second", "workload": name, "scene": scene_name,
        "value": med, "min": lo, "max": hi, "unit": "rays/s",
        "rays_per_frame": rays,
        "vs_baseline": med / TARGET_RAYS_PER_S,
    }
    if frames_per_launch > 1:
        payload["frames_per_launch"] = frames_per_launch
    if fpr is not None:
        payload["flops_per_ray"] = round(fpr, 1)
        payload["achieved_gflops"] = round(med * fpr / 1e9, 1)
        if VPU_PEAK_GFLOPS > 0:
            # MFU against the MEASURED fp32 VPU peak (tools/vpu_peak.py)
            # — the right roofline for a zero-matmul elementwise kernel.
            payload["mfu"] = round(med * fpr / 1e9 / VPU_PEAK_GFLOPS, 3)
            payload["vpu_peak_gflops"] = VPU_PEAK_GFLOPS
    emit(payload)
    return med


def run_grad_workload(width, height, samples, bounces, impl="pallas",
                      workload="inverse_step", scene_name="room_with_sphere",
                      views=("yxz",)):
    """Inverse-rendering step: loss + full scene gradient. ``impl``:

    * "pallas" — the value-and-grad megakernel (one launch computes loss
      AND all scene/camera gradients in VMEM; the production train path);
    * "xla" — jax.value_and_grad of the jnp pipeline with per-sample
      remat (the autodiff cross-check path).

    Reported as grad_rays_per_second where a "ray" is one traced path of
    the forward (the backward re-traces each)."""
    cfg = RenderConfig(
        width=width, height=height, samples=samples,
        reflections_amount=bounces, light_coefficient=0.12,
        sampler_method=SAMPLER, rng_mode="per_sample", intersect="fast",
        tile_sublanes=TILE_SUBLANES,
    )
    scene = library.SCENES[scene_name]()
    camera = default_camera(views)
    tshape = ((height, width, 3) if len(views) == 1
              else (len(views), height, width, 3))
    target = jnp.zeros(tshape, jnp.float32)

    if impl == "pallas":
        from fourd_ray_tracing_tpu.diff import with_frozen_hints
        from fourd_ray_tracing_tpu.ops.pallas.gradkernel import (
            render_loss_and_grad_pallas,
        )

        # Production training path: the forward's static wall/axis hints
        # under the freeze_hints contract (normals/hinted axes frozen,
        # everything else exact — RenderConfig.freeze_hints).
        kcfg = with_frozen_hints(cfg, scene)
        vg = jax.jit(
            lambda seed: render_loss_and_grad_pallas(
                scene, camera, kcfg, seed, target
            )
        )

        def fn(seed):
            loss, _grads = vg(seed)
            return loss

    else:
        from fourd_ray_tracing_tpu.diff import image_loss

        jvg = jax.jit(
            lambda s, seed: jax.value_and_grad(image_loss)(
                s, camera, cfg, seed, target
            )
        )

        def fn(seed):
            loss, grads = jvg(scene, seed)
            return loss

    rays = len(views) * width * height * samples
    loss = jax.block_until_ready(fn(np.uint32(1)))
    assert bool(jnp.isfinite(loss)), "non-finite loss in grad bench"
    # Queue FRAMES dispatches per round (not FRAMES//4): the eager grad
    # step is one kernel launch per call, and a shallow pipeline measures
    # the tunnel's multi-ms dispatch latency instead of the kernel.
    lo, med, hi = time_rounds(fn, rays, frames=FRAMES)
    payload = {
        "metric": "grad_rays_per_second", "workload": workload,
        "scene": scene_name, "impl": impl,
        "value": med, "min": lo, "max": hi,
        "unit": "rays/s", "rays_per_frame": rays,
        "vs_baseline": med / TARGET_RAYS_PER_S,
    }
    if impl == "pallas":
        # FLOPs/ray from XLA cost analysis of the KERNEL'S OWN math —
        # one tile program of the fused value-and-grad sweep, same
        # hints/chunking/vjp structure, evaluated on plain arrays
        # (gradkernel.kernel_flops_per_ray; VERDICT r4 #9 closed — the
        # jnp-pipeline proxy remains only on the xla cross-check line).
        from fourd_ray_tracing_tpu.ops.pallas.gradkernel import (
            kernel_flops_per_ray,
        )

        fpr = kernel_flops_per_ray(scene, camera, kcfg)
        flop_model = "kernel_jaxpr_count"
    else:
        fpr = grad_flops_per_ray(cfg, scene_name, views)
        flop_model = "jnp_pipeline_estimate"
    if fpr is not None:
        payload["flops_per_ray"] = round(fpr, 1)
        payload["achieved_gflops"] = round(med * fpr / 1e9, 1)
        payload["flop_model"] = flop_model
        if VPU_PEAK_GFLOPS > 0:
            payload["mfu"] = round(med * fpr / 1e9 / VPU_PEAK_GFLOPS, 3)
            payload["vpu_peak_gflops"] = VPU_PEAK_GFLOPS
    emit(payload)
    return med


def run_train_scan_workload(width, height, samples, bounces, k=4):
    """Steady-state TRAINING throughput: ``k`` full optimizer steps
    (value-and-grad megakernel + adam update, scene evolving) scanned
    inside ONE jit — the production train-loop shape, with zero per-step
    host dispatch. Complements inverse_step, which measures a single
    eagerly-dispatched value_and_grad call.

    Runs the PACKED-space step (diff.make_packed_train_step): adam on
    the kernel's flat parameter vector instead of the ~150-leaf scene
    pytree. tools/train_ablate.py attributed ~2.0 ms/step to per-leaf
    adam launches and ~0.5 ms to the gradient rebuild at this workload —
    packed space removes both; updates are bitwise the pytree step's."""
    import optax

    from fourd_ray_tracing_tpu.diff import (
        make_packed_train_step,
        with_frozen_hints,
    )

    cfg = RenderConfig(
        width=width, height=height, samples=samples,
        reflections_amount=bounces, light_coefficient=0.12,
        sampler_method=SAMPLER, rng_mode="per_sample", intersect="fast",
        tile_sublanes=TILE_SUBLANES,
    )
    scene0 = library.SCENES["room_with_sphere"]()
    cfg = with_frozen_hints(cfg, scene0)
    camera = default_camera()
    target = jnp.zeros((height, width, 3), jnp.float32)
    opt = optax.adam(1e-3)

    step, init, _unpack = make_packed_train_step(cfg, opt, camera, scene0)
    vec0, opt_state0 = init(scene0)

    @jax.jit
    def run_k(vec, opt_state, seeds):
        def body(carry, seed):
            vec, opt_state = carry
            vec, opt_state, loss = step(vec, opt_state, seed, target)
            return (vec, opt_state), loss

        (vec, opt_state), losses = jax.lax.scan(body, (vec, opt_state), seeds)
        return losses[-1]

    def fn(seed):
        seeds = jnp.uint32(seed) * np.uint32(k) + jnp.arange(k, dtype=jnp.uint32)
        return run_k(vec0, opt_state0, seeds)

    rays = width * height * samples * k
    loss = jax.block_until_ready(fn(np.uint32(1)))
    assert bool(jnp.isfinite(loss)), "non-finite loss in train scan bench"
    lo, med, hi = time_rounds(fn, rays, frames=max(1, FRAMES // 4))
    emit({
        "metric": "grad_rays_per_second", "workload": f"train_scan{k}",
        "scene": "room_with_sphere", "impl": "pallas",
        "value": med, "min": lo, "max": hi,
        "unit": "rays/s", "rays_per_frame": rays, "steps_per_launch": k,
        "vs_baseline": med / TARGET_RAYS_PER_S,
    })
    return med


def run_train_minibatch_workload(width, height, samples, bounces, f=4):
    """MINIBATCH training throughput (round 5): one full optimizer step
    whose gradient averages ``f`` independent estimator samples — the
    frame axis of ONE (frames, tiles)-grid value-and-grad dispatch
    (gradkernel._loss_grad_kernel n_frames). Sequential optimizer steps
    cannot batch across a jit like the forward's frames_per_launch
    does; the minibatch axis CAN, so this is the per-ray-fastest (and
    lowest-gradient-variance) way to spend rays on training. Packed-
    space adam, scalar seed in, frame seeds derived statically."""
    import optax

    from fourd_ray_tracing_tpu.diff import (
        make_packed_train_step,
        with_frozen_hints,
    )

    cfg = RenderConfig(
        width=width, height=height, samples=samples,
        reflections_amount=bounces, light_coefficient=0.12,
        sampler_method=SAMPLER, rng_mode="per_sample", intersect="fast",
        tile_sublanes=TILE_SUBLANES,
    )
    scene0 = library.SCENES["room_with_sphere"]()
    cfg = with_frozen_hints(cfg, scene0)
    camera = default_camera()
    target = jnp.zeros((height, width, 3), jnp.float32)
    opt = optax.adam(1e-3)

    step, init, _unpack = make_packed_train_step(
        cfg, opt, camera, scene0, frames_per_step=f
    )
    vec0, opt_state0 = init(scene0)

    def fn(seed):
        _vec, _st, loss = step(vec0, opt_state0, jnp.uint32(seed), target)
        return loss

    rays = width * height * samples * f
    loss = jax.block_until_ready(fn(np.uint32(1)))
    assert bool(jnp.isfinite(loss)), "non-finite loss in minibatch bench"
    lo, med, hi = time_rounds(fn, rays, frames=FRAMES)
    emit({
        "metric": "grad_rays_per_second", "workload": f"train_minibatch{f}",
        "scene": "room_with_sphere", "impl": "pallas",
        "value": med, "min": lo, "max": hi,
        "unit": "rays/s", "rays_per_frame": rays, "frames_per_step": f,
        "vs_baseline": med / TARGET_RAYS_PER_S,
    })
    return med


def run_soft_train_workload(width, height, samples, bounces):
    """Soft-silhouette training step on the KERNEL path: ONE fused
    value-and-grad dispatch per step (gradkernel.render_soft_loss_and_
    grad_pallas — both rows traced in one in-kernel vjp, the alpha
    blend + MSE in-kernel, alpha cotangent returned for the jnp
    coverage path; round 5, was 2 dispatches r4-late / 4 dispatches
    r4). A 'ray' is one traced path of ONE forward render; the step
    traces the pair, so the floor is ~2x a forward render per ray plus
    the reverse sweep."""
    from fourd_ray_tracing_tpu.diff import (
        soft_image_loss_pallas,
        with_frozen_hints,
    )

    cfg = RenderConfig(
        width=width, height=height, samples=samples,
        reflections_amount=bounces, light_coefficient=0.12,
        sampler_method=SAMPLER, rng_mode="per_sample", intersect="fast",
        tile_sublanes=TILE_SUBLANES,
    )
    scene = library.SCENES["room_with_sphere"]()
    cfg = with_frozen_hints(cfg, scene)
    camera = default_camera()
    target = jnp.zeros((height, width, 3), jnp.float32)
    ref = ("spheres", 0)

    vg = jax.jit(jax.value_and_grad(
        lambda s, seed: soft_image_loss_pallas(
            s, camera, cfg, seed, target, ref, 0.05
        )
    ))

    def fn(seed):
        loss, _ = vg(scene, seed)
        return loss

    rays = width * height * samples
    loss = jax.block_until_ready(fn(np.uint32(1)))
    assert bool(jnp.isfinite(loss)), "non-finite loss in soft train bench"
    lo, med, hi = time_rounds(fn, rays, frames=FRAMES)
    emit({
        "metric": "grad_rays_per_second", "workload": "soft_step",
        "scene": "room_with_sphere", "impl": "pallas",
        "value": med, "min": lo, "max": hi,
        "unit": "rays/s", "rays_per_frame": rays,
        "vs_baseline": med / TARGET_RAYS_PER_S,
        "note": "one fused 2-row value-and-grad dispatch per step",
    })
    return med


def grad_flops_per_ray(cfg, scene_name="room_with_sphere", views=("yxz",)):
    """XLA cost analysis of the jnp value-and-grad at tiny resolution ->
    FLOPs per traced forward path of the full loss+gradient step (the
    Pallas grad kernel runs the same estimator's derivative)."""
    try:
        import dataclasses

        from fourd_ray_tracing_tpu.diff import image_loss

        small = dataclasses.replace(cfg, width=64, height=32, remat=False)
        scene = library.SCENES[scene_name]()
        camera = default_camera(views)
        tshape = ((small.height, small.width, 3) if len(views) == 1
                  else (len(views), small.height, small.width, 3))
        target = jnp.zeros(tshape, jnp.float32)
        compiled = (
            jax.jit(
                lambda s, seed: jax.value_and_grad(image_loss)(
                    s, camera, small, seed, target
                )
            )
            .lower(scene, np.uint32(1)).compile()
        )
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        rays = len(views) * small.width * small.height * small.samples
        return flops / rays if flops > 0 else None
    except Exception:
        return None


def main():
    if MODE == "single":
        cfg = build_cfg(WIDTH, HEIGHT, SAMPLES, BOUNCES)
        fn = make_renderer(SCENE, cfg)
        rays = WIDTH * HEIGHT * SAMPLES
        out = jax.block_until_ready(fn(np.uint32(1)))
        assert bool(jnp.isfinite(out).all())
        lo, med, hi = time_rounds(fn, rays)
        emit({"metric": "rays_per_second", "value": med, "min": lo, "max": hi,
              "unit": "rays/s", "vs_baseline": med / TARGET_RAYS_PER_S})
        return

    # Gradient workloads: the Pallas value-and-grad kernel at NORTH-STAR
    # resolution (the headline grad number), plus the jnp pipeline at a
    # smaller size as the autodiff cross-check line.
    grad_res = (
        int(os.environ.get("BENCH_GRAD_WIDTH", WIDTH)),
        int(os.environ.get("BENCH_GRAD_HEIGHT", HEIGHT)),
    )
    grad_xla_res = (
        int(os.environ.get("BENCH_GRAD_XLA_WIDTH", 640)),
        int(os.environ.get("BENCH_GRAD_XLA_HEIGHT", 360)),
    )
    # The interactive-scale workload batches 128 whole frames per launch
    # (engine.step_frames / the megakernel grid frame axis): one 65K-ray
    # frame per dispatch is launch-overhead-bound, which is the wrong
    # thing to measure for an idle progressive-accumulation viewer.
    # 128 (~8.4M rays/launch) also rides out the tunnel's dispatch-
    # latency phases that a 32-frame launch still feels (measured
    # 140 -> 513 Mray/s in a high-latency phase, flat in a good one).
    run_forward_workload(
        "sphere_plane_light_256", "sphere_plane_light", 256, 256, 1, 2,
        frames_per_launch=int(os.environ.get("BENCH_FRAMES_PER_LAUNCH", 128)))
    # Heavy workloads batch 4 accumulation frames per launch too
    # (bit-identical per frame, disclosed via frames_per_launch): ~30M
    # rays per dispatch keeps the measurement on the KERNEL even during
    # the tunnel's multi-ms dispatch-latency phases. BENCH_HEAVY_FPL=1
    # restores single-frame launches.
    hfpl = int(os.environ.get("BENCH_HEAVY_FPL", 4))
    headline = run_forward_workload(
        "room_1280x720x8x4", "room_with_sphere", WIDTH, HEIGHT, SAMPLES,
        BOUNCES, frames_per_launch=hfpl)
    if hfpl != 1:
        # Single-frame-per-launch companion line (ADVICE r3 #4): keeps
        # cross-round comparisons vs the rounds-1/2 unbatched baselines
        # apples-to-apples; the delta vs the batched line is the
        # per-dispatch overhead, not kernel speed.
        run_forward_workload(
            "room_fpl1", "room_with_sphere", WIDTH, HEIGHT, SAMPLES,
            BOUNCES, frames_per_launch=1)
    run_forward_workload(
        "hypercube_1280x720x8x4", "hypercube", WIDTH, HEIGHT, SAMPLES,
        BOUNCES, frames_per_launch=hfpl)
    # Three-view workloads also run unrolled: the direct candidate fold
    # shrank the tiger kernel enough that the unrolled Mosaic compile
    # dropped from 10+ minutes (round 1) to seconds, and unroll is ~3%
    # faster steady-state than fori.
    run_forward_workload(
        "duocylinder_3view", "duocylinder", WIDTH, HEIGHT, SAMPLES, BOUNCES,
        views=cam.VIEWS_ALL, frames_per_launch=hfpl)
    run_forward_workload(
        "tiger_3view", "tiger", WIDTH, HEIGHT, SAMPLES, BOUNCES,
        views=cam.VIEWS_ALL, frames_per_launch=hfpl)
    grad_impl = "pallas" if IMPL == "pallas" else "xla"
    run_grad_workload(grad_res[0], grad_res[1], SAMPLES, BOUNCES,
                      impl=grad_impl)
    if grad_impl == "pallas":
        run_train_scan_workload(grad_res[0], grad_res[1], SAMPLES, BOUNCES)
        run_train_minibatch_workload(grad_res[0], grad_res[1], SAMPLES,
                                     BOUNCES)
        # The heaviest scene through the grad kernel (VERDICT r4 #3):
        # pass 2 unrolls the reverse bounce loop over the tiger fold.
        run_grad_workload(grad_res[0], grad_res[1], SAMPLES, BOUNCES,
                          impl="pallas", workload="inverse_step_tiger",
                          scene_name="tiger")
        run_soft_train_workload(grad_res[0], grad_res[1], SAMPLES, BOUNCES)
        run_grad_workload(grad_xla_res[0], grad_xla_res[1], SAMPLES, BOUNCES,
                          impl="xla", workload="inverse_step_xla")

    # The driver parses the LAST line: headline = room-with-sphere median.
    emit({
        "metric": "rays_per_second", "value": headline, "unit": "rays/s",
        "vs_baseline": headline / TARGET_RAYS_PER_S,
    })


if __name__ == "__main__":
    main()

"""Pallas value-and-grad megakernel: loss AND scene/camera gradients in
one VMEM-resident pass per tile.

The reference has no gradient path; the north star adds one
(BASELINE.md:17 "pixel+grad"). Round 2 ran gradients through the XLA jnp
pipeline at ~7% of the Pallas forward throughput; this kernel closes
that gap by differentiating INSIDE the megakernel: the loss for a pixel
tile is a function of the ~P packed scene/camera scalars (SMEM), so each
tile program

1. runs ONE `jax.vjp` over the whole sample chunk (bounce loop unrolled
   — reverse-mode needs the unrolled form): the linearization forward
   produces the per-pixel summed light with residuals held in
   VMEM/registers,
2. derives the per-pixel loss cotangent through the tone map + MSE
   (`jax.vjp` of the tile loss, shader.frag:509-511 + the target
   image), masked to valid lanes so padded tail lanes contribute
   nothing, and
3. applies the chunk's transpose with that cotangent, accumulating the
   P scalar parameter cotangents in registers. The per-lane partials
   reduce to scalars inside the tile (the transpose of the
   scene-parameter broadcasts), so the only gradient traffic leaving
   the kernel is (tiles, P) floats, summed on the host side of the
   launch.

When `cfg.grad_sample_chunk` < samples (high-spp configs), the kernel
falls back to the round-4 two-pass form: a plain forward sample loop
for the loss, then a chunked reverse sweep re-tracing G samples per
`jax.vjp` with the shared envelope recomputed once per chunk.

This is reverse-mode AD *of the estimator at fixed RNG* (diff.py's
documented semantics) — the uniforms are integer counter streams with
zero tangents, discrete hit/mirror decisions stay frozen, exactly like
the jnp pipeline. tests/test_gradkernel.py checks loss and every
parameter gradient against jax.value_and_grad of diff.image_loss.

Cost, MEASURED (round 5, same-phase on v5e): the fused single-sweep
form runs at **1.15x** the forward kernel's step time (0.824 vs 0.944
Gray/s on room 1280x720x8x4 with frozen hints) — down from the
round-4 two-pass kernel's 1.75x (tools/train_ablate.py attribution:
pass 1 = 1.0x forward, per-sample pass 2 += 0.75x; fusing deletes pass
1's redundant second forward, and G=samples chunking shares one
envelope recompute across the whole reverse sweep). All 8 samples'
trace residuals fit VMEM without spilling at 32 sublanes. Tile sweep
(re-run on the FUSED form with the raised VMEM budget): 32 sublanes
stays optimal — 16 -> -7% (0.758 vs 0.818), 64 -> -14% (0.707), 8
fails to compile.

Static hints: by default the kernel refuses plane/pair/axis hints
(hint-dropped terms would distort those components' gradients). With
``RenderConfig.freeze_hints`` it instead runs the SAME hinted folds as
the production forward (bit-identical loss — the dropped terms are exact
float32 zeros) under the contract that hyperplane-normal and hinted-axis
gradients are defined zero (models.scene.freeze_hint_grads); every other
gradient stays exact. That recovers the forward's fold cost for training
runs that don't rotate walls — the wall fold is the dominant per-bounce
cost on closed scenes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourd_ray_tracing_tpu.camera import Camera
from fourd_ray_tracing_tpu.models.renderer import (
    RenderConfig,
    precompute_bounce0,
    sample_stream_bits,
)
from fourd_ray_tracing_tpu.models.scene import Scene
from fourd_ray_tracing_tpu.ops import rng
from fourd_ray_tracing_tpu.ops.pallas.megakernel import (
    LANES,
    _pack_pytree,
    _tile_camera,
    _tile_pixels,
    _trace_rays_kernel,
)
from fourd_ray_tracing_tpu.ops.sky import light_to_color
from fourd_ray_tracing_tpu.ops.vec4 import Vec3, normalize


# Perf-debugging switch: compile the kernel WITHOUT the pass-2 reverse
# sweep (gradients come out zero) to attribute step time between the
# forward/cotangent half and the per-sample vjp sweep. Never set in
# production.
DEBUG_SKIP_PASS2 = False

# Mosaic scoped-VMEM budget for the grad kernels. The default 16 MiB
# rejects the fused single-sweep form on heavy scenes (tiger needs
# 63 MiB of chunk residuals at G=8/32 sublanes); v5e has 128 MiB of
# physical VMEM, and raising the budget is measured FREE on scenes that
# fit the default (room 0.851 vs 0.851 Gray/s same-phase A/B) while
# unlocking tiger 0.348 -> 0.440 and hypercube 0.430 -> 0.562 fused.
GRAD_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _grad_compiler_params(interpret: bool, n_grid_dims: int = 1):
    """compiler_params for the grad kernels (None in interpret mode —
    the Pallas interpreter takes no Mosaic params). Every grid dim is
    pinned "arbitrary" (sequential): the minibatch frame axis
    ACCUMULATES into shared SMEM rows (_loss_grad_kernel n_frames), so
    a megacore backend must never split the grid across cores."""
    if interpret:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=GRAD_VMEM_LIMIT_BYTES,
        dimension_semantics=("arbitrary",) * n_grid_dims,
    )


def _loss_grad_kernel(
    params_ref, seed_ref, tile0_ref, target_ref, loss_ref, grad_ref, *,
    rebuild, n_params: int, cfg: RenderConfig,
    n_views: int, height: int, width: int, vector_store: bool = False,
    n_frames: int = 1,
):
    # n_frames > 1: grid = (frames, tiles) — the MINIBATCH axis. Each
    # frame program reads its own seed (seed_ref is (F,)) and
    # contributes an independent estimator sample of the SAME loss.
    # This buys the grad kernel the same dispatch-grid amortization the
    # forward's frames_per_launch axis buys (megakernel._kernel), which
    # sequential optimizer steps cannot: measured 0.849 -> 1.176 Gray/s
    # at F=4 (F=8: 1.115 — past the knee), full adam step 1.165, room
    # 1280x720x8x4 same-phase. Frames ACCUMULATE into the
    # per-tile output rows in-kernel — TPU grid programs execute
    # sequentially, so the f>0 read-modify-write is race-free, and the
    # outputs stay (tiles, P): an (F*tiles, P) SMEM layout was measured
    # to blow the 1 MiB SMEM space at production shape (F=4: 1.33 MiB).
    if n_frames > 1:
        fprog = pl.program_id(0)
        tprog = pl.program_id(1)
        seed = seed_ref[fprog].astype(jnp.uint32)
    else:
        fprog = None
        tprog = pl.program_id(0)
        seed = seed_ref[0].astype(jnp.uint32)
    lrow = tprog
    # tile0: global index of this launch's first tile — 0 single-device;
    # device_index * tiles_local under mesh sharding (the tile axis IS
    # the shard axis, see sharded_loss_and_grad_pallas). Pixel coords and
    # RNG streams derive from the GLOBAL tile index, so sharding never
    # changes loss or gradients (SURVEY §4.6).
    pid = tprog + tile0_ref[0]
    scr_x, scr_y, view, valid = _tile_pixels(cfg, n_views, height, width, pid)
    tile_zero = jnp.zeros(scr_x.shape, jnp.float32)
    pixel_bits = rng.pixel_stream_bits(scr_x, scr_y)
    counter0 = rng.init_counter(seed, pixel_bits.shape)
    vals = tuple(params_ref[k] for k in range(n_params))
    inv_s = np.float32(1.0 / cfg.samples)

    def primary(vals):
        """Differentiable scene + primary rays from the packed scalars
        (ray_drct, shader.frag:501-505)."""
        scene, camera = rebuild(vals)
        top, right, vec_to_mtr, focus = _tile_camera(
            camera, view, n_views, tile_zero
        )
        mx = (scr_x - 0.5) * camera.mtr_width
        my = (0.5 - scr_y) * camera.mtr_height
        d = normalize(vec_to_mtr + top * my + right * mx)
        return scene, focus, d

    def sample_light(scene, o, d, pre0, s):
        bits = sample_stream_bits(pixel_bits, s.astype(jnp.uint32))
        light, _ = _trace_rays_kernel(
            scene, o, d, bits, seed, counter0, cfg, pre0=pre0, unroll=True
        )
        return light

    # --- tile loss + cotangent of the summed light --------------------
    # loss_tile = sum over VALID lanes of (tonemap(acc/S) - target)^2,
    # channel-summed; the caller scales by 1/(pixels*3) for the MSE.
    t = Vec3(target_ref[0, 0], target_ref[0, 1], target_ref[0, 2])
    vmask = jnp.where(valid, 1.0, 0.0)

    def tile_loss(acc_xyz):
        light = Vec3(*acc_xyz) * inv_s
        c = light_to_color(light, jnp.float32(cfg.light_coefficient))
        return (
            jnp.sum(vmask * (c.x - t.x) ** 2)
            + jnp.sum(vmask * (c.y - t.y) ** 2)
            + jnp.sum(vmask * (c.z - t.z) ** 2)
        )

    # G-sample forward chunk (shared envelope — primary rays +
    # precompute_bounce0 — computed once per chunk). NOTE on a rejected
    # alternative: hoisting the envelope into its OWN jax.vjp and
    # carrying the accumulated (o, d, pre0) cotangents through the
    # reverse fori loop was tried and measured at 21 Mray/s vs 364
    # Mray/s for this form: the ~28 extra tile-array loop carries + the
    # envelope's live residuals blow VMEM and Mosaic spills every
    # sample. Recomputing the envelope inside each chunk's vjp keeps
    # everything in registers and wins by 17x.
    G = max(1, int(cfg.grad_sample_chunk))

    def chunk_fn(s):
        def f(*vals):
            scene, o, d = primary(vals)
            pre0 = precompute_bounce0(scene, o, d, cfg)
            acc = Vec3.full(0.0, like=tile_zero)
            for gi in range(G):
                acc = acc + sample_light(scene, o, d, pre0, s + gi)
            return acc.x, acc.y, acc.z

        return f

    zero_g = tuple(jnp.float32(0.0) for _ in range(n_params))
    if G == cfg.samples and not DEBUG_SKIP_PASS2:
        # --- fused single-sweep form (G == samples) -------------------
        # The whole tile runs as ONE jax.vjp: the linearization forward
        # produces the summed light (pass 1's only product) WITH
        # residuals, the in-kernel MSE derives the cotangent, and the
        # backward transposes straight to the P parameter cotangents.
        # This deletes the former pass 1's redundant second forward —
        # measured 1.67x -> 1.15x the forward kernel's step time on the
        # room workload (0.824 vs 0.944 Gray/s same-phase, v5e; the
        # round-4 two-pass kernel sat at 1.75x). Bitwise: the forward
        # sample order (s = 0..S-1, sequential adds) matches the old
        # fori accumulation, so loss is unchanged; gradients equal the
        # chunked two-pass form up to float re-association (<2e-7 rel,
        # same as any G change).
        acc_xyz, vjp_fn = jax.vjp(chunk_fn(jnp.int32(0)), *vals)
        loss_val, tl_vjp = jax.vjp(tile_loss, acc_xyz)
        (cot_acc,) = tl_vjp(jnp.float32(1.0))
        g = vjp_fn(cot_acc)
    else:
        # --- two-pass form (sample chunks; also the DEBUG_SKIP_PASS2
        # attribution shape) -------------------------------------------
        # pass 1: forward sample loop -> per-pixel summed light.
        scene_f, o_f, d_f = primary(vals)
        pre0_f = precompute_bounce0(scene_f, o_f, d_f, cfg)

        def fwd_body(s, acc):
            light = sample_light(scene_f, o_f, d_f, pre0_f, s)
            return acc + light

        acc = jax.lax.fori_loop(
            0, cfg.samples, fwd_body, Vec3.full(0.0, like=tile_zero)
        )
        loss_val, tl_vjp = jax.vjp(tile_loss, (acc.x, acc.y, acc.z))
        (cot_acc,) = tl_vjp(jnp.float32(1.0))

        # pass 2: chunked reverse sweep. acc = sum_s light_s, so every
        # sample's light carries the SAME cotangent cot_acc; each body
        # traces G samples forward (one shared envelope recompute per
        # chunk) and transposes the chunk's summed light, accumulating P
        # scalar cotangents. vjp is linear in cotangents, so chunking
        # only re-associates the accumulation order.
        def grad_body(i, g):
            _, vjp_fn = jax.vjp(chunk_fn(i * G), *vals)
            gs = vjp_fn(cot_acc)
            return tuple(a + b for a, b in zip(g, gs))

        if DEBUG_SKIP_PASS2:
            g = zero_g
        else:
            g = jax.lax.fori_loop(0, cfg.samples // G, grad_body, zero_g)
    # Outputs live as FULL (tiles, ...) SMEM arrays (Mosaic's blocked
    # specs require (8,128)-divisible tails); each program writes its
    # LOCAL tile row (outputs are per-launch: program_id, not pid). In
    # minibatch mode frame f > 0 ACCUMULATES onto frame 0's row — the
    # where() masks the f == 0 read of uninitialized SMEM to exact 0.
    if n_frames > 1:
        first = fprog == 0
        loss_val = jnp.where(first, 0.0, loss_ref[lrow, 0]) + loss_val
        if not vector_store:
            g = tuple(
                jnp.where(first, 0.0, grad_ref[lrow, k]) + g[k]
                for k in range(n_params)
            )
    loss_ref[lrow, 0] = loss_val
    if vector_store:
        # Interpret mode (CPU tests/dryruns): ONE row store. n_params
        # chained scalar stores lower to a dynamic-update-slice chain
        # that sends XLA's algebraic simplifier into its 50-run circular
        # loop under SPMD partitioning (VERDICT r3 weak #4; minimal
        # repro: any 2-output SMEM pallas_call with ~150 scalar stores
        # inside shard_map). Mosaic SMEM stores stay scalar.
        row = jnp.stack(g)
        if n_frames > 1:
            row = jnp.where(first, jnp.float32(0.0), grad_ref[lrow, :]) + row
        grad_ref[lrow, :] = row
    else:
        for k in range(n_params):
            grad_ref[lrow, k] = g[k]


def _light_vjp_kernel(
    params_ref, seed_ref, tile0_ref, cot_ref, grad_ref, *,
    rebuild, n_params: int, cfg: RenderConfig,
    n_views: int, height: int, width: int, vector_store: bool = False,
    frame_params: bool = False,
):
    """Pass-2-only variant of _loss_grad_kernel: the per-pixel cotangent
    of the SUMMED light arrives as an input (cot_ref tiles) instead of
    being derived from an in-kernel MSE, so ANY outer jnp loss can
    backpropagate through the production renderer (render_light_vjp_pallas
    / diff.pallas_render_light). Same chunked jax.vjp reverse sweep,
    same estimator-at-fixed-RNG semantics, same (tiles, P) gradient
    traffic. ``frame_params``: grid is (F, tiles) and params is (F, P) —
    each frame program transposes its OWN scene row against its own
    cotangent slice (render_light_vjp_pallas_multi, the soft-silhouette
    pair's single backward dispatch)."""
    seed = seed_ref[0].astype(jnp.uint32)
    if frame_params:
        from fourd_ray_tracing_tpu.ops.pallas.megakernel import _RowView

        f = pl.program_id(0)
        tprog = pl.program_id(1)
        vals_src = _RowView(params_ref, f)
    else:
        tprog = pl.program_id(0)
        vals_src = params_ref
    pid = tprog + tile0_ref[0]
    scr_x, scr_y, view, _valid = _tile_pixels(cfg, n_views, height, width, pid)
    tile_zero = jnp.zeros(scr_x.shape, jnp.float32)
    pixel_bits = rng.pixel_stream_bits(scr_x, scr_y)
    counter0 = rng.init_counter(seed, pixel_bits.shape)
    vals = tuple(vals_src[k] for k in range(n_params))
    # Padded/invalid lanes carry zero cotangents (the caller's tile
    # layout zero-pads), so no mask is needed here.
    if frame_params:
        cot_acc = (cot_ref[0, 0, 0], cot_ref[0, 0, 1], cot_ref[0, 0, 2])
    else:
        cot_acc = (cot_ref[0, 0], cot_ref[0, 1], cot_ref[0, 2])

    def primary(vals):
        scene, camera = rebuild(vals)
        top, right, vec_to_mtr, focus = _tile_camera(
            camera, view, n_views, tile_zero
        )
        mx = (scr_x - 0.5) * camera.mtr_width
        my = (0.5 - scr_y) * camera.mtr_height
        d = normalize(vec_to_mtr + top * my + right * mx)
        return scene, focus, d

    G = max(1, int(cfg.grad_sample_chunk))

    def chunk_fn(s):
        def f(*vals):
            scene, o, d = primary(vals)
            pre0 = precompute_bounce0(scene, o, d, cfg)
            acc = Vec3.full(0.0, like=tile_zero)
            for gi in range(G):
                bits = sample_stream_bits(
                    pixel_bits, (s + gi).astype(jnp.uint32)
                )
                light, _ = _trace_rays_kernel(
                    scene, o, d, bits, seed, counter0, cfg, pre0=pre0,
                    unroll=True,
                )
                acc = acc + light
            return acc.x, acc.y, acc.z

        return f

    def grad_body(i, g):
        _, vjp_fn = jax.vjp(chunk_fn(i * G), *vals)
        gs = vjp_fn(cot_acc)
        return tuple(a + b for a, b in zip(g, gs))

    zero_g = tuple(jnp.float32(0.0) for _ in range(n_params))
    g = jax.lax.fori_loop(0, cfg.samples // G, grad_body, zero_g)
    if frame_params:
        if vector_store:
            grad_ref[f, tprog, :] = jnp.stack(g)
        else:
            for k in range(n_params):
                grad_ref[f, tprog, k] = g[k]
    elif vector_store:
        # See _loss_grad_kernel: one row store avoids the SPMD
        # algebraic-simplifier loop in interpret mode.
        grad_ref[tprog, :] = jnp.stack(g)
    else:
        for k in range(n_params):
            grad_ref[tprog, k] = g[k]


def render_light_vjp_pallas(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, cot_light,
    interpret: bool | None = None,
):
    """(grad_scene, grad_camera) = the VJP of the MEAN-light render
    (render_light_pallas semantics) with per-pixel cotangent
    ``cot_light`` (shape (H, W, 3) or (V, H, W, 3)) — computed entirely
    by the pass-2 megakernel. This is the building block that puts ANY
    jnp loss over rendered images on the kernel path
    (diff.pallas_render_light / diff.soft_image_loss kernel impl).

    Honors cfg.freeze_hints exactly like render_loss_and_grad_pallas.
    """
    cfg = _auto_hints(scene, cfg)
    return _render_light_vjp_jit(scene, camera, cfg, seed, cot_light, interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _render_light_vjp_jit(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, cot_light,
    interpret: bool | None = None,
):
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    n_params = int(packed.shape[0])
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_tiles = pl.cdiv(total, tile)
    # The kernel accumulates against the SUMMED light (acc = sum_s
    # light_s); the public cotangent is w.r.t. the MEAN light.
    cot_tiles = _target_tiles(
        jnp.asarray(cot_light, jnp.float32) * np.float32(1.0 / cfg.samples),
        total, n_tiles, cfg.tile_sublanes,
    )
    seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1)
    tile0_arr = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(
        _light_vjp_kernel, rebuild=rebuild, n_params=n_params, cfg=cfg,
        n_views=n_views, height=height, width=width,
        vector_store=bool(interpret),
    )
    grad_parts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 3, cfg.tile_sublanes, LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_params), jnp.float32),
        interpret=interpret,
        compiler_params=_grad_compiler_params(interpret),
    )(packed, seed_arr, tile0_arr, cot_tiles)
    return _freeze_grads(rebuild(jnp.sum(grad_parts, axis=0)), cfg)


def render_light_vjp_pallas_multi(
    scenes, camera: Camera, cfg: RenderConfig, seed, cot_lights,
    interpret: bool | None = None,
):
    """VJP of `megakernel.render_light_pallas_multi`: per-scene
    cotangents ``cot_lights`` (leading scene axis F) transpose against
    their scene rows in ONE (F, tiles)-grid dispatch. Returns
    ``(scene_grads, grad_camera)`` — a tuple of F scene gradient pytrees
    plus the camera gradient summed over scenes (the camera is shared).
    Row f equals `render_light_vjp_pallas(scenes[f], ..., cot_lights[f])`
    up to reduction order. Honors cfg.freeze_hints (hints derived from
    scenes[0], valid for zero-emulated drops)."""
    scenes = tuple(scenes)
    cfg = _auto_hints(scenes[0], cfg)
    return _render_light_vjp_multi_jit(
        scenes, camera, cfg, seed, cot_lights, interpret
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _render_light_vjp_multi_jit(
    scenes, camera: Camera, cfg: RenderConfig, seed, cot_lights,
    interpret: bool | None = None,
):
    from fourd_ray_tracing_tpu.ops.pallas.megakernel import _pack_scene_rows

    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_scene_rows(scenes, camera)
    n_scenes = int(packed.shape[0])
    n_params = int(packed.shape[1])
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_tiles = pl.cdiv(total, tile)
    cot = jnp.asarray(cot_lights, jnp.float32) * np.float32(1.0 / cfg.samples)
    cot_tiles = jnp.stack([
        _target_tiles(cot[i], total, n_tiles, cfg.tile_sublanes)
        for i in range(n_scenes)
    ])
    seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1)
    tile0_arr = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(
        _light_vjp_kernel, rebuild=rebuild, n_params=n_params, cfg=cfg,
        n_views=n_views, height=height, width=width,
        vector_store=bool(interpret), frame_params=True,
    )
    grad_parts = pl.pallas_call(
        kernel,
        grid=(n_scenes, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, 3, cfg.tile_sublanes, LANES),
                lambda f, i: (f, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_scenes, n_tiles, n_params), jnp.float32
        ),
        interpret=interpret,
        compiler_params=_grad_compiler_params(interpret, 2),
    )(packed, seed_arr, tile0_arr, cot_tiles)
    per_scene = [
        _freeze_grads(rebuild(jnp.sum(grad_parts[i], axis=0)), cfg)
        for i in range(n_scenes)
    ]
    scene_grads = tuple(g for g, _ in per_scene)
    cam_grad = jax.tree_util.tree_map(
        lambda *xs: sum(xs[1:], xs[0]), *(c for _, c in per_scene)
    )
    return scene_grads, cam_grad


def sharded_render_light_vjp_pallas_multi(
    scenes, camera: Camera, cfg: RenderConfig, seed, cot_lights, mesh,
    interpret: bool | None = None,
):
    """`render_light_vjp_pallas_multi` with the TILE axis sharded over
    ``mesh`` (tile0 scheme): each device transposes its block of pixel
    tiles for every scene row, then ONE psum over the mesh reduces the
    (F, P) gradients — the multi-chip backward of the soft-silhouette
    pair. Equal to the single-device multi VJP up to reduction order."""
    scenes = tuple(scenes)
    cfg = _auto_hints(scenes[0], cfg)
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from fourd_ray_tracing_tpu.ops.pallas.megakernel import _pack_scene_rows

    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_scene_rows(scenes, camera)
    n_scenes = int(packed.shape[0])
    n_params = int(packed.shape[1])
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_tiles = pl.cdiv(total, tile)
    n_tiles = pl.cdiv(n_tiles, n_dev) * n_dev
    tiles_local = n_tiles // n_dev
    cot = jnp.asarray(cot_lights, jnp.float32) * np.float32(1.0 / cfg.samples)
    cot_tiles = jnp.stack([
        _target_tiles(cot[i], total, n_tiles, cfg.tile_sublanes)
        for i in range(n_scenes)
    ])

    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local(packed, seed, cot_local):
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1)
        tile0_arr = (idx * tiles_local).astype(jnp.int32).reshape(1)
        kernel = functools.partial(
            _light_vjp_kernel, rebuild=rebuild, n_params=n_params, cfg=cfg,
            n_views=n_views, height=height, width=width,
            vector_store=bool(interpret), frame_params=True,
        )
        grad_parts = pl.pallas_call(
            kernel,
            grid=(n_scenes, int(cot_local.shape[1])),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 1, 3, cfg.tile_sublanes, LANES),
                    lambda f, i: (f, i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_scenes, int(cot_local.shape[1]), n_params), jnp.float32,
                vma=frozenset(axes),
            ),
            interpret=interpret,
            compiler_params=_grad_compiler_params(interpret, 2),
        )(packed, seed_arr, tile0_arr, cot_local)
        return jax.lax.psum(jnp.sum(grad_parts, axis=1), axes)

    # check_vma=False: same pinned pallas-internals workaround
    # (tools/repro_check_vma.py + the strict-xfail guard test).
    g = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, axes)),  # cot tile axis sharded
        out_specs=P(),
        check_vma=False,
    )(packed, jnp.asarray(seed, jnp.uint32), cot_tiles)

    per_scene = [_freeze_grads(rebuild(g[i]), cfg) for i in range(n_scenes)]
    scene_grads = tuple(s for s, _ in per_scene)
    cam_grad = jax.tree_util.tree_map(
        lambda *xs: sum(xs[1:], xs[0]), *(c for _, c in per_scene)
    )
    return scene_grads, cam_grad


def render_loss_and_grad_pallas(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target,
    interpret: bool | None = None,
):
    """(loss, (grad_scene, grad_camera)) of the MSE between the rendered
    tone-mapped image and ``target``, entirely via the value-and-grad
    megakernel. Semantically equal to
    ``jax.value_and_grad(diff.image_loss)`` on the jnp pipeline (same
    estimator, same RNG streams) up to float re-association; the
    per-parameter gradients reduce per tile in-kernel and sum over tiles
    here.

    ``seed`` may be a (F,) vector: F independent estimator samples of
    the SAME loss render as the frame axis of ONE (F, tiles)-grid
    dispatch and average — the minibatch step. Loss and gradients equal
    the mean of the F scalar-seed calls up to re-association, at the
    forward kernel's frames_per_launch amortization instead of F
    dispatches.

    With ``cfg.freeze_hints`` the kernel runs the forward's static
    plane/pair/axis hints (bit-identical loss) and zeroes the frozen
    parameters' gradients (RenderConfig.freeze_hints contract); hints are
    auto-derived here when the scene is concrete.
    """
    cfg = _auto_hints(scene, cfg)
    return _render_loss_and_grad_jit(scene, camera, cfg, seed, target, interpret)


def _check_cfg(cfg: RenderConfig) -> None:
    if cfg.rng_mode != "per_sample":
        raise ValueError(
            "the value-and-grad megakernel renders per-sample RNG streams"
        )
    if cfg.samples % max(1, cfg.grad_sample_chunk):
        raise ValueError(
            f"samples ({cfg.samples}) must be divisible by "
            f"grad_sample_chunk ({cfg.grad_sample_chunk})"
        )
    if (cfg.plane_hints is not None or cfg.plane_pairs is not None
            or cfg.axis_hints is not None) and not cfg.freeze_hints:
        raise ValueError(
            "static scene hints distort the hinted components' gradients; "
            "the value-and-grad kernel runs them only under the "
            "freeze_hints contract (RenderConfig.freeze_hints: hyperplane "
            "normals and hinted axes get zero gradients, everything else "
            "stays exact) — see diff.with_frozen_hints"
        )


def _auto_hints(scene: Scene, cfg: RenderConfig) -> RenderConfig:
    """Derive static hints for an eager (concrete-scene) freeze_hints
    call, mirroring megakernel.render_light_pallas's production entry.
    No-op under jit (tracer scene -> hint derivation returns None) — the
    train-step path threads hints statically via diff.with_frozen_hints."""
    import dataclasses

    from fourd_ray_tracing_tpu.models.scene import (
        axis_alignment_hints,
        plane_norm_hints,
        plane_pair_hints,
    )

    if not (cfg.freeze_hints and cfg.intersect == "fast"):
        return cfg
    if cfg.plane_hints is None:
        hints = plane_norm_hints(scene)
        if hints is not None:
            cfg = dataclasses.replace(
                cfg, plane_hints=hints,
                plane_pairs=plane_pair_hints(scene, hints),
            )
    if cfg.axis_hints is None:
        ah = axis_alignment_hints(scene)
        if ah is not None:
            cfg = dataclasses.replace(cfg, axis_hints=ah)
    return cfg


def _freeze_grads(grads, cfg: RenderConfig):
    """Apply the freeze_hints contract to a (scene, camera) grad pair."""
    if not cfg.freeze_hints:
        return grads
    from fourd_ray_tracing_tpu.models.scene import freeze_hint_grads

    g_scene, g_cam = grads
    return freeze_hint_grads(g_scene, cfg.plane_hints, cfg.axis_hints), g_cam


def _target_tiles(target, total: int, n_tiles: int, sublanes: int):
    """Target image -> the kernel's tile layout (tiles, 3, sublanes, 128);
    padded tail lanes hold zeros (masked off in-kernel anyway)."""
    tile = sublanes * LANES
    t = jnp.asarray(target, jnp.float32).reshape(total, 3)
    t = jnp.pad(t, ((0, n_tiles * tile - total), (0, 0)))
    return t.reshape(n_tiles, sublanes, LANES, 3).transpose(0, 3, 1, 2)


def _launch(packed, rebuild, seed, tile0, t_tiles, cfg, n_views, height,
            width, interpret, vma=None):
    """One value-and-grad kernel launch over t_tiles.shape[0] tiles
    starting at global tile index ``tile0``. Returns (loss_parts,
    grad_parts) — UNSCALED per-tile sums, additive across launches.
    ``vma``: mesh axes the outputs vary over (required by shard_map's
    replication checker when launching inside it)."""
    n_params = int(packed.shape[0])
    n_tiles = int(t_tiles.shape[0])
    sublanes = cfg.tile_sublanes
    # Scalar seed -> 1-frame launch; (F,) seed vector -> minibatch grid
    # (F, tiles): F independent estimator samples of the same loss in
    # ONE dispatch (see _loss_grad_kernel's n_frames note).
    seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(-1)
    n_frames = int(seed_arr.shape[0])
    tile0_arr = jnp.asarray(tile0, jnp.int32).reshape(1)
    kernel = functools.partial(
        _loss_grad_kernel, rebuild=rebuild, n_params=n_params, cfg=cfg,
        n_views=n_views, height=height, width=width,
        vector_store=bool(interpret), n_frames=n_frames,
    )

    def out_struct(shape):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, jnp.float32)
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))

    if n_frames > 1:
        grid = (n_frames, n_tiles)
        t_spec = pl.BlockSpec(
            (1, 3, sublanes, LANES),
            lambda f, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        grid = (n_tiles,)
        t_spec = pl.BlockSpec(
            (1, 3, sublanes, LANES),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            t_spec,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            out_struct((n_tiles, 1)),
            out_struct((n_tiles, n_params)),
        ),
        interpret=interpret,
        compiler_params=_grad_compiler_params(interpret, len(grid)),
    )(packed, seed_arr, tile0_arr, t_tiles)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _render_loss_and_grad_jit(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target,
    interpret: bool | None = None,
):
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_tiles = pl.cdiv(total, tile)
    t_tiles = _target_tiles(target, total, n_tiles, cfg.tile_sublanes)

    loss_parts, grad_parts = _launch(
        packed, rebuild, seed, 0, t_tiles, cfg, n_views, height, width,
        interpret,
    )
    n_frames = max(1, int(np.prod(jnp.shape(seed))))
    scale = np.float32(1.0 / (n_frames * total * 3))
    loss = jnp.sum(loss_parts) * scale
    g_packed = jnp.sum(grad_parts, axis=0) * scale
    grads = _freeze_grads(rebuild(g_packed), cfg)
    return loss, grads


_FLOP_PRIMS = {
    "add", "sub", "mul", "div", "rem", "neg", "sqrt", "rsqrt", "exp",
    "log", "log1p", "expm1", "sin", "cos", "tan", "atan2", "pow",
    "integer_pow", "abs", "sign", "floor", "ceil", "round", "max", "min",
    "cbrt", "logistic", "tanh", "erf",
}


def _count_jaxpr_flops(jaxpr) -> float:
    """Floating-point op count of a (closed) jaxpr: 1 flop per output
    element of each arithmetic primitive on a float dtype, input-size
    for reductions, recursing into pjit/custom-call/scan sub-jaxprs
    (scan bodies multiply by trip count). Compares, selects, bit ops,
    converts and integer (RNG) arithmetic count zero — XLA's "useful
    flops" convention, applied to the EXACT program Mosaic lowers
    (jax.make_jaxpr of the kernel math), immune to whatever
    rematerialization XLA's own compilation of an equivalent graph
    would pick."""
    import numpy as _np

    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        sub = None
        mult = 1.0
        if "jaxpr" in eqn.params:
            sub = eqn.params["jaxpr"]
        elif "call_jaxpr" in eqn.params:
            sub = eqn.params["call_jaxpr"]
        elif name == "scan":
            sub = eqn.params["jaxpr"]
            mult = float(eqn.params.get("length", 1))
        elif name == "while":
            # Trip count is dynamic; count one body iteration (the grad
            # kernel's production fused form is loop-free anyway).
            sub = eqn.params["body_jaxpr"]
        if sub is not None:
            inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            total += mult * _count_jaxpr_flops(inner)
            continue
        out = eqn.outvars[0].aval
        if not jnp.issubdtype(out.dtype, jnp.floating):
            continue
        if name in _FLOP_PRIMS:
            total += float(_np.prod(out.shape) or 1.0)
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod"):
            total += float(_np.prod(eqn.invars[0].aval.shape) or 1.0)
        elif name == "dot_general":
            d = eqn.params["dimension_numbers"]
            m = float(_np.prod(out.shape) or 1.0)
            k = float(_np.prod([
                eqn.invars[0].aval.shape[i] for i in d[0][0]
            ]) or 1.0)
            total += 2.0 * m * k
    return total


def kernel_flops_per_ray(scene: Scene, camera: Camera, cfg: RenderConfig):
    """Measured FLOPs per traced path of the value-and-grad kernel's
    ACTUAL math (VERDICT r4 #9: replaces the jnp-pipeline proxy on the
    training MFU lines).

    Reconstructs one tile program of the fused kernel — same hints, same
    chunking, same vjp structure, literally the kernel's own
    primary/chunk/tile-loss closures evaluated on plain jnp arrays
    instead of Refs — and counts the flops of its jaxpr
    (`_count_jaxpr_flops`). A jaxpr walk, NOT XLA cost analysis: XLA
    compiles the standalone tile function with its own rematerialization
    choices (on the tiger's unrolled reverse sweep that inflated the
    count ~6x past the VPU peak, an impossible >1 MFU), while the jaxpr
    IS the program Mosaic lowers. Returns None for two-pass configs
    (grad_sample_chunk < samples) whose executed mix differs from the
    traced fused form. Call with a concrete scene outside jit.
    """
    try:
        cfg = _auto_hints(scene, cfg)
        _check_cfg(cfg)
        top_x = jnp.asarray(camera.top.x)
        n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
        height, width = cfg.height, cfg.width
        packed, rebuild = _pack_pytree((scene, camera))
        n_params = int(packed.shape[0])
        sub, lanes = cfg.tile_sublanes, LANES
        scr_x, scr_y, view, valid = _tile_pixels(cfg, n_views, height, width, 0)
        tile_zero = jnp.zeros(scr_x.shape, jnp.float32)
        pixel_bits = rng.pixel_stream_bits(scr_x, scr_y)
        G = max(1, int(cfg.grad_sample_chunk))
        inv_s = np.float32(1.0 / cfg.samples)
        vmask = jnp.where(valid, 1.0, 0.0)

        def tile_step(params, seed, target_tile):
            counter0 = rng.init_counter(seed, pixel_bits.shape)
            vals = tuple(params[k] for k in range(n_params))

            def primary(vals):
                scene_, camera_ = rebuild(vals)
                top, right, vec_to_mtr, focus = _tile_camera(
                    camera_, view, n_views, tile_zero
                )
                mx = (scr_x - 0.5) * camera_.mtr_width
                my = (0.5 - scr_y) * camera_.mtr_height
                d = normalize(vec_to_mtr + top * my + right * mx)
                return scene_, focus, d

            def chunk(*vals):
                scene_, o, d = primary(vals)
                pre0 = precompute_bounce0(scene_, o, d, cfg)
                acc = Vec3.full(0.0, like=tile_zero)
                for s in range(G):
                    bits = sample_stream_bits(pixel_bits, np.uint32(s))
                    light, _ = _trace_rays_kernel(
                        scene_, o, d, bits, seed, counter0, cfg, pre0=pre0,
                        unroll=True,
                    )
                    acc = acc + light
                return acc.x, acc.y, acc.z

            t = Vec3(target_tile[0], target_tile[1], target_tile[2])

            def tile_loss(acc_xyz):
                light = Vec3(*acc_xyz) * inv_s
                c = light_to_color(light, jnp.float32(cfg.light_coefficient))
                return (
                    jnp.sum(vmask * (c.x - t.x) ** 2)
                    + jnp.sum(vmask * (c.y - t.y) ** 2)
                    + jnp.sum(vmask * (c.z - t.z) ** 2)
                )

            acc_xyz, vjp_fn = jax.vjp(chunk, *vals)
            loss_val, tl_vjp = jax.vjp(tile_loss, acc_xyz)
            (cot,) = tl_vjp(jnp.float32(1.0))
            reps = max(1, cfg.samples // G)  # remaining chunks (two-pass)
            g = vjp_fn(cot)
            return loss_val, jnp.stack(g) * np.float32(reps)

        if G < cfg.samples:
            return None  # two-pass executed mix differs from this trace
        target_tile = jnp.zeros((3, sub, lanes), jnp.float32)
        jaxpr = jax.make_jaxpr(tile_step)(packed, jnp.uint32(1), target_tile)
        flops = _count_jaxpr_flops(jaxpr.jaxpr)
        rays = sub * lanes * cfg.samples
        return flops / rays if flops > 0 else None
    except Exception:
        return None


def make_packed_loss_and_grad(
    scene: Scene, camera: Camera, cfg: RenderConfig,
    interpret: bool | None = None,
):
    """Packed-space loss+grad for the PRODUCTION train loop (VERDICT r4
    #1). tools/train_ablate.py attributed the train_scan4 shortfall: the
    kernel itself runs at 1.75x the forward's step time (pass 2 = 0.75x,
    re-measured — the round-4 "1.6x" note was optimistic), but the
    PYTREE-space step around it added ~2.6 ms/step on top — adam over
    ~150 scalar leaves costs ~2.0 ms in per-leaf kernel launches, and the
    gradient rebuild's ~150 slices + freeze tree-map another ~0.5 ms.
    Both are artifacts of leaving packed space between the kernel and the
    optimizer: the kernel already consumes and produces ONE flat (P,)
    vector (`_pack_pytree`). This builder keeps the whole training state
    in that vector:

        fn, scene_vec0, unpack = make_packed_loss_and_grad(scene, camera, cfg)
        loss, grad_vec = fn(scene_vec, seed, target)   # jittable
        # adam on the (n_scene,) vector = ONE fused elementwise chain
        scene = unpack(scene_vec)                      # only when needed

    * ``scene_vec`` is the scene's slice of the packed vector (camera
      scalars ride along as closed-over constants — the step optimizes
      scene parameters, matching diff.make_train_step).
    * Gradients are bitwise those of `render_loss_and_grad_pallas`
      per element: same kernel, same (tiles, P) sum, and the
      freeze_hints contract applied as a packed 0/1 mask built by
      packing `freeze_hint_grads` of an all-ones scene.
    * Adam/optimizer math is elementwise, so vector-space updates are
      bit-identical to the per-leaf pytree updates
      (tests/test_gradkernel.py::test_packed_train_step_matches_pytree).

    Call OUTSIDE jit with a concrete scene (hints derive here).
    """
    cfg = _auto_hints(scene, cfg)
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    scene_leaves = jax.tree_util.tree_leaves(scene)
    n_scene = int(sum(np.prod(np.shape(l)) or 1 for l in scene_leaves))
    cam_vec = packed[n_scene:]
    scene_treedef = jax.tree_util.tree_structure(scene)

    if cfg.freeze_hints:
        ones = jax.tree_util.tree_map(
            lambda l: jnp.ones_like(jnp.asarray(l, jnp.float32)), scene
        )
        from fourd_ray_tracing_tpu.models.scene import freeze_hint_grads

        masked = freeze_hint_grads(ones, cfg.plane_hints, cfg.axis_hints)
        mask_vec = jnp.concatenate([
            jnp.asarray(l, jnp.float32).reshape(-1)
            for l in jax.tree_util.tree_leaves(masked)
        ])
    else:
        mask_vec = None

    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_tiles = pl.cdiv(total, tile)
    scale = np.float32(1.0 / (total * 3))

    def fn(scene_vec, seed, target):
        # A (F,) seed vector runs the F-frame minibatch grid (see
        # _loss_grad_kernel's n_frames note); loss/grads average.
        full = jnp.concatenate([scene_vec, cam_vec])
        t_tiles = _target_tiles(target, total, n_tiles, cfg.tile_sublanes)
        loss_parts, grad_parts = _launch(
            full, rebuild, seed, 0, t_tiles, cfg, n_views, height, width,
            interpret,
        )
        n_frames = max(1, int(np.prod(jnp.shape(seed))))
        fscale = np.float32(scale / n_frames)
        loss = jnp.sum(loss_parts) * fscale
        g = jnp.sum(grad_parts[:, :n_scene], axis=0) * fscale
        if mask_vec is not None:
            g = g * mask_vec
        return loss, g

    def unpack(scene_vec):
        leaves, off = [], 0
        for l in scene_leaves:
            shape = jnp.shape(l)
            size = int(np.prod(shape)) if shape else 1
            part = scene_vec[off:off + size]
            leaves.append(part.reshape(shape) if shape else part[0])
            off += size
        return jax.tree_util.tree_unflatten(scene_treedef, leaves)

    return fn, packed[:n_scene], unpack


def sharded_loss_and_grad_pallas(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target, mesh,
    interpret: bool | None = None,
):
    """(loss, (grad_scene, grad_camera)) with the TILE axis of the
    value-and-grad kernel sharded over every device of ``mesh`` — the
    multi-chip training path on the production kernel.

    Each device launches the kernel on its block of pixel tiles (tile0 =
    device_index * tiles_local; pixel coords and RNG streams derive from
    the GLOBAL tile index) against its slice of the target; the per-tile
    loss/gradient sums are additive, so one `psum` over the whole mesh
    (riding ICI) produces loss and gradients identical to the
    single-device kernel up to reduction order. The tile count pads up to
    a multiple of the device count; padding tiles have every lane masked
    invalid and contribute exact zeros.

    ``cfg.freeze_hints`` works exactly as in the single-device entry
    (hints auto-derived for a concrete scene, frozen grads zeroed).
    """
    cfg = _auto_hints(scene, cfg)
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_tiles = pl.cdiv(total, tile)
    n_tiles = pl.cdiv(n_tiles, n_dev) * n_dev  # pad to a device multiple
    tiles_local = n_tiles // n_dev
    t_tiles = _target_tiles(target, total, n_tiles, cfg.tile_sublanes)

    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local(packed, seed, t_tiles_local):
        # Linear device index over the whole mesh = global tile offset.
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        loss_parts, grad_parts = _launch(
            packed, rebuild, seed, idx * tiles_local, t_tiles_local,
            cfg, n_views, height, width, interpret, vma=axes,
        )
        loss = jax.lax.psum(jnp.sum(loss_parts), axes)
        g = jax.lax.psum(jnp.sum(grad_parts, axis=0), axes)
        return loss, g

    # check_vma=False: pallas_call's internal lowering/interpreter mixes
    # its own replicated constants with the varying tile0 operand and
    # trips the replication checker INSIDE pallas machinery (jax raises
    # "Primitive ... requires varying manual axes to match ... as a
    # temporary workaround pass check_vma=False"); pvary on our operands
    # cannot reach those internals. Pinned against jax 0.9.0:
    # tools/repro_check_vma.py + tests/test_sharding.py::
    # test_check_vma_workaround_still_needed (strict xfail — a fixing
    # jax upgrade turns the suite red so this gets deleted, not
    # fossilized). Semantics are covered by
    # tests/test_gradkernel.py::test_sharded_loss_and_grad_matches_
    # single_device (sharded == single-device bitwise up to reduction
    # order, two mesh shapes).
    loss, g_packed = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axes)),  # target tiles sharded over all axes
        out_specs=(P(), P()),
        check_vma=False,
    )(packed, jnp.asarray(seed, jnp.uint32), t_tiles)

    n_frames = max(1, int(np.prod(jnp.shape(seed))))
    scale = np.float32(1.0 / (n_frames * total * 3))
    return loss * scale, _freeze_grads(rebuild(g_packed * scale), cfg)


# --- Fused soft-silhouette value-and-grad kernel ------------------------------
#
# One dispatch per soft training step (VERDICT r4 #5 follow-through).
# The two-dispatch pair form (render_light_pallas_multi forward +
# render_light_vjp_pallas_multi backward) costs a full forward pair PLUS
# a full re-traced VJP pair — measured 22.3 ms/step on room 1280x720x8
# (tools/soft_ablate.py: 11.1 ms render pair + 11.2 ms VJP pair, glue
# fully overlapped). This kernel computes the ENTIRE soft loss and all
# its gradients the way the hard path's _loss_grad_kernel does — one
# jax.vjp per tile whose linearization forward IS the only forward — so
# the step pays ~1.2x ONE two-row render instead of ~2x.
#
# Key trick: the "without" scene never exists as a second packed operand.
# `zero_object(scene, ref)` only rewrites radius leaves to literal
# constants (0.0 circle family / -1.0 hypercube, diff.zero_object), so
# the kernel re-reads the SAME packed params with those slots statically
# replaced by their miss constants (`soft_zero_map`) — gradients of the
# without-render w.r.t. the zeroed radii are exactly zero by
# construction, matching the pair path's semantics, and both rows share
# one rebuild closure and one set of frozen hints.
#
# The soft blend (shader-style tone map per row, alpha-weighted mix,
# masked MSE — diff.soft_image_loss's estimator at the same seed) runs
# in-kernel; the per-pixel coverage alpha arrives as an input tile and
# its cotangent leaves as an output tile, so the cheap differentiable
# coverage stays ordinary jnp AD outside (diff._soft_kernel_loss wires
# the custom_vjp).
#
# Tile sweep (room 1280x720x8x4, same-process back-to-back, v5e): 16 ->
# 0.463, 32 -> 0.460, 64 -> 0.473-0.478, 128 -> 0.462 Gray/s. Unlike
# the hard-path kernel (32 optimal, 64 = -14%), the two-row soft kernel
# prefers 64 sublanes by ~3% — more rows per program amortize the
# doubled per-tile setup. The margin is inside cross-phase noise, so
# the default stays the shared cfg.tile_sublanes; pass 64 explicitly
# for long soft optimizations.


def soft_zero_map(scene: Scene, camera: Camera, object_ref):
    """Static (packed_index, miss_value) pairs: applying them to the
    packed (scene, camera) vector yields exactly
    `_pack_pytree((zero_object(scene, ref), camera))`.

    Computed on an all-ones concrete TEMPLATE with the same treedef, so
    it works under jit tracing (indices/values are Python constants) and
    is immune to packing-order details: every slot the zeroing rewrites
    differs from 1.0 on the template (0.0 or -1.0), every other slot is
    untouched."""
    from fourd_ray_tracing_tpu.diff import zero_object

    leaves, treedef = jax.tree_util.tree_flatten((scene, camera))
    ones = [np.ones(np.shape(l) or (), np.float32) for l in leaves]
    t_scene, t_cam = jax.tree_util.tree_unflatten(treedef, ones)
    # The template is concrete, but under an enclosing jit omnistaging
    # would still stage these jnp ops into the trace; force compile-time
    # evaluation so the map is Python constants either way.
    with jax.ensure_compile_time_eval():
        tz_scene = zero_object(t_scene, object_ref)
        p_base = np.asarray(_pack_pytree((t_scene, t_cam))[0])
        p_zero = np.asarray(_pack_pytree((tz_scene, t_cam))[0])
    idx = np.nonzero(p_base != p_zero)[0]
    if idx.size == 0:
        raise ValueError(
            f"object_ref {object_ref!r} produced no zeroable radius slots"
        )
    return tuple((int(i), float(p_zero[i])) for i in idx)


def _soft_loss_grad_kernel(
    params_ref, seed_ref, tile0_ref, target_ref, alpha_ref,
    loss_ref, grad_ref, acot_ref, *,
    rebuild, n_params: int, cfg: RenderConfig,
    n_views: int, height: int, width: int, zero_map,
    vector_store: bool = False,
):
    """One tile of the fused soft-silhouette loss+grad. Identical
    skeleton to _loss_grad_kernel; differences: (a) the sample chunk
    traces BOTH rows (scene and its statically-zeroed copy) so one
    jax.vjp covers the pair, (b) the tile loss blends the two rows'
    tone-mapped colors with the alpha input tile before the masked MSE,
    (c) the alpha cotangent is a third output (VMEM tile)."""
    seed = seed_ref[0].astype(jnp.uint32)
    pid = pl.program_id(0) + tile0_ref[0]
    scr_x, scr_y, view, valid = _tile_pixels(cfg, n_views, height, width, pid)
    tile_zero = jnp.zeros(scr_x.shape, jnp.float32)
    pixel_bits = rng.pixel_stream_bits(scr_x, scr_y)
    counter0 = rng.init_counter(seed, pixel_bits.shape)
    vals = tuple(params_ref[k] for k in range(n_params))
    inv_s = np.float32(1.0 / cfg.samples)

    def primary(vals):
        scene, camera = rebuild(vals)
        top, right, vec_to_mtr, focus = _tile_camera(
            camera, view, n_views, tile_zero
        )
        mx = (scr_x - 0.5) * camera.mtr_width
        my = (0.5 - scr_y) * camera.mtr_height
        d = normalize(vec_to_mtr + top * my + right * mx)
        return scene, focus, d

    def sample_light(scene, o, d, pre0, s):
        bits = sample_stream_bits(pixel_bits, s.astype(jnp.uint32))
        light, _ = _trace_rays_kernel(
            scene, o, d, bits, seed, counter0, cfg, pre0=pre0, unroll=True
        )
        return light

    t = Vec3(target_ref[0, 0], target_ref[0, 1], target_ref[0, 2])
    alpha_in = alpha_ref[0]
    vmask = jnp.where(valid, 1.0, 0.0)

    def tile_loss(acc6, alpha):
        lw = Vec3(acc6[0], acc6[1], acc6[2]) * inv_s
        lo = Vec3(acc6[3], acc6[4], acc6[5]) * inv_s
        cw = light_to_color(lw, jnp.float32(cfg.light_coefficient))
        co = light_to_color(lo, jnp.float32(cfg.light_coefficient))
        loss = jnp.float32(0.0)
        for w_ch, o_ch, t_ch in zip(
            (cw.x, cw.y, cw.z), (co.x, co.y, co.z), (t.x, t.y, t.z)
        ):
            img = alpha * w_ch + (1.0 - alpha) * o_ch
            loss = loss + jnp.sum(vmask * (img - t_ch) ** 2)
        return loss

    G = max(1, int(cfg.grad_sample_chunk))

    def chunk_fn(s):
        def f(*vals):
            scene, o, d = primary(vals)
            vals_b = list(vals)
            for i, v in zero_map:
                vals_b[i] = jnp.float32(v)
            scene_b, _cam_b = rebuild(tuple(vals_b))
            pre0 = precompute_bounce0(scene, o, d, cfg)
            pre0_b = precompute_bounce0(scene_b, o, d, cfg)
            acc = Vec3.full(0.0, like=tile_zero)
            acc_b = Vec3.full(0.0, like=tile_zero)
            for gi in range(G):
                acc = acc + sample_light(scene, o, d, pre0, s + gi)
                acc_b = acc_b + sample_light(scene_b, o, d, pre0_b, s + gi)
            return acc.x, acc.y, acc.z, acc_b.x, acc_b.y, acc_b.z

        return f

    lpid = pl.program_id(0)
    zero_g = tuple(jnp.float32(0.0) for _ in range(n_params))
    if G == cfg.samples:
        # Fused single-sweep: ONE vjp's linearization forward is the only
        # forward; cotangents (rows AND alpha) derive from the in-kernel
        # blend loss, transpose goes straight to the P param cotangents.
        acc6, vjp_fn = jax.vjp(chunk_fn(jnp.int32(0)), *vals)
        loss_val, tl_vjp = jax.vjp(tile_loss, acc6, alpha_in)
        cot6, cot_alpha = tl_vjp(jnp.float32(1.0))
        loss_ref[lpid, 0] = loss_val
        g = vjp_fn(cot6)
    else:
        # Two-pass fallback (grad_sample_chunk < samples): forward both
        # rows for the loss + alpha cotangent, then chunked reverse.
        scene_f, o_f, d_f = primary(vals)
        vals_b = list(vals)
        for i, v in zero_map:
            vals_b[i] = jnp.float32(v)
        scene_bf, _ = rebuild(tuple(vals_b))
        pre0_f = precompute_bounce0(scene_f, o_f, d_f, cfg)
        pre0_bf = precompute_bounce0(scene_bf, o_f, d_f, cfg)

        def body(s, accs):
            aw, ab = accs
            aw = aw + sample_light(scene_f, o_f, d_f, pre0_f, s)
            ab = ab + sample_light(scene_bf, o_f, d_f, pre0_bf, s)
            return aw, ab

        aw, ab = jax.lax.fori_loop(
            0, cfg.samples, body,
            (Vec3.full(0.0, like=tile_zero), Vec3.full(0.0, like=tile_zero)),
        )
        acc6_f = (aw.x, aw.y, aw.z, ab.x, ab.y, ab.z)
        loss_val, tl_vjp = jax.vjp(tile_loss, acc6_f, alpha_in)
        cot6, cot_alpha = tl_vjp(jnp.float32(1.0))
        loss_ref[lpid, 0] = loss_val

        def grad_body(i, g):
            _, vjp_fn = jax.vjp(chunk_fn(i * G), *vals)
            gs = vjp_fn(cot6)
            return tuple(a + b for a, b in zip(g, gs))

        g = jax.lax.fori_loop(0, cfg.samples // G, grad_body, zero_g)
    acot_ref[0] = cot_alpha
    if vector_store:
        grad_ref[lpid, :] = jnp.stack(g)  # see _loss_grad_kernel note
    else:
        for k in range(n_params):
            grad_ref[lpid, k] = g[k]


def _alpha_tiles(alpha, total: int, n_tiles: int, sublanes: int):
    """Coverage plane -> (tiles, sublanes, 128); padded lanes zero."""
    tile = sublanes * LANES
    a = jnp.asarray(alpha, jnp.float32).reshape(total)
    a = jnp.pad(a, (0, n_tiles * tile - total))
    return a.reshape(n_tiles, sublanes, LANES)


def _soft_launch(packed, rebuild, seed, tile0, t_tiles, a_tiles, cfg,
                 n_views, height, width, zero_map, interpret, vma=None):
    """One fused soft loss+grad launch. Returns (loss_parts, grad_parts,
    alpha_cot_tiles) — loss/grads UNSCALED per-tile sums; alpha
    cotangents tile-shaped (the caller unpads and scales)."""
    n_params = int(packed.shape[0])
    n_tiles = int(t_tiles.shape[0])
    sublanes = cfg.tile_sublanes
    seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1)
    tile0_arr = jnp.asarray(tile0, jnp.int32).reshape(1)
    kernel = functools.partial(
        _soft_loss_grad_kernel, rebuild=rebuild, n_params=n_params, cfg=cfg,
        n_views=n_views, height=height, width=width, zero_map=zero_map,
        vector_store=bool(interpret),
    )

    def out_struct(shape):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, jnp.float32)
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 3, sublanes, LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sublanes, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, sublanes, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            out_struct((n_tiles, 1)),
            out_struct((n_tiles, n_params)),
            out_struct((n_tiles, sublanes, LANES)),
        ),
        interpret=interpret,
        compiler_params=_grad_compiler_params(interpret),
    )(packed, seed_arr, tile0_arr, t_tiles, a_tiles)


def render_soft_loss_and_grad_pallas(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target, alpha,
    object_ref, interpret: bool | None = None,
):
    """(loss, (grad_scene, grad_camera), grad_alpha) of the
    soft-silhouette MSE — BOTH rows, the blend, AND all gradients in ONE
    kernel dispatch. Semantically `jax.value_and_grad` of
    diff.soft_image_loss's estimator at fixed alpha (the alpha plane is
    an independent input here; its cotangent comes back so the caller
    backpropagates the coverage path in jnp). Same seed => same estimator
    as the two-dispatch pair form, up to float re-association.

    ``object_ref`` must be zero-emulatable (diff.zero_object): spheres,
    cylinders, cylinders_union, tiger, hypercube.
    """
    cfg = _auto_hints(scene, cfg)
    zero_map = soft_zero_map(scene, camera, object_ref)
    return _render_soft_loss_and_grad_jit(
        scene, camera, cfg, seed, target, alpha, zero_map, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "zero_map", "interpret")
)
def _render_soft_loss_and_grad_jit(
    scene, camera, cfg, seed, target, alpha, zero_map,
    interpret: bool | None = None,
):
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_tiles = pl.cdiv(total, tile)
    t_tiles = _target_tiles(target, total, n_tiles, cfg.tile_sublanes)
    a_shape = jnp.shape(alpha)
    a_tiles = _alpha_tiles(alpha, total, n_tiles, cfg.tile_sublanes)

    loss_parts, grad_parts, acot_tiles = _soft_launch(
        packed, rebuild, seed, 0, t_tiles, a_tiles, cfg, n_views, height,
        width, zero_map, interpret,
    )
    scale = np.float32(1.0 / (total * 3))
    loss = jnp.sum(loss_parts) * scale
    g_packed = jnp.sum(grad_parts, axis=0) * scale
    grads = _freeze_grads(rebuild(g_packed), cfg)
    g_alpha = (acot_tiles.reshape(-1)[:total] * scale).reshape(a_shape)
    return loss, grads, g_alpha


def sharded_soft_loss_and_grad_pallas(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target, alpha,
    object_ref, mesh, interpret: bool | None = None,
):
    """`render_soft_loss_and_grad_pallas` with the tile axis sharded over
    ``mesh`` — the multi-chip soft training path in ONE dispatch per
    device. Loss/gradients psum over ICI (equal to single-device up to
    reduction order); each device keeps its own alpha-cotangent block and
    the gather back to the full plane is the shard_map output."""
    cfg = _auto_hints(scene, cfg)
    _check_cfg(cfg)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    zero_map = soft_zero_map(scene, camera, object_ref)
    top_x = jnp.asarray(camera.top.x)
    n_views = int(top_x.shape[0]) if top_x.ndim > 0 else 1
    height, width = cfg.height, cfg.width

    packed, rebuild = _pack_pytree((scene, camera))
    tile = cfg.tile_sublanes * LANES
    total = n_views * height * width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_tiles = pl.cdiv(total, tile)
    n_tiles = pl.cdiv(n_tiles, n_dev) * n_dev
    tiles_local = n_tiles // n_dev
    t_tiles = _target_tiles(target, total, n_tiles, cfg.tile_sublanes)
    a_shape = jnp.shape(alpha)
    a_tiles = _alpha_tiles(alpha, total, n_tiles, cfg.tile_sublanes)

    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local(packed, seed, t_tiles_local, a_tiles_local):
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        loss_parts, grad_parts, acot_local = _soft_launch(
            packed, rebuild, seed, idx * tiles_local, t_tiles_local,
            a_tiles_local, cfg, n_views, height, width, zero_map,
            interpret, vma=axes,
        )
        loss = jax.lax.psum(jnp.sum(loss_parts), axes)
        g = jax.lax.psum(jnp.sum(grad_parts, axis=0), axes)
        return loss, g, acot_local

    # check_vma=False: same pinned pallas-internals workaround as
    # sharded_loss_and_grad_pallas (tools/repro_check_vma.py).
    loss, g_packed, acot_tiles = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes)),
        out_specs=(P(), P(), P(axes)),
        check_vma=False,
    )(packed, jnp.asarray(seed, jnp.uint32), t_tiles, a_tiles)

    scale = np.float32(1.0 / (total * 3))
    grads = _freeze_grads(rebuild(g_packed * scale), cfg)
    g_alpha = (acot_tiles.reshape(-1)[:total] * scale).reshape(a_shape)
    return loss * scale, grads, g_alpha

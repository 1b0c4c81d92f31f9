"""Differentiable rendering: losses, gradients, inverse-rendering steps.

The reference has no gradient path; BASELINE.json's north star adds one:
the forward renderer differentiates w.r.t. every scene parameter
(positions, radii, colors, glow, mirror probabilities) via
reparameterized Monte Carlo gradients.

Estimator decisions (documented per SURVEY §7 "hard parts"):

* **Fixed-outcome reparameterization.** All randomness is counter-based
  and parameter-independent, so for a fixed seed the sampled uniforms are
  constants; gradients flow through the *continuous* geometry (hit
  distances, normals, shading) while discrete decisions (hit/miss,
  mirror/diffuse) are frozen at their sampled outcomes. This is exactly
  "differentiate the estimator at fixed RNG", matching what the oracle
  computes with finite differences at the same seed.
* Consequences: d/d(refl_prob) of the branch *choice* is zero a.e. (the
  glow/albedo terms still carry refl_prob-independent gradients), and
  visibility edges contribute no boundary terms under the plain
  estimator. Geometry parameters whose only effect is a silhouette
  (e.g. a flat emissive sphere's position) therefore get ZERO gradient
  from `image_loss` — that is the correct derivative of the fixed-seed
  estimator, not a bug (tests/test_grad.py:
  test_geometry_grads_are_boundary_blind).
* **Soft-silhouette boundary gradients** (`soft_image_loss`): to move
  geometry through its silhouette, the loss renders the scene twice —
  with and without one designated sphere — and alpha-blends the two
  images with a differentiable primary-ray coverage
  alpha = sigmoid((r - d_perp)/edge_width), where d_perp is the
  perpendicular distance from the sphere center to each pixel's primary
  ray. The blend equals the hard render away from the edge band and
  gives the classic soft-rasterizer position/radius gradients inside it.
  Secondary effects (shadows, reflections of the sphere) stay hard —
  acceptable for silhouette-driven optimization and documented.
* Memory: each sample's trace is wrapped in `jax.checkpoint`
  (models/renderer.py:render_light_tile, cfg.remat=True) so the backward
  pass recomputes trajectories instead of storing every bounce's ray
  state — the HBM-friendly choice on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from fourd_ray_tracing_tpu.camera import Camera
from fourd_ray_tracing_tpu.models.renderer import (
    RenderConfig,
    primary_directions,
    render_image,
    screen_coords,
    _expand_cam_vec,
)
from fourd_ray_tracing_tpu.models.scene import Scene
from fourd_ray_tracing_tpu.ops.vec4 import Vec4, dot
from fourd_ray_tracing_tpu.parallel.mesh import sharded_render_image


def image_loss(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    seed,
    target: jnp.ndarray,
    mesh=None,
) -> jnp.ndarray:
    """MSE between the rendered (tone-mapped) image and a target."""
    if mesh is None:
        img = render_image(scene, camera, cfg, seed)
    else:
        img = sharded_render_image(scene, camera, cfg, seed, mesh)
    return jnp.mean((img - target) ** 2)


def render_grad(
    scene: Scene, camera: Camera, cfg: RenderConfig, seed, target, mesh=None
):
    """(loss, dLoss/dScene) at a fixed RNG seed."""
    return jax.value_and_grad(image_loss)(scene, camera, cfg, seed, target, mesh)


# --- Soft-silhouette boundary gradients --------------------------------------

def primary_coverage(
    center: Vec4, r, camera: Camera, cfg: RenderConfig, edge_width: float
) -> jnp.ndarray:
    """Differentiable per-pixel coverage of a sphere by the PRIMARY rays.

    alpha = sigmoid((r - d_perp) / edge_width) where d_perp is the
    perpendicular distance from the sphere center to the pixel's primary
    ray line (shader.frag:501-505 ray_drct); rays receding from the
    sphere (b < 0, origin outside) get alpha -> 0 through the same
    sigmoid on the approach margin. Shape (H, W) (or (V, H, W) for a
    view-batched camera), values in (0, 1).
    """
    scr_x, scr_y = screen_coords(cfg)
    d = primary_directions(camera, scr_x, scr_y)
    o = _expand_cam_vec(camera.focus, d.x.ndim)
    po = center - Vec4(*(jnp.broadcast_to(c, d.x.shape) for c in o))
    b = dot(po, d)
    l2 = dot(po, po)
    perp2 = jnp.maximum(l2 - b * b, 0.0)
    perp = jnp.sqrt(perp2 + 1e-20)
    inv_w = 1.0 / jnp.asarray(edge_width, jnp.float32)
    alpha = jax.nn.sigmoid((r - perp) * inv_w)
    # Receding rays can't see the sphere: gate on the approach margin so
    # the gate itself is differentiable and saturates away from the edge.
    approaching = jax.nn.sigmoid((b + r) * inv_w)
    inside = l2 < r * r  # camera inside the sphere: fully covered
    return jnp.where(inside, jnp.ones_like(alpha), alpha * approaching)


def drop_sphere(scene: Scene, sphere_index: int) -> Scene:
    """The scene without sphere ``sphere_index`` (static restructure)."""
    spheres = tuple(
        s for k, s in enumerate(scene.spheres) if k != sphere_index
    )
    return scene._replace(spheres=spheres)


def soft_image_loss(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    seed,
    target: jnp.ndarray,
    sphere_index: int = 0,
    edge_width: float = 0.05,
    mesh=None,
) -> jnp.ndarray:
    """MSE with soft-silhouette gradients for one designated sphere.

    Renders (scene) and (scene minus sphere_index) at the same seed and
    blends them with `primary_coverage`; the gradient w.r.t. the sphere's
    center/radius then carries the boundary term the plain estimator
    drops. ~2x forward cost; training-only (the forward image differs
    from the hard render only inside the edge band).
    """
    sp = scene.spheres[sphere_index]
    without = drop_sphere(scene, sphere_index)
    if mesh is None:
        img_with = render_image(scene, camera, cfg, seed)
        img_without = render_image(without, camera, cfg, seed)
    else:
        img_with = sharded_render_image(scene, camera, cfg, seed, mesh)
        img_without = sharded_render_image(without, camera, cfg, seed, mesh)
    alpha = primary_coverage(sp.center, sp.r, camera, cfg, edge_width)[..., None]
    img = alpha * img_with + (1.0 - alpha) * img_without
    return jnp.mean((img - target) ** 2)


def make_train_step(
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    camera: Camera,
    mesh=None,
    param_filter: Optional[Callable] = None,
    soft_sphere_index: Optional[int] = None,
    edge_width: float = 0.05,
):
    """Jitted inverse-rendering step: optimize scene params toward target
    images (SURVEY §7 step 5; BASELINE.json config 5).

    ``param_filter(grads)`` may zero out gradients of parameters that
    should stay frozen (e.g. wall positions while fitting a sphere).
    ``soft_sphere_index`` switches the loss to `soft_image_loss` for that
    sphere, enabling silhouette (position/radius) gradients.
    When a mesh is given, rays/samples shard across it and the scene
    gradient arrives via the AD transpose of the replicated inputs — an
    all-reduce over ICI fused into the backward pass.

    Returns a step whose metrics dict carries loss and the global
    gradient norm (SURVEY §5 metrics/logging).
    """

    def loss_fn(scene, seed, target):
        if soft_sphere_index is None:
            return image_loss(scene, camera, cfg, seed, target, mesh)
        return soft_image_loss(
            scene, camera, cfg, seed, target, soft_sphere_index, edge_width, mesh
        )

    @jax.jit
    def step(scene, opt_state, seed, target):
        loss, grads = jax.value_and_grad(loss_fn)(scene, seed, target)
        if param_filter is not None:
            grads = param_filter(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss, {"loss": loss, "grad_norm": grad_norm}

    return step


def finite_difference_grad(
    f: Callable[[jnp.ndarray], jnp.ndarray], x0: jnp.ndarray, eps: float = 1e-3
) -> jnp.ndarray:
    """Central finite differences for gradient tests (SURVEY §4.4)."""
    x0 = jnp.asarray(x0, jnp.float32)
    flat = x0.reshape(-1)
    grads = []
    for i in range(flat.size):
        dx = jnp.zeros_like(flat).at[i].set(eps)
        fp = f((flat + dx).reshape(x0.shape))
        fm = f((flat - dx).reshape(x0.shape))
        grads.append((fp - fm) / (2 * eps))
    return jnp.stack(grads).reshape(x0.shape)

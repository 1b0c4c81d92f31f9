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
  visibility edges contribute no boundary terms — acceptable per the
  north star ("grad allclose vs the same estimator in the oracle").
* `jax.checkpoint` wraps each bounce-loop sample so the backward pass
  recomputes trajectories instead of storing every bounce's ray state —
  the HBM-friendly choice on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from fourd_ray_tracing_tpu.camera import Camera
from fourd_ray_tracing_tpu.models.renderer import RenderConfig, render_image
from fourd_ray_tracing_tpu.models.scene import Scene
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


def make_train_step(
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    camera: Camera,
    mesh=None,
    param_filter: Optional[Callable] = None,
):
    """Jitted inverse-rendering step: optimize scene params toward target
    images (SURVEY §7 step 5; BASELINE.json config 5).

    ``param_filter(grads)`` may zero out gradients of parameters that
    should stay frozen (e.g. wall positions while fitting a sphere).
    When a mesh is given, rays/samples shard across it and the scene
    gradient arrives via the AD transpose of the replicated inputs — an
    all-reduce over ICI fused into the backward pass.
    """

    def loss_fn(scene, seed, target):
        return image_loss(scene, camera, cfg, seed, target, mesh)

    @jax.jit
    def step(scene, opt_state, seed, target):
        loss, grads = jax.value_and_grad(loss_fn)(scene, seed, target)
        if param_filter is not None:
            grads = param_filter(grads)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

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

"""Gradient optimization of scene parameters from pixels, with
checkpoint/resume (BASELINE.json config 5).

The reference has no training loop (SURVEY.md 5.4); differentiability
is the new capability this framework adds.  The loop: render the scene
with the current parameter pytree, L2 against a target image, adam on
`jax.grad` through the whole tracer (BVH/CSG winners re-evaluated
differentiably), gradients psum-reduced over the device mesh when one
is provided.  Orbax checkpoints the parameter pytree + step so runs
resume after interruption.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .trace import Tracer


@dataclasses.dataclass
class OptimizeResult:
    arrays: dict
    losses: list
    steps_run: int


def pixel_loss_fn(tracer: Tracer):
    def loss(arrays, o, d, target_rgb):
        res = tracer.trace(arrays, o, d)
        rgb = res.color[..., :3] * res.color[..., 3:4]
        return jnp.mean((rgb - target_rgb) ** 2)
    return loss


def optimize(tracer: Tracer, arrays, o, d, target_rgb, *,
             steps: int = 100, lr: float = 1e-2,
             checkpoint_dir: Optional[str] = None,
             checkpoint_every: int = 25,
             on_step: Optional[Callable] = None,
             loss_fn: Optional[Callable] = None,
             grad_filter: Optional[Callable] = None) -> OptimizeResult:
    """Adam-optimize every float leaf of `arrays` to match target_rgb.

    grad_filter: optional grads-pytree -> grads-pytree transform
    (e.g. zero every leaf except one group's to optimize a single
    object's pose while the rest of the scene stays frozen).

    checkpoint_dir: if set, orbax-checkpoints {params, opt_state, step}
    every `checkpoint_every` steps and resumes from the latest one.
    For multi-chip runs use parallel.mesh.sharded_train_step_fn (rays
    sharded over the mesh, grads psum'd) with this module's checkpoint
    pattern.
    """
    if loss_fn is None:
        loss_fn = pixel_loss_fn(tracer)
    opt = optax.adam(lr)

    @jax.jit
    def step_fn(params, opt_state, o, d, target_rgb):
        loss, grads = jax.value_and_grad(loss_fn)(params, o, d, target_rgb)
        # soft-edge losses can emit isolated non-finite gradient lanes
        # at exactly-grazing configurations; zero them instead of
        # poisoning the whole parameter pytree (standard practice for
        # differentiable rendering loops)
        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
            if jnp.issubdtype(jnp.asarray(g).dtype, jnp.floating) else g,
            grads)
        if grad_filter is not None:
            grads = grad_filter(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params, updates)
        return params, opt_state, loss

    params = arrays
    opt_state = opt.init(jax.tree.map(
        lambda p: p if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
        else jnp.zeros(()), params))
    start = 0

    mngr = None
    if checkpoint_dir is not None:
        import orbax.checkpoint as ocp
        mngr = ocp.CheckpointManager(
            checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=2))
        latest = mngr.latest_step()
        if latest is not None:
            template = {"params": params, "opt_state": opt_state}
            restored = mngr.restore(
                latest, args=ocp.args.StandardRestore(template))
            params = restored["params"]
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state),
                jax.tree.leaves(restored["opt_state"]))
            start = int(latest)

    losses = []
    for i in range(start, steps):
        params, opt_state, loss = step_fn(params, opt_state, o, d,
                                          target_rgb)
        losses.append(float(loss))
        if on_step is not None:
            on_step(i, float(loss))
        if mngr is not None and ((i + 1) % checkpoint_every == 0
                                 or i + 1 == steps):
            import orbax.checkpoint as ocp
            mngr.save(i + 1, args=ocp.args.StandardSave(
                {"params": params, "opt_state": opt_state}))
    if mngr is not None:
        mngr.wait_until_finished()
    return OptimizeResult(arrays=params, losses=losses,
                          steps_run=steps - start)

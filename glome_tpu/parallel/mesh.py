"""Multi-chip execution: device meshes, ray sharding, gradient psum.

The reference parallelizes with a shared-memory work-stealing scheduler
over 65x65 image tiles (Glome.hs:379-386, monad-par).  The TPU-native
equivalent (SURVEY.md sections 2.1, 5.8): shard the ray/pixel batch
across a device mesh with shard_map; the scene/material parameter
pytree is replicated; the backward pass of the differentiable renderer
produces per-shard parameter gradients which are all-reduced with psum
over the mesh (overlapped with the remaining backward work by XLA's
scheduler).  Rays are embarrassingly parallel, so scaling is limited
only by the final gradient all-reduce -- the >=85% scaling-efficiency
target's collective cost rides ICI.

Mesh axes: 'dp' (data/ray parallel) x 'sp' (intra-batch split, e.g.
rows of a tile); both shard the ray axis, giving a 2D layout that maps
onto the physical ICI torus.  Scene parameters are replicated on both.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map

from ..trace import Tracer


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map with check_vma off when supported: the megakernel's
    pallas_call (interpret mode on the CPU mesh) has no varying-mesh-
    axes annotation, which newer JAX rejects under the default
    check_vma=True."""
    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older JAX without check_vma
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization (jax.distributed).  No-op when running
    single-process (the common single-host case)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None):
    """A 2D ('dp', 'sp') mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 1
        for f in range(int(math.isqrt(n)), 0, -1):
            if n % f == 0:
                dp = f
                break
    sp = n // dp
    arr = np.asarray(devs).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_rays(n_rays: int, mesh: Mesh) -> int:
    """Pad count so the ray axis divides the mesh size."""
    total = mesh.devices.size
    return ((n_rays + total - 1) // total) * total


def _shard_tracer(tracer: Tracer, mesh: Mesh) -> Tracer:
    """Per-shard tracer with the wavefront queue floor scaled to the
    shard: min_tiles guards losslessness of SMALL renders, but inside
    shard_map each device sees 1/N of the batch, so the global floor
    padded every shard's queues to N x the intended minimum -- measured
    as a large part of the virtual-mesh scaling-efficiency loss
    (SCALING.json, VERDICT r3 #4)."""
    import dataclasses
    total = int(mesh.devices.size)
    cfg = tracer.config
    floor = max(1, -(-cfg.min_tiles // total))
    if floor == cfg.min_tiles:
        return tracer
    return type(tracer)(tracer.compiled,
                        dataclasses.replace(cfg, min_tiles=floor))


def sharded_render_fn(tracer: Tracer, mesh: Mesh):
    """A pjit-ed render over rays sharded on ('dp','sp'); scene arrays
    replicated.  Returns fn(arrays, o, d) -> (rgb, t)."""
    ray_spec = P(("dp", "sp"))
    tracer = _shard_tracer(tracer, mesh)

    def render_shard(arrays, o, d):
        res = tracer.trace(arrays, o, d)
        rgb = res.color[..., :3] * res.color[..., 3:4]
        return rgb, res.t

    fn = _shard_map(render_shard, mesh,
                    in_specs=(P(), ray_spec, ray_spec),
                    out_specs=(ray_spec, ray_spec))
    return jax.jit(fn)


def sharded_train_step_fn(tracer: Tracer, mesh: Mesh, lr: float = 1e-2):
    """One optimization step of the differentiable renderer: per-shard
    pixel L2 loss against a target image shard, parameter grads psum'd
    over the whole mesh, SGD update (replicated).

    This is the TPU analog of the reference's whole-frame render loop,
    plus the gradient path the reference doesn't have (BASELINE.json
    config 5)."""
    ray_spec = P(("dp", "sp"))
    tracer = _shard_tracer(tracer, mesh)

    def loss_shard(arrays, o, d, target_rgb):
        res = tracer.trace(arrays, o, d)
        rgb = res.color[..., :3] * res.color[..., 3:4]
        # mean over the *global* batch: sum locally, divide by global N
        n_global = o.shape[0] * mesh.devices.size
        err = jnp.sum((rgb - target_rgb) ** 2) / n_global
        return err

    def step_shard(arrays, o, d, target_rgb):
        loss, grads = jax.value_and_grad(loss_shard)(arrays, o, d, target_rgb)
        loss = jax.lax.psum(loss, axis_name=("dp", "sp"))
        grads = jax.lax.psum(grads, axis_name=("dp", "sp"))
        new_arrays = jax.tree.map(
            lambda p, g: (p - lr * g).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            arrays, grads)
        return new_arrays, loss

    fn = _shard_map(step_shard, mesh,
                    in_specs=(P(), ray_spec, ray_spec, ray_spec),
                    out_specs=(P(), P()))
    return jax.jit(fn)

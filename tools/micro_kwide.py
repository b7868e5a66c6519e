"""Validate the K-wide frontier hypothesis: K batched slab tests +
K reductions cost ~one drain, not K drains.

Mock traversal over an implicit-heap tree of M nodes in SMEM: each
iteration pops up to K nodes from an SMEM stack, slab-tests each
(vector), reads the K any-sums (the drain under test), and pushes hit
children.  Compares per-node cost at K=1,2,4,8,16 on the real chip.

Also measures scalar reads from a VMEM scratch (the packed-bitmask
readout path) per read.

Usage: python tools/micro_kwide.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from tools.tpu_time import device_time

T = 256
DEPTH = 10
M = 2 ** DEPTH - 1      # implicit heap

rng = np.random.default_rng(0)
rays = rng.normal(size=(8, T, 8, 128)).astype(np.float32)
rays[6] = 1e6

# node boxes: root huge, shrinking with depth so ~2 children hit/node
nf = np.zeros((M, 6), np.float32)
for i in range(M):
    lvl = int(np.floor(np.log2(i + 1)))
    c = rng.normal(size=3) * 0.5
    half = 2.5 * (0.55 ** lvl)
    nf[i, :3] = c - half
    nf[i, 3:] = c + half
nf = nf.reshape(-1)

rays_d = jax.device_put(jnp.asarray(rays))
nf_d = jax.device_put(jnp.asarray(nf))


def mk_walk(K):
    def kernel(rays_ref, nf_ref, out, stack_ref):
        rc = lambda c: rays_ref[c, 0]
        ox, oy, oz = rc(0), rc(1), rc(2)
        dx, dy, dz = rc(3), rc(4), rc(5)
        ivx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)

        def slab(node):
            nb = node * 6
            t1x = (nf_ref[nb + 0] - ox) * ivx
            t2x = (nf_ref[nb + 3] - ox) * ivx
            t1y = (nf_ref[nb + 1] - oy) * ivy
            t2y = (nf_ref[nb + 4] - oy) * ivy
            t1z = (nf_ref[nb + 2] - oz) * ivz
            t2z = (nf_ref[nb + 5] - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                          jnp.maximum(t1y, t2y)),
                              jnp.maximum(t1z, t2z))
            return (near <= far) & (far > 0.0)

        stack_ref[0] = 0

        def step(st):
            sp, nvis = st
            kk = jnp.minimum(sp, K)
            nodes = []
            sums = []
            for k in range(K):
                nd = stack_ref[jnp.maximum(sp - 1 - k, 0)]
                hit = slab(nd) & (k < kk)
                nodes.append(nd)
                sums.append(jnp.sum(hit.astype(jnp.float32)))
            sp = sp - kk
            for k in range(K):
                nd = nodes[k]
                is_inner = 2 * nd + 2 < M
                push = (sums[k] > 0.0) & (k < kk) & is_inner

                @pl.when(push)
                def _(nd=nd):
                    pass
                # do pushes via arithmetic to avoid @pl.when closure
                # issues: conditional stack writes
                sp0 = sp

                @pl.when(push)
                def _(nd=nd, sp0=sp0):
                    stack_ref[sp0] = 2 * nd + 1
                    stack_ref[sp0 + 1] = 2 * nd + 2
                sp = jnp.where(push, sp + 2, sp)
            return sp, nvis + kk

        _, nvis = jax.lax.while_loop(lambda st: st[0] > 0, step,
                                     (jnp.int32(1), jnp.int32(0)))
        out[0] = jnp.full((8, 128), nvis.astype(jnp.float32))

    def run(rays):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1024,), jnp.int32)],
        )(rays, nf_d)
    return run


# visited-node count (host replay not needed: kernel returns it)
for K in (1, 2, 4, 8, 16):
    fn = mk_walk(K)
    def step(p, fn=fn):
        return jnp.mean(fn(rays_d + p * 1e-6))
    try:
        sec = device_time(step, verbose=None)
        nvis = float(jax.device_get(fn(rays_d))[0, 0, 0])
        print(f"K={K:2d}  {sec*1e3:8.3f} ms  visited/tile={nvis:6.0f}  "
              f"{sec*1e9/T/max(nvis,1):7.1f} ns/node")
    except Exception as e:
        print(f"K={K:2d} FAILED: {type(e).__name__}: {str(e)[:200]}")


# --- scalar reads from VMEM scratch ----------------------------------------
def mk_vread(NREAD):
    def kernel(rays_ref, out, vs_ref):
        rc = lambda c: rays_ref[c, 0]
        ox = rc(0)
        vs_ref[:] = ox
        acc = jnp.float32(0.0)
        for i in range(NREAD):
            acc = acc + vs_ref[i % 8, (i * 13) % 128]
        out[0] = jnp.full((8, 128), acc)

    def run(rays):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(rays)
    return run


for NREAD in (16, 64):
    fn = mk_vread(NREAD)
    def step(p, fn=fn):
        return jnp.mean(fn(rays_d + p * 1e-6))
    try:
        sec = device_time(step, verbose=None)
        print(f"vmem scalar reads n={NREAD:3d}  {sec*1e3:8.3f} ms  "
              f"{sec*1e9/T/NREAD:7.1f} ns/read")
    except Exception as e:
        print(f"vread {NREAD} FAILED: {type(e).__name__}: {str(e)[:200]}")

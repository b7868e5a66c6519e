"""Measure the block-kernel rework on realistic L0 shadow + primary
rays: full mega_shadow/mega_intersect (mega + block passes chained) vs
the round-2 numbers in tools/PERF_BUDGET.md.

Usage: python tools/profile_blocks.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, DELTA, INFINITY
from glome_tpu.render import Renderer, tile_order
from glome_tpu import megakernel as MK
from glome_tpu.trace import _light_arrays
from glome_tpu.vec import vdot, vscaleadd

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
arrays = jax.device_put(compiled.arrays())
cfg = RenderConfig.tuned(xres=720, yres=480)
tracer = G.WavefrontTracer(compiled, cfg)
renderer = Renderer(tracer, cam, cfg)
ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
perm = tile_order(cfg.xres, cfg.yres)
o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                ys.reshape(-1)[perm].astype(np.float32))
o = jax.device_put(o)
d = jax.device_put(d)
N = o.shape[0]

plan = MK.get_plan(compiled)
print(f"# blocks: {plan.blocks}; phases left: "
      f"{[(p.kind, p.ptype, p.P) for p in plan.phases]}", flush=True)


@jax.jit
def shadow_batch(o, d):
    hit = MK.mega_intersect(compiled, arrays, o, d,
                            sid=jnp.zeros((N,), jnp.int32))
    lpos, lcol, lrad = _light_arrays(compiled, arrays, compiled.lights)
    sh_o = vscaleadd(hit.pos, hit.norm, DELTA)
    so, sd, st = [], [], []
    for li in range(len(compiled.lights)):
        lvec = lpos[li] - hit.pos
        llen = jnp.sqrt(vdot(lvec, lvec))
        ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
        active = hit.hit & (vdot(lvec, hit.norm) >= 0.0) & (llen <= lrad[li])
        so.append(sh_o)
        sd.append(ldir)
        st.append(jnp.where(active, llen - 2.0 * DELTA, 0.0))
    return (jnp.concatenate(so), jnp.concatenate(sd), jnp.concatenate(st))


so, sd, st = jax.block_until_ready(shadow_batch(o, d))
ss0 = jnp.zeros((so.shape[0],), jnp.int32)
print(f"# shadow batch W={so.shape[0]}", flush=True)


def step_int(p):
    h = MK.mega_intersect(compiled, arrays, o + p * 1e-5, d,
                          sid=jnp.zeros((N,), jnp.int32))
    return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))


def step_sh(p):
    b = MK.mega_shadow(compiled, arrays, so + p * 1e-5, sd, sid=ss0,
                       tmax=st)
    return jnp.mean(b.astype(jnp.float32))


device_time(step_int, verbose=f"L0 intersect (mega+blocks) N={N}")
device_time(step_sh, verbose=f"L0 shadow (mega+blocks) W={so.shape[0]}")

"""Split mega_select cost by phase subset on REALISTIC L0 shadow rays
(origins at the frame's actual hit points, directions to each light),
unlike profile_frame's resized-primary-ray probes.

Usage: python tools/profile_phases.py
"""
import dataclasses
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
from glome_tpu.intersect import intersect_multi
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

# realistic L0 shadow batch (as _down_level builds it)
@jax.jit
def shadow_batch(o, d):
    hit = intersect_multi(compiled, arrays, o, d,
                          jnp.zeros((N,), jnp.int32))
    lpos, lcol, lrad = _light_arrays(compiled, arrays, compiled.lights)
    sh_o = vscaleadd(hit.pos, hit.norm, DELTA)
    so, sd, st = [], [], []
    for li, l in enumerate(compiled.lights):
        lvec = lpos[li] - hit.pos
        llen = jnp.sqrt(vdot(lvec, lvec))
        ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
        active = hit.hit & (vdot(lvec, hit.norm) >= 0.0) & (llen <= lrad[li])
        so.append(sh_o)
        sd.append(ldir)
        st.append(jnp.where(active, llen - 2.0 * DELTA, 0.0))
    return (jnp.concatenate(so), jnp.concatenate(sd), jnp.concatenate(st))

so, sd, st = jax.block_until_ready(shadow_batch(o, d))
ss = jnp.zeros((so.shape[0],), jnp.int32)
print(f"# shadow batch W={so.shape[0]}, active={float(jnp.mean(st>0)):.2f}",
      flush=True)

plan = MK.get_plan(compiled)
pf, bb = jax.block_until_ready(
    jax.jit(lambda a: MK.pack_tables(plan, compiled, a))(arrays))

subsets = {
    "all": lambda ph: True,
    "no_bvh": lambda ph: ph.kind not in ("bvh", "bvh2"),
    "bvh_only": lambda ph: ph.kind in ("bvh", "bvh2"),
    "bvh_spheres": lambda ph: ph.kind in ("bvh", "bvh2") and ph.ptype == "sphere",
    "bvh_cones": lambda ph: ph.kind in ("bvh", "bvh2") and ph.ptype == "cone",
    "deferred_only": lambda ph: ph.kind == "deferred",
    "dense_convex": lambda ph: ph.kind in ("dense", "convex"),
}

for name, keep in subsets.items():
    p2 = dataclasses.replace(plan, phases=[p for p in plan.phases
                                           if keep(p)])
    def step(p, p2=p2):
        t, w, _ = MK.mega_select(p2, pf, bb, so + p * 1e-5, sd,
                                 jnp.where(st > 0, st, 0.0), sid=ss,
                                 shadow=True)
        return jnp.mean(t)
    device_time(step, verbose=f"shadow {name}")

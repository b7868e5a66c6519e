"""Honest timing of the new per-tile Pallas BVH kernel on the lattice
groups + new full pipeline (dev tool)."""
import sys
import importlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, INFINITY
from glome_tpu.render import Renderer, tile_order

I = importlib.import_module("glome_tpu.intersect")

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
arrays = jax.device_put(compiled.arrays())
cfg = RenderConfig(xres=720, yres=480, secondary_capacity=0.5)
tracer = G.WavefrontTracer(compiled, cfg)
renderer = Renderer(tracer, cam, cfg)

ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
perm = tile_order(cfg.xres, cfg.yres)
o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                ys.reshape(-1)[perm].astype(np.float32))
o = jax.device_put(o); d = jax.device_put(d)
N = o.shape[0]
sc = compiled.scenes[0]
garrs = arrays["scenes"][0]

for gi, g in enumerate(sc.groups):
    if g.accel is None:
        continue
    def step(p, gi=gi):
        seed = jnp.full((N,), INFINITY, jnp.float32)
        bt, bl = I.bvh_dispatch(sc, garrs, gi, o + p * 1e-4, d, seed, False)
        return jnp.mean(jnp.where(bt >= INFINITY, 0.0, bt))
    device_time(step, verbose=f"g{gi} {g.ptype} size={g.size} pallas-bvh")

def trace_step(p):
    res = tracer.trace(arrays, o + p * 1e-4, d)
    return jnp.mean(res.color[:, :3])
device_time(trace_step, verbose="full trace swizzl")

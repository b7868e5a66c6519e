"""Honest piece-by-piece cost of the intersect pipeline (dev tool)."""
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

def seedfn():
    return jnp.full((N,), INFINITY, jnp.float32)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "deferred"):
    # deferred groups only: emulate the first loop of intersect()
    def step(p):
        oo = o + p * 1e-4
        h = I.intersect(compiled, arrays, 0, oo, d,
                        tmax=jnp.full((N,), 1e-6, jnp.float32))
        # with tmax~0 all non-deferred passes still run; cheap proxy no..
        return jnp.mean(h.t)
    # direct: time full intersect then subtract known parts instead
if which in ("all", "convex"):
    for cid, csg in enumerate(sc.csgs):
        if not csg.convex:
            continue
        nm = sum(len(idx) for cl in csg.clauses for _, idx in cl.members)
        def step(p, csg=csg):
            bt, ordn, ex = I.convex_pass(sc, garrs, csg, o + p * 1e-4, d,
                                         seedfn(), False)
            return jnp.mean(jnp.where(bt >= INFINITY, 0.0, bt))
        device_time(step, verbose=f"convex csg{cid} members={nm}")
if which in ("all", "dense"):
    for gi, g in enumerate(sc.groups):
        if g.accel is not None or g.vclass in ("deferred", "convex"):
            continue
        if g.size < 16:
            continue
        def step(p, gi=gi):
            bt, bl = I.dense_pass(sc, garrs, gi, o + p * 1e-4, d,
                                  seedfn(), False)
            return jnp.mean(jnp.where(bt >= INFINITY, 0.0, bt))
        device_time(step, verbose=f"g{gi} {g.ptype} size={g.size} dense")
if which in ("all", "intersect"):
    def step(p):
        h = I.intersect(compiled, arrays, 0, o + p * 1e-4, d)
        return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
    device_time(step, verbose="intersect scene0")
    def steps(p):
        h = I.intersect(compiled, arrays, 0, o + p * 1e-4, d, shadow=True)
        return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
    device_time(steps, verbose="shadow scene0")
    def step1(p):
        h = I.intersect(compiled, arrays, 1, o + p * 1e-4, d)
        return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
    device_time(step1, verbose="intersect scene1")

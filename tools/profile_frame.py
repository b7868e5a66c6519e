"""Per-piece device-time budget of one wavefront TestScene frame.

Times (chained-fori, honest over the relay):
  - full trace at maxdepth 1/2/3 (level marginal cost)
  - intersect_multi and shadow_query_multi at each level's queue width
  - a shading-only variant (trace with the intersect results frozen is
    not separable under jit, so shading cost = full - queries)

Usage: python tools/profile_frame.py [piece ...]
  pieces: trace d1 d2 d3 queries all (default all)
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, INFINITY
from glome_tpu.render import Renderer, tile_order
from glome_tpu.intersect import intersect_multi, shadow_query_multi

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
o = jax.device_put(o); d = jax.device_put(d)
N = o.shape[0]

which = set(sys.argv[1:]) or {"all"}


def want(k):
    return "all" in which or k in which


if want("trace") or want("d3"):
    def step3(p):
        res = tracer.trace(arrays, o + p * 1e-4, d)
        return jnp.mean(res.color)
    device_time(step3, verbose=f"trace d3 N={N}")

for dpt in (1, 2):
    if not want(f"d{dpt}"):
        continue
    tr = G.WavefrontTracer(compiled, RenderConfig.tuned(
        xres=720, yres=480, maxdepth=dpt))
    def stepd(p, tr=tr):
        res = tr.trace(arrays, o + p * 1e-4, d)
        return jnp.mean(res.color)
    device_time(stepd, verbose=f"trace d{dpt} N={N}")

if want("queries"):
    # level-queue widths from the tuned plan
    widths = [N]
    for level in range(2):
        segs, Qn = tracer._plan(widths[-1], level)
        widths.append(Qn)
    sid0 = jnp.zeros((N,), jnp.int32)
    for level, W in enumerate(widths):
        oo = jnp.resize(o, (W, 3))
        dd = jnp.resize(d, (W, 3))
        ss = jnp.zeros((W,), jnp.int32)

        def stepi(p, oo=oo, dd=dd, ss=ss):
            h = intersect_multi(compiled, arrays, oo + p * 1e-4, dd, ss)
            return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
        device_time(stepi, verbose=f"L{level} intersect W={W}")

        SW = W * len([l for l in lights if l.shadow])
        so = jnp.resize(o, (SW, 3))
        sd = jnp.resize(d, (SW, 3))
        sss = jnp.zeros((SW,), jnp.int32)
        st = jnp.full((SW,), 10.0, jnp.float32)

        def steps(p, so=so, sd=sd, sss=sss, st=st):
            b = shadow_query_multi(compiled, arrays, so + p * 1e-4, sd,
                                   sss, st)
            return jnp.mean(b.astype(jnp.float32))
        device_time(steps, verbose=f"L{level} shadow W={SW}")

"""Per-segment live-TILE occupancy of the TestScene frame at the bench
resolution -- drives RenderConfig.tuned()'s tile-fraction schedule.

Usage: GLOME_OCC=1 python tools/occupancy.py [xres yres]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
os.environ.setdefault("GLOME_OCC", "1")

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig
from glome_tpu.render import Renderer, tile_order

xres = int(sys.argv[1]) if len(sys.argv) > 1 else 720
yres = int(sys.argv[2]) if len(sys.argv) > 2 else 480

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
arrays = jax.device_put(compiled.arrays())
cfg = RenderConfig(xres=xres, yres=yres)  # lossless caps
tracer = G.WavefrontTracer(compiled, cfg)
renderer = Renderer(tracer, cam, cfg)
ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
perm = tile_order(cfg.xres, cfg.yres)
o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                ys.reshape(-1)[perm].astype(np.float32))
res = jax.jit(tracer.trace)(jax.device_put(arrays), jax.device_put(o),
                            jax.device_put(d))
ov = np.asarray(res.overflow)
for lbl, v in zip(tracer.overflow_labels, ov):
    if lbl.startswith("occ!"):
        seg, tq = lbl[4:].rsplit("/of_", 1)
        print(f"{seg:24s} {int(v):5d} / {tq:>5s} tiles "
              f"({int(v)/max(int(tq),1):.2f})")
    else:
        print(f"{lbl:24s} dropped {int(v)}")

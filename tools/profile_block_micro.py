"""Isolate block_kernel cost per group on primary rays.

Usage: python tools/profile_block_micro.py
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
from glome_tpu import megakernel as MK
from glome_tpu import block_kernel as BK
from glome_tpu.compile import materialize_scene_params

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
seed = jnp.full((N,), INFINITY, jnp.float32)

plan = MK.get_plan(compiled)
sc = compiled.scenes[0]
garrs = materialize_scene_params(sc, arrays["scenes"][0])

for si, gi in plan.blocks:
    g = sc.groups[gi]
    bp = BK.get_block_plan(g, sc)
    print(f"# g{gi} {g.ptype} P={g.size} blocks={bp.n_blocks} "
          f"nodes={bp.n_nodes} Fp={bp.Fp} cons={len(bp.cons)}", flush=True)

    def step(p, gi=gi):
        t, l2 = BK.block_pass(sc, garrs, gi, o + p * 1e-5, d, seed,
                              shadow=False)
        return jnp.mean(jnp.where(t >= INFINITY, 0.0, t))
    device_time(step, verbose=f"block g{gi} intersect N={N}")

"""Sweep block size BP for block_kernel on the realistic L0 shadow
batch AND coherent primary rays, per group.

Usage: python tools/profile_bp_sweep.py [bp ...]  (default 8 32 128)
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
from glome_tpu import block_kernel as BK
from glome_tpu.compile import materialize_scene_params
from glome_tpu.trace import _light_arrays
from glome_tpu.vec import vdot, vscaleadd

bps = [int(a) for a in sys.argv[1:]] or [8, 32, 128]

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
seedN = jnp.full((N,), INFINITY, jnp.float32)

plan = MK.get_plan(compiled)
sc = compiled.scenes[0]
garrs = materialize_scene_params(sc, arrays["scenes"][0])


# realistic L0 shadow batch
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
W = so.shape[0]
print(f"# shadow batch W={W}", flush=True)

for bp in bps:
    for si, gi in plan.blocks:
        g = sc.groups[gi]
        g._gblock_plan = None
        bplan = BK.BlockPlan(g, sc, bp=bp)
        g._gblock_plan = bplan
        print(f"# bp={bp} g{gi} {g.ptype} P={g.size} "
              f"blocks={bplan.n_blocks} nodes={bplan.n_nodes} "
              f"depth={bplan.depth}", flush=True)

        def step_i(p, gi=gi):
            t, l2 = BK.block_pass(sc, garrs, gi, o + p * 1e-5, d, seedN,
                                  shadow=False)
            return jnp.mean(jnp.where(t >= INFINITY, 0.0, t))

        def step_s(p, gi=gi):
            t, l2 = BK.block_pass(sc, garrs, gi, so + p * 1e-5, sd, st,
                                  shadow=True)
            return jnp.mean(jnp.where(t >= INFINITY, 0.0, t))

        device_time(step_i, verbose=f"bp={bp} g{gi} primary")
        device_time(step_s, verbose=f"bp={bp} g{gi} shadow")

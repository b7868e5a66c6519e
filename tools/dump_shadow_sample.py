"""Dump a tile sample of the real L0 shadow batch (origins at hit
points, dirs to lights, tmax to light) for host-side traversal
simulation (tools/sim_traversal.py).

Usage: python tools/dump_shadow_sample.py [out.npz]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, DELTA
from glome_tpu.render import Renderer, tile_order
from glome_tpu import megakernel as MK
from glome_tpu.trace import _light_arrays
from glome_tpu.vec import vdot, vscaleadd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shadow_sample.npz"

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


so, sd, st = shadow_batch(o, d)
W = so.shape[0]
T = W // 1024
sel_tiles = np.linspace(0, T - 1, 48).astype(np.int64)
idx = (sel_tiles[:, None] * 1024 + np.arange(1024)[None, :]).reshape(-1)
idx_j = jnp.asarray(idx)
# also primary-ray tiles for the intersect-side question
pt = np.linspace(0, N // 1024 - 1, 24).astype(np.int64)
pidx = jnp.asarray((pt[:, None] * 1024
                    + np.arange(1024)[None, :]).reshape(-1))
np.savez(out,
         so=np.asarray(so[idx_j]), sd=np.asarray(sd[idx_j]),
         st=np.asarray(st[idx_j]),
         po=np.asarray(o[pidx]), pd=np.asarray(d[pidx]))
print("wrote", out, "tiles:", len(sel_tiles), "+", len(pt), "primary")

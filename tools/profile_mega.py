"""Split intersect_multi cost: mega_select vs finalize (dev tool)."""
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
from glome_tpu import megakernel as M

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
sid0 = jnp.zeros((N,), jnp.int32)
plan = M.get_plan(compiled)

which = set(sys.argv[1:]) or {"all"}


def want(k):
    return "all" in which or k in which


if want("select"):
    def step_sel(p):
        pf, bb = M.pack_tables(plan, compiled, arrays)
        seed = jnp.full((N,), INFINITY, jnp.float32)
        t, wid, aux = M.mega_select(plan, pf, bb, o + p * 1e-4, d, seed,
                                    sid=sid0)
        return jnp.mean(jnp.where(t >= INFINITY, 0.0, t))
    device_time(step_sel, verbose=f"mega_select N={N}")

if want("select_shadow"):
    def step_sh(p):
        pf, bb = M.pack_tables(plan, compiled, arrays)
        seed = jnp.full((N,), 10.0, jnp.float32)
        t, wid, aux = M.mega_select(plan, pf, bb, o + p * 1e-4, d, seed,
                                    sid=sid0, shadow=True)
        return jnp.mean(jnp.where(t >= INFINITY, 0.0, t))
    device_time(step_sh, verbose=f"mega_select shadow N={N}")

if want("finalize"):
    # winner ids from one real select, computed once outside the chain
    @jax.jit
    def pre():
        pf, bb = M.pack_tables(plan, compiled, arrays)
        seed = jnp.full((N,), INFINITY, jnp.float32)
        return M.mega_select(plan, pf, bb, o, d, seed, sid=sid0)
    t0, wid0, aux0 = jax.block_until_ready(pre())

    def step_fin(p):
        hit = M.finalize(compiled, plan, arrays, o + p * 1e-4, d,
                         t0, wid0, aux=aux0, want_meta=True)
        return jnp.mean(hit.norm)
    device_time(step_fin, verbose=f"finalize N={N}")

"""Find the ~25 ms/level gap between standalone query timings and the
full wavefront frame (dev tool).

Pieces:
  down0     : full _down_level at L0 (queries + preshade + spawn)
  up0       : full _up_level at L0 (fold + child gathers)
  inc1      : L1-width intersect on *incoherent* (real reflected) rays
  coh1      : L1-width intersect on coherent primary-ray copies
  shinc     : L0 shadow query on real hit points (frame-like)
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, INFINITY, DELTA
from glome_tpu.render import Renderer, tile_order
from glome_tpu.intersect import intersect_multi
from glome_tpu.trace import _light_arrays
from glome_tpu.vec import reflect as vreflect, vscaleadd

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
lpos, lcol, lrad = _light_arrays(compiled, arrays, compiled.lights)

which = set(sys.argv[1:]) or {"all"}


def want(k):
    return "all" in which or k in which


hit0 = jax.jit(lambda: intersect_multi(compiled, arrays, o, d, sid0))()
hit0 = jax.block_until_ready(hit0)

if want("down0"):
    segs, Qn = tracer._plan(N, 0)

    def step_down(p):
        tracer.overflow_labels = []
        carry = (o + p * 1e-4, d, sid0,
                 jnp.full((N,), INFINITY, jnp.float32))
        ov = []
        (no, nd, nsid, ntmax), stored = tracer._down_level(
            arrays, carry, segs, Qn, 0, compiled.lights,
            lpos, lcol, lrad, ov)
        return (jnp.mean(no) + jnp.mean(stored["t"])
                + jnp.mean(stored["contrib"]))
    device_time(step_down, verbose=f"down_level L0 N={N}")

if want("up0"):
    segs, Qn = tracer._plan(N, 0)

    def mk_stored(p):
        tracer.overflow_labels = []
        carry = (o + p * 1e-4, d, sid0,
                 jnp.full((N,), INFINITY, jnp.float32))
        return tracer._down_level(arrays, carry, segs, Qn, 0,
                                  compiled.lights, lpos, lcol, lrad, [])
    (_, stored0) = jax.jit(mk_stored)(0.0)
    stored0 = jax.block_until_ready(stored0)
    cnext = jnp.full((Qn, 4), 0.25, jnp.float32)
    tnext = jnp.full((Qn,), 3.0, jnp.float32)

    def step_up(p):
        st = dict(stored0)
        st["t"] = st["t"] + p * 1e-4
        col, t = tracer._up_level(st, segs, cnext + p, tnext, compiled.lights)
        return jnp.mean(col) + jnp.mean(t)
    device_time(step_up, verbose=f"up_level L0 N={N}")

if want("inc1") or want("coh1"):
    segs, Qn = tracer._plan(N, 0)
    rdir = vreflect(d, hit0.norm)
    ro = vscaleadd(hit0.pos, rdir, DELTA)
    ro1 = jnp.resize(ro, (Qn, 3))
    rd1 = jnp.resize(rdir, (Qn, 3))
    co1 = jnp.resize(o, (Qn, 3))
    cd1 = jnp.resize(d, (Qn, 3))
    ss = jnp.zeros((Qn,), jnp.int32)
    if want("inc1"):
        def step_i(p):
            h = intersect_multi(compiled, arrays, ro1 + p * 1e-4, rd1, ss)
            return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
        device_time(step_i, verbose=f"L1 intersect incoherent W={Qn}")
    if want("coh1"):
        def step_c(p):
            h = intersect_multi(compiled, arrays, co1 + p * 1e-4, cd1, ss)
            return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
        device_time(step_c, verbose=f"L1 intersect coherent W={Qn}")

if want("shinc"):
    from glome_tpu.intersect import shadow_query_multi
    sh_o = vscaleadd(hit0.pos, hit0.norm, DELTA)
    parts_o, parts_d, parts_t = [], [], []
    for li in range(len(compiled.lights)):
        lvec = lpos[li] - hit0.pos
        llen = jnp.sqrt(jnp.sum(lvec * lvec, -1))
        ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
        parts_o.append(sh_o)
        parts_d.append(ldir)
        parts_t.append(jnp.where(hit0.hit, llen - 2 * DELTA, 0.0))
    so = jnp.concatenate(parts_o)
    sd = jnp.concatenate(parts_d)
    st = jnp.concatenate(parts_t)
    ss = jnp.zeros((so.shape[0],), jnp.int32)

    def step_s(p):
        b = shadow_query_multi(compiled, arrays, so + p * 1e-4, sd, ss, st)
        return jnp.mean(b.astype(jnp.float32))
    device_time(step_s, verbose=f"L0 shadow frame-like W={so.shape[0]}")

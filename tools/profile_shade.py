"""Split the wavefront frame's non-query cost: texture fold vs
preshade vs child-spawn compaction (dev tool, chained-fori timing)."""
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
from glome_tpu.trace import _light_arrays, compact_indices, gather
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
o = jax.device_put(o); d = jax.device_put(d)
N = o.shape[0]
sid0 = jnp.zeros((N,), jnp.int32)

# one real hit + light context, computed once outside the timed chain
hit0 = jax.jit(lambda: intersect_multi(compiled, arrays, o, d, sid0))()
hit0 = jax.block_until_ready(hit0)
lpos, lcol, lrad = _light_arrays(compiled, arrays, compiled.lights)

which = set(sys.argv[1:]) or {"all"}


def want(k):
    return "all" in which or k in which


if want("fold"):
    def step_fold(p):
        hit = hit0._replace(pos=hit0.pos + p * 1e-4)
        light_contribs = []
        for li in range(len(compiled.lights)):
            lvec = lpos[li] - hit.pos
            llen = jnp.sqrt(vdot(lvec, lvec))
            ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
            active = hit.hit & (vdot(lvec, hit.norm) >= 0.0)
            contrib = jnp.where(active[:, None],
                                lcol[li] / jnp.maximum(llen * llen,
                                                       1e-20)[:, None],
                                0.0)
            light_contribs.append((contrib, ldir, active))
        ctx = dict(hit=hit, d=d, eyedir=-d, lights=light_contribs,
                   children={}, recurs=1)
        acc = tracer._fold_textures(ctx, hit, (N,), jnp.float32)
        return jnp.mean(acc)
    device_time(step_fold, verbose=f"preshade-math+fold N={N}")

if want("spawn"):
    segs, Qn = tracer._plan(N, 0)
    def step_spawn(p):
        hit = hit0._replace(pos=hit0.pos + p * 1e-4)
        overflow = []
        tracer.overflow_labels = []
        carry = (o, d, sid0, jnp.full((N,), INFINITY, jnp.float32))
        # reuse only the child-spawn block by calling _down_level minus
        # the queries is hard; instead emulate its compaction traffic:
        # per segment: mask -> compact -> 3 gathers -> 4 queue writes
        no = jnp.zeros((Qn, 3), jnp.float32)
        nd = jnp.zeros((Qn, 3), jnp.float32).at[:, 2].set(1.0)
        nsid = jnp.full((Qn,), -1, jnp.int32)
        ntmax = jnp.zeros((Qn,), jnp.float32)
        for key, offq, capq in segs:
            mask = hit.hit & (hit.t * 37.0 % 1.0 < 0.3)  # ~30% live
            idx = compact_indices(mask, capq)
            valid = idx < N
            ro = vscaleadd(hit.pos, hit.norm, DELTA)
            no = no.at[offq:offq + capq].set(gather(ro, idx))
            ndir = gather(d, idx)
            nd = nd.at[offq:offq + capq].set(
                jnp.where(valid[:, None], ndir,
                          jnp.zeros_like(ndir).at[:, 2].set(1.0)))
            nsid = nsid.at[offq:offq + capq].set(
                jnp.where(valid, gather(sid0, idx), -1))
            ntmax = ntmax.at[offq:offq + capq].set(
                jnp.where(valid, INFINITY, 0.0))
        return (jnp.mean(no) + jnp.mean(nd) + jnp.mean(ntmax)
                + jnp.mean(nsid.astype(jnp.float32)))
    device_time(step_spawn, verbose=f"spawn compaction x{len(segs)} segs")

if want("upscatter"):
    from glome_tpu.trace import scatter
    segs, Qn = tracer._plan(N, 0)
    cnext = jnp.ones((Qn, 4), jnp.float32)
    tnext = jnp.ones((Qn,), jnp.float32)
    def step_up(p):
        hit = hit0._replace(t=hit0.t + p * 1e-4)
        tot = 0.0
        for key, offq, capq in segs:
            mask = hit.hit & (hit.t * 37.0 % 1.0 < 0.3)
            idx = compact_indices(mask, capq)
            ccol = scatter(jnp.zeros((N, 4), jnp.float32), idx,
                           cnext[offq:offq + capq])
            ct = scatter(jnp.full((N,), INFINITY, jnp.float32), idx,
                         tnext[offq:offq + capq])
            tot = tot + jnp.mean(ccol) + jnp.mean(ct)
        return tot
    device_time(step_up, verbose=f"up-level scatters x{len(segs)} segs")

"""Wavefront tracer: the Whitted recursion as a scan over depth.

The recursive tracer (trace.py) unrolls the bounce tree, which makes
the compiled program grow with depth (XLA compiles every level's
intersect separately).  This module restructures the same semantics as
two lax.scans over a single uniform ray queue:

  DOWN:  for each depth level, one multi-scene intersect of the queue
         (rays carry a scene id, so portal-frame and portal-target rays
         ride the same batch as reflection/refraction rays), one fused
         shadow pass, then child rays are compacted into fixed queue
         segments [reflect | refract_m | warp_frame_w | warp_target_w].
  UP:    shading runs deepest-first; each level folds its texture
         stacks (cafold) using the child colors scattered back from the
         next level's queue segments.  The deepest level's children are
         the transparent miss -- exactly trace at recursion 0
         (Trace.hs:60), so depth-exhaustion semantics match the
         reference with no special cases.

The scan bodies compile once regardless of depth: compile time is
O(1) in maxdepth instead of O(children^depth).

Constraints: all light sets must equal the root set (true for the
TestScene portal, TestScene.hs:179); scenes with per-warp light sets
fall back to the recursive tracer.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import color as C
from .compile import CompiledScene, TEX_DEPTH, TAG_DEPTH
from .config import DELTA, INFINITY, RenderConfig
from .intersect import Hit, intersect_multi, shadow_query_multi
from .materials import Refract
from .trace import TraceResult, Tracer, compact_indices, gather, scatter, \
    _light_arrays
from .vec import bisect, reflect as vreflect, vdot, vnorm, vscaleadd


class WavefrontTracer(Tracer):
    """Scan-over-depth tracer; drop-in for Tracer.trace on the root
    scene with default lights."""

    def __init__(self, compiled: CompiledScene, config: RenderConfig = None):
        super().__init__(compiled, config)
        for w in compiled.warp_mats:
            if tuple(w.lights) != tuple(compiled.lights):
                raise NotImplementedError(
                    "wavefront tracer requires a single light set; "
                    "use the recursive Tracer")

    # -- static queue layout ----------------------------------------------

    def _plan(self, n_rays: int):
        cc = self.compiled
        caps = self.config.secondary_capacity

        def cap(frac):
            return max(128, int(math.ceil(n_rays * frac)))

        segs = []  # (key, offset, cap)
        off = 0
        if len(self.reflect_texids):
            c = cap(caps)
            segs.append(("reflect", off, c))
            off += c
        for mi in range(len(cc.refract_mats)):
            c = cap(caps * 0.5)
            segs.append((f"refract_{mi}", off, c))
            off += c
        for wi in range(len(cc.warp_mats)):
            c = cap(caps * 0.5)
            segs.append((f"warp_frame_{wi}", off, c))
            off += c
            segs.append((f"warp_target_{wi}", off, c))
            off += c
        Q = max(n_rays, off)
        return segs, Q

    # -- the two passes ----------------------------------------------------

    def trace(self, arrays, o, d, tmax=None, recurs: Optional[int] = None,
              scene_id: int = 0, lights=None) -> TraceResult:
        if recurs is None:
            recurs = self.config.maxdepth
        if lights is None:
            lights = self.compiled.lights
        assert lights == self.compiled.lights
        N = o.shape[0]
        dt = o.dtype
        R = max(recurs, 1)
        segs, Q = self._plan(N)
        cc = self.compiled

        def pad(x, fill=0.0):
            if x.shape[0] == Q:
                return x
            return jnp.concatenate(
                [x, jnp.full((Q - x.shape[0],) + x.shape[1:], fill, x.dtype)])

        qo = pad(o)
        qd = pad(d, fill=1.0)
        qsid = pad(jnp.full((N,), scene_id, jnp.int32), fill=-1)
        qtmax = pad(tmax if tmax is not None
                    else jnp.full((N,), INFINITY, dtype=dt), fill=0.0)

        lpos, lcol, lrad = _light_arrays(cc, arrays, lights)
        L = len(lights)

        def down_body(carry, _):
            co, cd, csid, ctmax = carry
            hit = intersect_multi(cc, arrays, co, cd, csid, tmax=ctmax)

            # fused per-light shadow batch (preshade, Shader.hs:65-80)
            light_pre = []
            sh_segments = []
            for li, l in enumerate(lights):
                lvec = lpos[li] - hit.pos
                llen = jnp.sqrt(vdot(lvec, lvec))
                ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
                facing = vdot(lvec, hit.norm) >= 0.0
                active = hit.hit & facing & (llen <= lrad[li])
                light_pre.append([llen, ldir, active])
                if l.shadow:
                    idx = compact_indices(active, Q)
                    sh_o = vscaleadd(hit.pos, hit.norm, DELTA)
                    sh_segments.append((li, idx, gather(sh_o, idx),
                                        gather(ldir, idx),
                                        gather(llen - 2.0 * DELTA, idx),
                                        gather(csid, idx)))
            if sh_segments:
                so = jnp.concatenate([s[2] for s in sh_segments])
                sd = jnp.concatenate([s[3] for s in sh_segments])
                st = jnp.concatenate([s[4] for s in sh_segments])
                ss = jnp.concatenate([s[5] for s in sh_segments])
                sb = shadow_query_multi(cc, arrays, so, sd, ss, st)
                offb = 0
                for li, idx, *_ in sh_segments:
                    seg = sb[offb:offb + Q]
                    offb += Q
                    blocked = scatter(jnp.zeros((Q,), bool), idx, seg)
                    light_pre[li][2] = light_pre[li][2] & ~blocked
            contrib = jnp.stack(
                [jnp.where(a[:, None],
                           lcol[li] * (1.0 / jnp.maximum(ll * ll, 1e-20))[:, None],
                           0.0)
                 for li, (ll, ld, a) in enumerate(light_pre)])
            ldirs = jnp.stack([ld for ll, ld, a in light_pre])
            lactive = jnp.stack([a for ll, ld, a in light_pre])

            # ---- spawn children into the fixed queue segments -----------
            no = jnp.zeros((Q, 3), dt)
            nd = jnp.zeros((Q, 3), dt).at[:, 2].set(1.0)
            nsid = jnp.full((Q,), -1, jnp.int32)
            ntmax = jnp.zeros((Q,), dt)
            stored_idx = {}
            stored_extra = {}
            for key, offq, capq in segs:
                if key == "reflect":
                    mask = hit.hit & self._stack_uses(hit.tex_stack,
                                                      self.reflect_texids)
                    outdir = vreflect(cd, hit.norm)
                    ro = vscaleadd(hit.pos, outdir, DELTA)
                    rd, rsid = outdir, csid
                elif key.startswith("refract_"):
                    mi = int(key.split("_")[-1])
                    m = cc.refract_mats[mi]
                    active = hit.hit & self._stack_uses(
                        hit.tex_stack, self.refract_texids[mi])
                    n = hit.norm
                    eta = jnp.where(vdot(n, -cd) > 0.0, m.ior, 1.0 / m.ior)
                    c1 = vdot(cd, n)
                    cs2 = 1.0 - eta * eta * (1.0 - c1 * c1)
                    tir = cs2 < 0.0
                    tdir = cd * eta[..., None] + n * (
                        eta * c1 - jnp.sqrt(jnp.maximum(cs2, 0.0)))[..., None]
                    stored_extra[f"refract_active_{mi}"] = active
                    stored_extra[f"refract_tir_{mi}"] = tir
                    mask = active & ~tir
                    ro = vscaleadd(hit.pos, tdir, DELTA)
                    rd, rsid = tdir, csid
                elif key.startswith("warp_frame_"):
                    wi = int(key.split("_")[-1])
                    active = hit.hit & self._stack_uses(
                        hit.tex_stack, self.warp_texids[wi])
                    stored_extra[f"warp_active_{wi}"] = active
                    mask = active
                    ro, rd = hit.obj_o, hit.obj_d
                    rsid = jnp.full((Q,), cc.warp_mats[wi].frame_scene,
                                    jnp.int32)
                else:  # warp_target
                    wi = int(key.split("_")[-1])
                    w = cc.warp_mats[wi]
                    mask = stored_extra[f"warp_active_{wi}"]
                    fwd = jnp.asarray(w.xfm.fwd, dtype=dt)
                    ro = jnp.einsum('ij,nj->ni', fwd[:, :3], hit.pos) + fwd[:, 3]
                    rd = vnorm(jnp.einsum('ij,nj->ni', fwd[:, :3], vnorm(cd)))
                    rsid = jnp.full((Q,), w.target_scene, jnp.int32)
                idx = compact_indices(mask, capq)
                stored_idx[key] = idx
                valid = idx < Q
                no = no.at[offq:offq + capq].set(gather(ro, idx))
                ndir = gather(rd, idx)
                ndir = jnp.where(valid[:, None], ndir,
                                 jnp.zeros_like(ndir).at[:, 2].set(1.0))
                nd = nd.at[offq:offq + capq].set(ndir)
                nsid = nsid.at[offq:offq + capq].set(
                    jnp.where(valid, gather(rsid, idx), -1))
                ntmax = ntmax.at[offq:offq + capq].set(
                    jnp.where(valid, INFINITY, 0.0))

            stored = dict(
                t=hit.t, hitmask=hit.hit, pos=hit.pos, norm=hit.norm,
                d=cd, tex=hit.tex_stack, tag=hit.tag_stack,
                serial=hit.prim_serial,
                contrib=contrib, ldirs=ldirs, lactive=lactive,
                idx={k: v for k, v in stored_idx.items()},
                extra=stored_extra,
            )
            return (no, nd, nsid, ntmax), stored

        carry0 = (qo, qd, qsid, qtmax)
        _, stored_all = jax.lax.scan(down_body, carry0, None, length=R)

        # ---- UP: shade deepest-first ------------------------------------
        def up_body(carry, stored):
            color_next, t_next = carry
            Qn = color_next.shape[0]
            children = {}
            for key, offq, capq in segs:
                idx = stored["idx"][key]
                cseg = color_next[offq:offq + capq]
                tseg = t_next[offq:offq + capq]
                ccol = scatter(jnp.zeros((Q, 4), dt), idx, cseg)
                ct = scatter(jnp.full((Q,), INFINITY, dt), idx, tseg)
                if key == "reflect":
                    children["reflect"] = ccol
                elif key.startswith("refract_"):
                    mi = int(key.split("_")[-1])
                    active = stored["extra"][f"refract_active_{mi}"]
                    tir = stored["extra"][f"refract_tir_{mi}"]
                    ccol = jnp.where((active & tir)[:, None],
                                     C.ca_black((Q,), dt), ccol)
                    children[("refract", mi)] = ccol
                elif key.startswith("warp_frame_"):
                    children[("warp_frame", int(key.split("_")[-1]))] = (ccol, ct)
                else:
                    wi = int(key.split("_")[-1])
                    fcol, ft = children.pop(("warp_frame", wi))
                    children[("warp", wi)] = (fcol, ft, ccol, ct)

            hit = Hit(t=stored["t"], hit=stored["hitmask"],
                      pos=stored["pos"], norm=stored["norm"],
                      obj_o=stored["pos"], obj_d=stored["d"],
                      tex_stack=stored["tex"], tag_stack=stored["tag"],
                      prim_serial=stored["serial"])
            light_contribs = [
                (stored["contrib"][li], stored["ldirs"][li],
                 stored["lactive"][li]) for li in range(L)]
            ctx = dict(hit=hit, d=stored["d"], eyedir=-stored["d"],
                       lights=light_contribs, children=children,
                       recurs=2)  # children present; eval uses them
            acc = C.ca_transparent((Q,), dt)
            for layer in range(TEX_DEPTH):
                tids = hit.tex_stack[:, layer]
                layer_color = C.ca_transparent((Q,), dt)
                for tid, tex in enumerate(self.compiled.textures):
                    mask = tids == tid
                    col = self._eval_texture(tex, ctx)
                    layer_color = jnp.where(mask[:, None], col, layer_color)
                has = (tids >= 0) & hit.hit
                opaque = acc[..., 3] + DELTA >= 1.0
                folded = C.cafold(acc, layer_color)
                acc = jnp.where((has & ~opaque)[:, None], folded, acc)
            return (acc, stored["t"]), None

        up_init = (C.ca_transparent((Q,), dt),
                   jnp.full((Q,), INFINITY, dtype=dt))
        (color, t), _ = jax.lax.scan(up_body, up_init, stored_all,
                                     reverse=True)

        tag0 = jax.tree.map(lambda x: x[0], stored_all["tag"])
        ser0 = jax.tree.map(lambda x: x[0], stored_all["serial"])
        t0 = jax.tree.map(lambda x: x[0], stored_all["t"])
        return TraceResult(color[:N], t0[:N], tag0[:N], ser0[:N])

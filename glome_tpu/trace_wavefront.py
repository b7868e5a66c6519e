"""Wavefront tracer: the Whitted recursion as per-level ray queues.

The recursive tracer (trace.py) unrolls the bounce tree, which makes
the compiled program grow with the number of child *kinds* per depth.
This module restructures the same semantics as one uniform ray queue
per depth level:

  DOWN:  for each depth level, one multi-scene intersect of the queue
         (rays carry a scene id, so portal-frame and portal-target rays
         ride the same batch as reflection/refraction rays), one fused
         compacted shadow pass, then child rays are compacted into
         fixed queue segments [reflect | refract_m | warp_frame_w |
         warp_target_w] forming the NEXT level's (smaller) queue.
  UP:    shading runs deepest-first; each level folds its texture
         stacks (cafold) using the child colors scattered back from the
         next level's queue segments.  The deepest level's children are
         the transparent miss -- exactly trace at recursion 0
         (Trace.hs:60), so depth-exhaustion semantics match the
         reference with no special cases.

Queue sizes shrink with depth on a static capacity schedule
(RenderConfig.{reflect,refract,warp,shadow}_capacity): secondary-ray
occupancy decays geometrically (TestScene: level-1 queues are ~35%
live, level-2 under 10%), so scheduled capacities cut the per-frame
ray-pass volume several-fold versus running every level at the
primary-ray width.  Rays beyond a segment's capacity are dropped
(child color falls back to the transparent miss; overflowing shadow
rays count as unblocked) -- capacities ship with generous headroom
over measured occupancy and are fully configurable.

Constraints: all light sets must equal the root set (true for the
TestScene portal, TestScene.hs:179); scenes with per-warp light sets
fall back to the recursive tracer.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import color as C
from .compile import CompiledScene, TEX_DEPTH, TAG_DEPTH
from .config import DELTA, INFINITY, RenderConfig
from .intersect import Hit, intersect_multi, shadow_query_multi
from .trace import TraceResult, Tracer, compact_indices, gather, scatter, \
    _light_arrays
from .vec import reflect as vreflect, vdot, vnorm, vscaleadd


def _lvl(seq, level, default):
    """Per-level schedule lookup: tuple clamps at its last entry (empty
    tuple = default), scalar applies to every level, None = default."""
    if seq is None:
        return default
    if isinstance(seq, (int, float)):
        return float(seq)
    if len(seq) == 0:
        return default
    return float(seq[min(level, len(seq) - 1)])


class WavefrontTracer(Tracer):
    """Per-level-queue tracer; drop-in for Tracer.trace on the root
    scene with default lights."""

    def __init__(self, compiled: CompiledScene, config: RenderConfig = None):
        super().__init__(compiled, config)
        for w in compiled.warp_mats:
            if tuple(w.lights) != tuple(compiled.lights):
                raise NotImplementedError(
                    "wavefront tracer requires a single light set; "
                    "use the recursive Tracer")

    # -- static queue layout ----------------------------------------------

    def _plan(self, queue_n: int, level: int):
        """Child-queue segment layout spawned from a `queue_n`-ray queue
        at depth `level`: [(key, offset, cap)], total size Q."""
        cc = self.compiled
        cfg = self.config
        s = cfg.secondary_capacity
        refl_f = _lvl(cfg.reflect_capacity, level, s)
        refr_f = _lvl(cfg.refract_capacity, level, s * 0.5)
        warp_f = _lvl(cfg.warp_capacity, level, s * 0.5)

        def cap(frac):
            return max(128, min(int(math.ceil(queue_n * frac)), queue_n))

        segs = []  # (key, offset, cap)
        off = 0
        if len(self.reflect_texids):
            c = cap(refl_f)
            segs.append(("reflect", off, c))
            off += c
        for mi in range(len(cc.refract_mats)):
            c = cap(refr_f)
            segs.append((f"refract_{mi}", off, c))
            off += c
        for wi in range(len(cc.warp_mats)):
            c = cap(warp_f)
            segs.append((f"warp_frame_{wi}", off, c))
            off += c
            segs.append((f"warp_target_{wi}", off, c))
            off += c
        return segs, max(off, 128)

    def _count_overflow(self, overflow, label, mask, cap):
        """Record rays dropped by one capped compaction (ADVICE r1:
        capacity undersizing must be detectable, not silent)."""
        if cap >= mask.shape[0]:
            return  # structurally lossless
        n = jnp.sum(mask.astype(jnp.int32))
        overflow.append(jnp.maximum(n - cap, 0))
        if label not in self.overflow_labels:
            self.overflow_labels.append(label)

    # -- one DOWN level ------------------------------------------------------

    def _down_level(self, arrays, carry, segs, Qn, level, lights,
                    lpos, lcol, lrad, overflow):
        """Intersect + preshade one level's queue; spawn children into a
        fresh (Qn,)-ray queue laid out by `segs`.  Returns (child carry,
        stored shading inputs).  Every capped compaction appends its
        dropped-ray count to `overflow` (labels in overflow_labels)."""
        co, cd, csid, ctmax = carry
        Qc = co.shape[0]
        dt = co.dtype
        cc = self.compiled
        hit = intersect_multi(cc, arrays, co, cd, csid, tmax=ctmax)

        # fused per-light shadow batch (preshade, Shader.hs:65-80).
        # Default: masked full width -- every queue ray gets a slot per
        # light, inactive rays carry tmax 0 so the megakernel culls
        # them for free; no compaction, no scatters, structurally
        # lossless.  A shadow_capacity < 1 switches to the compacted
        # path (with overflow accounting).
        sh_f = _lvl(self.config.shadow_capacity, level, 1.0)
        sh_cap = max(128, min(int(math.ceil(Qc * sh_f)), Qc))
        light_pre = []
        sh_segments = []
        sh_o = vscaleadd(hit.pos, hit.norm, DELTA)
        for li, l in enumerate(lights):
            lvec = lpos[li] - hit.pos
            llen = jnp.sqrt(vdot(lvec, lvec))
            ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
            facing = vdot(lvec, hit.norm) >= 0.0
            active = hit.hit & facing & (llen <= lrad[li])
            light_pre.append([llen, ldir, active])
            if not l.shadow:
                continue
            if sh_cap >= Qc:
                sh_segments.append((li, None, sh_o, ldir,
                                    jnp.where(active, llen - 2.0 * DELTA,
                                              0.0), csid))
            else:
                self._count_overflow(overflow, f"L{level}/shadow{li}",
                                     active, sh_cap)
                idx = compact_indices(active, sh_cap)
                sh_segments.append((li, idx, gather(sh_o, idx),
                                    gather(ldir, idx),
                                    gather(llen - 2.0 * DELTA, idx),
                                    jnp.where(idx < Qc,
                                              gather(csid, idx), -1)))
        if sh_segments:
            so = jnp.concatenate([s[2] for s in sh_segments])
            sd = jnp.concatenate([s[3] for s in sh_segments])
            st = jnp.concatenate([s[4] for s in sh_segments])
            ss = jnp.concatenate([s[5] for s in sh_segments])
            sd = jnp.where((ss >= 0)[:, None], sd,
                           jnp.zeros_like(sd).at[:, 2].set(1.0))
            sb = shadow_query_multi(cc, arrays, so, sd, ss,
                                    jnp.where(ss >= 0, st, 0.0))
            offb = 0
            for li, idx, _o, _d, _t, _s in sh_segments:
                n_seg = Qc if idx is None else sh_cap
                seg = sb[offb:offb + n_seg]
                offb += n_seg
                blocked = (seg if idx is None
                           else scatter(jnp.zeros((Qc,), bool), idx, seg))
                light_pre[li][2] = light_pre[li][2] & ~blocked
        if light_pre:
            contrib = jnp.stack(
                [jnp.where(a[:, None],
                           lcol[li] * lights[li].falloff_at(ll)[:, None],
                           0.0)
                 for li, (ll, ld, a) in enumerate(light_pre)])
            ldirs = jnp.stack([ld for ll, ld, a in light_pre])
            lactive = jnp.stack([a for ll, ld, a in light_pre])
        else:
            contrib = jnp.zeros((0, Qc, 3), dt)
            ldirs = jnp.zeros((0, Qc, 3), dt)
            lactive = jnp.zeros((0, Qc), bool)

        # ---- spawn children into the fixed queue segments -----------
        # each segment is built compacted then the queue is assembled
        # with ONE concatenate per field (dynamic-update-slices per
        # segment cost a full queue pass each)
        seg_o, seg_d, seg_sid, seg_tmax = [], [], [], []
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
                rsid = jnp.full((Qc,), cc.warp_mats[wi].frame_scene,
                                jnp.int32)
            else:  # warp_target
                wi = int(key.split("_")[-1])
                w = cc.warp_mats[wi]
                mask = stored_extra[f"warp_active_{wi}"]
                fwd = jnp.asarray(w.xfm.fwd, dtype=dt)
                ro = jnp.einsum('ij,nj->ni', fwd[:, :3], hit.pos) + fwd[:, 3]
                rd = vnorm(jnp.einsum('ij,nj->ni', fwd[:, :3], vnorm(cd)))
                rsid = jnp.full((Qc,), w.target_scene, jnp.int32)
            self._count_overflow(overflow, f"L{level}/{key}", mask, capq)
            idx = compact_indices(mask, capq)
            # inverse map for the UP pass: parent -> its child slot.
            # TPU scatters cost ~10x a gather at these widths (measured
            # 14 ms vs 1.5 ms for the 4-segment L0 traffic), so the up
            # pass gathers child results through this instead of
            # scattering them back.
            pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            stored_idx[key] = jnp.where(mask & (pos < capq), pos, -1)
            valid = idx < Qc
            seg_o.append(gather(ro, idx))
            ndir = gather(rd, idx)
            seg_d.append(jnp.where(valid[:, None], ndir,
                                   jnp.zeros_like(ndir).at[:, 2].set(1.0)))
            seg_sid.append(jnp.where(valid, gather(rsid, idx), -1))
            seg_tmax.append(jnp.where(valid, INFINITY, 0.0).astype(dt))

        used = sum(capq for _, _, capq in segs)
        pad = Qn - used
        if pad or not segs:
            seg_o.append(jnp.zeros((pad, 3), dt))
            seg_d.append(jnp.zeros((pad, 3), dt).at[:, 2].set(1.0))
            seg_sid.append(jnp.full((pad,), -1, jnp.int32))
            seg_tmax.append(jnp.zeros((pad,), dt))
        no = jnp.concatenate(seg_o)
        nd = jnp.concatenate(seg_d)
        nsid = jnp.concatenate(seg_sid)
        ntmax = jnp.concatenate(seg_tmax)

        stored = dict(
            t=hit.t, hitmask=hit.hit, pos=hit.pos, norm=hit.norm,
            d=cd, tex=hit.tex_stack, tag=hit.tag_stack,
            serial=hit.prim_serial,
            contrib=contrib, ldirs=ldirs, lactive=lactive,
            idx=stored_idx, extra=stored_extra,
        )
        return (no, nd, nsid, ntmax), stored

    # -- one UP level ----------------------------------------------------

    def _up_level(self, stored, segs, color_next, t_next, lights):
        Qc = stored["t"].shape[0]
        dt = stored["pos"].dtype
        L = len(lights)
        children = {}
        for key, offq, capq in segs:
            slot = stored["idx"][key]            # (Qc,) child slot or -1
            has = slot >= 0
            src = offq + jnp.maximum(slot, 0)
            ccol = jnp.where(has[:, None],
                             jnp.take(color_next, src, axis=0,
                                      mode='clip'),
                             0.0)
            ct = jnp.where(has,
                           jnp.take(t_next, src, mode='clip'), INFINITY)
            if key == "reflect":
                children["reflect"] = ccol
            elif key.startswith("refract_"):
                mi = int(key.split("_")[-1])
                active = stored["extra"][f"refract_active_{mi}"]
                tir = stored["extra"][f"refract_tir_{mi}"]
                ccol = jnp.where((active & tir)[:, None],
                                 C.ca_black((Qc,), dt), ccol)
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
        acc = self._fold_textures(ctx, hit, (Qc,), dt)
        return acc, stored["t"]

    # -- the full trace ----------------------------------------------------

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
        cc = self.compiled

        lpos, lcol, lrad = _light_arrays(cc, arrays, lights)

        carry = (o, d, jnp.full((N,), scene_id, jnp.int32),
                 tmax if tmax is not None
                 else jnp.full((N,), INFINITY, dtype=dt))
        stored_levels = []
        seg_plans = []
        overflow = []
        self.overflow_labels = []
        for level in range(R):
            segs, Qn = self._plan(carry[0].shape[0], level)
            carry, stored = self._down_level(arrays, carry, segs, Qn,
                                             level, lights,
                                             lpos, lcol, lrad, overflow)
            stored_levels.append(stored)
            seg_plans.append(segs)

        # deepest level's children are never traced: transparent miss,
        # i.e. trace at recursion 0 (Trace.hs:60)
        Qdeep = carry[0].shape[0]
        color = C.ca_transparent((Qdeep,), dt)
        t = jnp.full((Qdeep,), INFINITY, dtype=dt)
        for level in reversed(range(R)):
            color, t = self._up_level(stored_levels[level],
                                      seg_plans[level], color, t, lights)

        s0 = stored_levels[0]
        ov = jnp.stack(overflow) if overflow else None
        return TraceResult(color[:N], s0["t"][:N], s0["tag"][:N],
                           s0["serial"][:N], ov)

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
         stacks (cafold) using the child colors read back from the
         next level's queue segments.  The deepest level's children are
         the transparent miss -- exactly trace at recursion 0
         (Trace.hs:60), so depth-exhaustion semantics match the
         reference with no special cases.

Queues are built at TILE=1024-ray granularity (one (8,128) kernel
tile): a segment keeps a tile iff ANY of its parents spawns that child
kind, and within a kept tile children sit at their parents' positions.
Round-3 profiling (tools/PERF_BUDGET.md) showed element-level
compaction cost ~14 ms/frame of nonzero/scatter index machinery plus
~8 ms of 1-D up-pass gathers; tile buckets replace all of it with a
handful of (T,)-sized cumsums and 2-D tile-row gathers, keep parent
beam coherence inside the kernels, and leave dead lanes to the
kernels' per-tile guards (tmax 0 lanes cull for free).

Queue sizes shrink with depth on a static capacity schedule
(RenderConfig.{reflect,refract,warp,shadow}_capacity), now counted in
TILES: secondary-ray occupancy decays geometrically with depth, so
scheduled capacities cut the per-frame ray-pass volume several-fold
versus running every level at the primary-ray width.  Tiles beyond a
segment's capacity are dropped (child color falls back to the
transparent miss; overflowing shadow rays count as unblocked) -- drops
are counted per segment in TraceResult.overflow.  Shadow batches
always tile-compact losslessly (capacity 1.0 keeps every live tile).

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
from .intersect import (Hit, intersect_multi, shadow_query_multi,
                        shadow_query_multi_rays)
from .trace import TraceResult, Tracer, _light_arrays
from .vec import reflect as vreflect, vdot, vnorm, vscaleadd

TILE = 1024  # queue granularity: one (8,128) kernel tile


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


def _tile_sel(mask, cap_t):
    """Tile-bucket selection for an element mask of (Tq*TILE,):
    (tidx, inv, n_dropped, n_live) where tidx (cap_t,) lists kept tile
    ids (fill Tq), inv (Tq,) maps a parent tile to its kept slot or -1,
    n_dropped counts masked elements in dropped tiles, and n_live
    counts live tiles (for occupancy instrumentation)."""
    Tq = mask.shape[0] // TILE
    tl = jnp.any(mask.reshape(Tq, TILE), axis=1)
    pos = jnp.cumsum(tl.astype(jnp.int32)) - 1
    keep = tl & (pos < cap_t)
    inv = jnp.where(keep, pos, -1)
    (tidx,) = jnp.nonzero(tl, size=cap_t, fill_value=Tq)
    dropped = jnp.sum(jnp.where(jnp.repeat(tl & ~keep, TILE), mask,
                                False).astype(jnp.int32))
    return tidx, inv, dropped, jnp.sum(tl.astype(jnp.int32))


def _tile_gather(a, tidx, fill=0):
    """Gather whole tiles: a (Tq*TILE, ...) -> (cap_t*TILE, ...)."""
    Tq = a.shape[0] // TILE
    rest = a.shape[1:]
    a2 = a.reshape(Tq, -1)
    out = jnp.take(a2, tidx, axis=0, mode='fill', fill_value=fill)
    return out.reshape((tidx.shape[0] * TILE,) + rest)


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

    def _plan(self, queue_t: int, level: int):
        """Child-queue segment layout spawned from a `queue_t`-TILE
        queue at depth `level`: [(key, tile_offset, tile_cap)], total
        tiles Qt."""
        cc = self.compiled
        cfg = self.config
        s = cfg.secondary_capacity
        refl_f = _lvl(cfg.reflect_capacity, level, s)
        refr_f = _lvl(cfg.refract_capacity, level, s * 0.5)
        warp_f = _lvl(cfg.warp_capacity, level, s * 0.5)

        def cap(frac):
            # the min_tiles floor makes small renders (few tiles, all
            # live) structurally lossless regardless of the fraction
            return max(min(queue_t, cfg.min_tiles), 1,
                       min(int(math.ceil(queue_t * frac)), queue_t))

        segs = []  # (key, tile_offset, tile_cap)
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
        return segs, max(off, 1)

    def _count_overflow(self, overflow, label, dropped, lossless):
        """Record rays dropped by one capped tile selection (ADVICE r1:
        capacity undersizing must be detectable, not silent)."""
        if lossless:
            return  # cap >= queue tiles: structurally lossless
        overflow.append(dropped)
        if label not in self.overflow_labels:
            self.overflow_labels.append(label)

    def _note_occ(self, overflow, label, n_live, Tq):
        """GLOME_OCC=1: report live-tile counts through the overflow
        channel (schedule-tuning instrumentation)."""
        import os
        if not os.environ.get("GLOME_OCC"):
            return
        overflow.append(n_live)
        lbl = f"occ!{label}/of_{Tq}"
        if lbl not in self.overflow_labels:
            self.overflow_labels.append(lbl)

    # -- one DOWN level ------------------------------------------------------

    def _down_level(self, arrays, carry, segs, Qt, level, lights,
                    lpos, lcol, lrad, overflow):
        """Intersect + preshade one level's queue; spawn children into a
        fresh (Qt,)-tile queue laid out by `segs`.  Returns (child
        carry, stored shading inputs).  Every capped tile selection
        appends its dropped-ray count to `overflow` (labels in
        overflow_labels)."""
        co, cd, csid, ctmax = carry
        Qc = co.shape[0]
        Tq = Qc // TILE
        dt = co.dtype
        cc = self.compiled
        hit = intersect_multi(cc, arrays, co, cd, csid, tmax=ctmax)

        # fused per-light shadow batch (preshade, Shader.hs:65-80):
        # per light, live tiles are kept (capacity 1.0 = lossless) and
        # inactive lanes inside kept tiles carry tmax 0, which the
        # kernels cull for free.  shadow_capacity < 1 caps the kept
        # tiles (with overflow accounting).  The whole section works in
        # COMPONENT PLANES ((N,) per coordinate): (N,3) tensors carry a
        # 42x padded-tile layout tax on TPU (each 3-wide row pads to
        # 128 lanes), which made these gathers + the ray-table stack
        # ~25 ms of a 1080p frame; planes make every gather a cheap
        # tile-row gather and the kernel ray table a plain row stack.
        sh_f = _lvl(self.config.shadow_capacity, level, 1.0)
        sh_cap = max(min(Tq, self.config.min_tiles), 1,
                     min(int(math.ceil(Tq * sh_f)), Tq))
        unitz = jnp.zeros((3,), dt).at[2].set(1.0)
        px, py, pz = hit.pos[:, 0], hit.pos[:, 1], hit.pos[:, 2]
        nx, ny, nz = hit.norm[:, 0], hit.norm[:, 1], hit.norm[:, 2]
        sox = px + nx * DELTA
        soy = py + ny * DELTA
        soz = pz + nz * DELTA
        sidf = csid.astype(dt)

        def tg(a, tidx, fill=0):
            """(N,) tile-row gather (planes stay planes)."""
            return jnp.take(a.reshape(Tq, TILE), tidx, axis=0,
                            mode='fill', fill_value=fill).reshape(-1)

        light_pre = []
        sh_segments = []
        for li, l in enumerate(lights):
            lvx = lpos[li, 0] - px
            lvy = lpos[li, 1] - py
            lvz = lpos[li, 2] - pz
            llen = jnp.sqrt(lvx * lvx + lvy * lvy + lvz * lvz)
            lsafe = jnp.maximum(llen, 1e-20)
            ldx, ldy, ldz = lvx / lsafe, lvy / lsafe, lvz / lsafe
            facing = (lvx * nx + lvy * ny + lvz * nz) >= 0.0
            active = hit.hit & facing & (llen <= lrad[li])
            ldir = jnp.stack([ldx, ldy, ldz], axis=-1)
            light_pre.append([llen, ldir, active])
            if not l.shadow:
                continue
            tidx, inv, dropped, n_live = _tile_sel(active, sh_cap)
            self._note_occ(overflow, f"L{level}/shadow{li}", n_live, Tq)
            self._count_overflow(overflow, f"L{level}/shadow{li}",
                                 dropped, sh_cap >= Tq)
            act_g = tg(active, tidx, fill=False)
            rows = jnp.stack([
                tg(sox, tidx), tg(soy, tidx), tg(soz, tidx),
                jnp.where(act_g, tg(ldx, tidx), 0.0),
                jnp.where(act_g, tg(ldy, tidx), 0.0),
                jnp.where(act_g, tg(ldz, tidx), 1.0),
                jnp.where(act_g, tg(llen, tidx) - 2.0 * DELTA, 0.0),
                jnp.where(act_g, tg(sidf, tidx, fill=-1), -1.0)])
            sh_segments.append((li, inv, sh_cap, rows))
        if sh_segments:
            rays_sh = jnp.concatenate([s[3] for s in sh_segments],
                                      axis=1)
            sb = shadow_query_multi_rays(cc, arrays, rays_sh)
            offb = 0
            for li, inv, cap_t, *_ in sh_segments:
                n_seg = cap_t * TILE
                seg = sb[offb:offb + n_seg]
                offb += n_seg
                rows = jnp.take(seg.reshape(cap_t, TILE),
                                jnp.maximum(inv, 0), axis=0, mode='clip')
                blocked = rows.reshape(-1) & jnp.repeat(inv >= 0, TILE)
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
        # each segment keeps only its live tiles; the queue is
        # assembled with ONE concatenate per field
        seg_o, seg_d, seg_sid, seg_tmax = [], [], [], []
        stored_inv = {}
        stored_mask = {}
        stored_extra = {}
        for key, offt, capt in segs:
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
            tidx, inv, dropped, n_live = _tile_sel(mask, capt)
            self._note_occ(overflow, f"L{level}/{key}", n_live, Tq)
            self._count_overflow(overflow, f"L{level}/{key}", dropped,
                                 capt >= Tq)
            stored_inv[key] = inv
            stored_mask[key] = mask
            mask_g = _tile_gather(mask, tidx)
            seg_o.append(_tile_gather(ro, tidx))
            nd = _tile_gather(rd, tidx)
            seg_d.append(jnp.where(mask_g[:, None], nd, unitz))
            seg_sid.append(jnp.where(mask_g,
                                     _tile_gather(rsid, tidx, fill=-1), -1))
            seg_tmax.append(jnp.where(mask_g, INFINITY, 0.0).astype(dt))

        used = sum(capt for _, _, capt in segs)
        pad = (Qt - used) * TILE
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
            inv=stored_inv, mask=stored_mask, extra=stored_extra,
        )
        return (no, nd, nsid, ntmax), stored

    # -- one UP level ----------------------------------------------------

    def _up_level(self, stored, segs, color_next, t_next, lights):
        Qc = stored["t"].shape[0]
        dt = stored["pos"].dtype
        L = len(lights)
        children = {}
        # one 5-column (color, t) table per level, read back by TILE
        # rows: 1-D T(1024) gathers measured ~5x slower than 2-D row
        # gathers at these widths (tools/PERF_BUDGET.md)
        ct5 = jnp.concatenate([color_next, t_next[:, None]], axis=-1)
        ct5t = ct5.reshape(ct5.shape[0] // TILE, TILE * 5)
        for key, offt, capt in segs:
            inv = stored["inv"][key]             # (Tq,) kept slot or -1
            mask = stored["mask"][key]
            rows = jnp.take(ct5t, offt + jnp.maximum(inv, 0), axis=0,
                            mode='clip')
            rows = rows.reshape(-1, 5)
            has = mask & jnp.repeat(inv >= 0, TILE)
            ccol = jnp.where(has[:, None], rows[:, :4], 0.0)
            ct = jnp.where(has, rows[:, 4], INFINITY)
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

        # pad the root queue to TILE granularity with dead rays
        Np = (N + TILE - 1) // TILE * TILE
        if tmax is None:
            tmax = jnp.full((N,), INFINITY, dtype=dt)
        if Np != N:
            pad = Np - N
            o = jnp.concatenate([o, jnp.zeros((pad, 3), dt)])
            d = jnp.concatenate(
                [d, jnp.zeros((pad, 3), dt).at[:, 2].set(1.0)])
            tmax = jnp.concatenate([tmax, jnp.zeros((pad,), dt)])
        carry = (o, d, jnp.full((Np,), scene_id, jnp.int32), tmax)
        stored_levels = []
        seg_plans = []
        overflow = []
        self.overflow_labels = []
        for level in range(R):
            segs, Qt = self._plan(carry[0].shape[0] // TILE, level)
            carry, stored = self._down_level(arrays, carry, segs, Qt,
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

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

Queue layout (round 4): every queue is ONE tile-major 8-channel table
of shape (Qt, 8, 8, 128): tile t, channel c in [ox,oy,oz,dx,dy,dz,
tmax,sid], lane block (8, 128).  The round-3 frame trace attributed
~35 ms (half the frame) to XLA layout glue: 16 per-component
(Tq, 1024) tile gathers per level for the shadow rows, (8, N) row
stacks re-tiled to the kernels' (8, T, 8, 128) blocks, and ~30
f32[N,3] copies.  With the table form the kernels read tiles straight
from the queue (BlockSpec (1, 8, 8, 128)), tile compaction is one
jnp.take per segment, and all per-ray math runs on flat (N,)
component planes whose (Qt, 8, 128) reshape is layout-free.

Queue sizes shrink with depth on a static capacity schedule
(RenderConfig.{reflect,refract,warp,shadow}_capacity), counted in
TILES: a segment keeps a tile iff ANY of its parents spawns that
child kind; within a kept tile children sit at their parents'
positions; dead lanes carry tmax 0 which the kernels cull for free.
Tiles beyond a segment's capacity are dropped (child color falls back
to the transparent miss; overflowing shadow rays count as unblocked)
-- drops are counted per segment in TraceResult.overflow.  Shadow
batches always tile-compact losslessly (capacity 1.0 keeps every
live tile).

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
from .intersect import Hit, intersect_multi_table, shadow_query_table
from .trace import TraceResult, Tracer, _light_arrays

TILE = 1024  # kernel tile: one (8,128) vector block
ROW = 128    # queue granularity: one 128-lane vector row

# Round 5: queue selection moved from TILE (1024-lane) to ROW
# (128-lane) granularity.  Measured on the chip (tools/micro_gather.py
# probe): whole-row jnp.take on a (R, 128) view is free at frame
# scale, while per-LANE gathers cost ~1 ms per 128k-element channel --
# so 128 lanes is the finest granularity the XLA gather path serves
# at full bandwidth.  Row occupancy of the TestScene child queues runs
# 1.5-3x above tile occupancy (GLOME_OCC=2: L1 shadow 1037 live rows
# vs 186 live tiles * 8; L2 reflect 97 rows vs 35 tiles * 8), and a
# launched-but-dead tile still pays the kernel's per-phase gate
# prologue, so row compaction shrinks the launched width of every
# child and shadow launch by the same factor.


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


def _row_sel(mask, cap_r):
    """Row-bucket selection for an element mask of (R*ROW,):
    (ridx, inv, n_dropped, n_live) where ridx (cap_r,) lists kept
    128-lane row ids (fill R), inv (R,) maps a parent row to its kept
    slot or -1, n_dropped counts masked elements in dropped rows, and
    n_live counts live rows (for occupancy instrumentation)."""
    R = mask.shape[0] // ROW
    rl = jnp.any(mask.reshape(R, ROW), axis=1)
    pos = jnp.cumsum(rl.astype(jnp.int32)) - 1
    keep = rl & (pos < cap_r)
    inv = jnp.where(keep, pos, -1)
    (ridx,) = jnp.nonzero(rl, size=cap_r, fill_value=R)
    dropped = jnp.sum(jnp.where(jnp.repeat(rl & ~keep, ROW), mask,
                                False).astype(jnp.int32))
    return ridx, inv, dropped, jnp.sum(rl.astype(jnp.int32))


def _take_rows(plane, ridx):
    """Whole-row compaction of one flat (N,) channel plane:
    -> (cap_r, 128); out-of-range ridx rows fill with zeros (dead
    rows: tmax 0, sid 0 -> the kernels cull them lane-wise for free;
    sid 0 is harmless because tmax 0 already makes every candidate
    fail t < tmax)."""
    R = plane.shape[0] // ROW
    return jnp.take(plane.reshape(R, ROW), ridx, axis=0, mode='fill',
                    fill_value=0)


def _mk_table(channels, Tq):
    """Stack 8 flat (N,) channel planes into the (Tq, 8, 8, 128)
    tile-major queue table (one copy; every other hop is layout-free)."""
    return jnp.stack([c.reshape(Tq, 8, 128) for c in channels], axis=1)


def _rows_to_table(rows_by_ch, Qr):
    """Assemble 8 channel row lists (each a list of (r_i, 128) blocks
    summing to <= Qr rows) into the (Qr/8, 8, 8, 128) tile-major
    queue table.  Missing rows pad dead (tmax 0, dz 1, sid -1)."""
    Qt = Qr // 8
    planes = []
    for c, parts in enumerate(rows_by_ch):
        have = sum(p.shape[0] for p in parts)
        if have < Qr:
            fill = 1.0 if c == 5 else (-1.0 if c == 7 else 0.0)
            parts = parts + [jnp.full((Qr - have, ROW), fill,
                                      parts[0].dtype)]
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        planes.append(cat.reshape(Qt, 8, 128))
    return jnp.stack(planes, axis=1)


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
        queue at depth `level`: [(key, row_offset, row_cap)] in
        128-lane ROW units, plus the total child queue rows Qr
        (padded to a whole number of kernel tiles)."""
        cc = self.compiled
        cfg = self.config
        queue_r = queue_t * (TILE // ROW)
        s = cfg.secondary_capacity
        refl_f = _lvl(cfg.reflect_capacity, level, s)
        refr_f = _lvl(cfg.refract_capacity, level, s * 0.5)
        warp_f = _lvl(cfg.warp_capacity, level, s * 0.5)

        def cap(frac):
            # the min_tiles floor makes small renders (few tiles, all
            # live) structurally lossless regardless of the fraction
            return max(min(queue_r, cfg.min_tiles * (TILE // ROW)), 1,
                       min(int(math.ceil(queue_r * frac)), queue_r))

        segs = []  # (key, row_offset, row_cap)
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
        rows = max(off, 1)
        per_t = TILE // ROW
        return segs, ((rows + per_t - 1) // per_t) * per_t

    def _count_overflow(self, overflow, label, dropped, lossless):
        """Record rays dropped by one capped tile selection (ADVICE r1:
        capacity undersizing must be detectable, not silent)."""
        if lossless:
            return  # cap >= queue tiles: structurally lossless
        overflow.append(dropped)
        if label not in self.overflow_labels:
            self.overflow_labels.append(label)

    def _note_occ(self, overflow, label, n_live, Tq, mask=None):
        """GLOME_OCC=1: report live-tile counts through the overflow
        channel (schedule-tuning instrumentation).  GLOME_OCC=2 adds
        live-ROW (128-lane) and live-LANE counts from `mask`."""
        import os
        lvl = os.environ.get("GLOME_OCC")
        if not lvl:
            return
        overflow.append(n_live)
        lbl = f"occ!{label}/of_{Tq}"
        if lbl not in self.overflow_labels:
            self.overflow_labels.append(lbl)
        if lvl == "2" and mask is not None:
            nrow = mask.shape[0] // 128
            overflow.append(jnp.sum(jnp.any(
                mask.reshape(nrow, 128), axis=1).astype(jnp.int32)))
            overflow.append(jnp.sum(mask.astype(jnp.int32)))
            for suff, tot in (("rows", nrow), ("lanes", mask.shape[0])):
                lbl = f"occ!{label}.{suff}/of_{tot}"
                if lbl not in self.overflow_labels:
                    self.overflow_labels.append(lbl)

    # -- one DOWN level ------------------------------------------------------

    def _down_level(self, arrays, Q, segs, Qr, level, lights,
                    lpos, lcol, lrad, overflow, last=False):
        """Intersect + preshade one level's queue table; spawn children
        into a fresh (Qr,)-row queue table laid out by `segs`.
        Returns (child table, stored shading inputs).  Every capped
        row selection appends its dropped-ray count to `overflow`
        (labels in overflow_labels).  All per-ray math runs on flat
        (N,) component planes.  `last` marks the deepest level, whose
        children are never traced: child-queue construction is skipped
        and the up pass substitutes the transparent miss directly."""
        Tq = Q.shape[0]
        Qc = Tq * TILE
        Rq = Qc // ROW
        dt = Q.dtype
        cc = self.compiled
        hit = intersect_multi_table(cc, arrays, Q)

        def ch(c):
            return Q[:, c].reshape(Qc)

        cdx, cdy, cdz = ch(3), ch(4), ch(5)
        sidf = ch(7)
        px, py, pz = hit.pos[:, 0], hit.pos[:, 1], hit.pos[:, 2]
        nx, ny, nz = hit.norm[:, 0], hit.norm[:, 1], hit.norm[:, 2]
        sox = px + nx * DELTA
        soy = py + ny * DELTA
        soz = pz + nz * DELTA

        # fused per-light shadow batch (preshade, Shader.hs:65-80):
        # per light, live ROWs are kept (capacity 1.0 = lossless) and
        # inactive lanes inside kept rows carry tmax 0, which the
        # kernels cull for free.  shadow_capacity < 1 caps the kept
        # rows (with overflow accounting).
        per_t = TILE // ROW
        sh_f = _lvl(self.config.shadow_capacity, level, 1.0)
        sh_cap = max(min(Rq, self.config.min_tiles * per_t), 1,
                     min(int(math.ceil(Rq * sh_f)), Rq))

        light_pre = []
        sh_segments = []
        sh_rows = [[] for _ in range(8)]
        for li, l in enumerate(lights):
            lvx = lpos[li, 0] - px
            lvy = lpos[li, 1] - py
            lvz = lpos[li, 2] - pz
            llen = jnp.sqrt(lvx * lvx + lvy * lvy + lvz * lvz)
            lsafe = jnp.maximum(llen, 1e-20)
            ldx, ldy, ldz = lvx / lsafe, lvy / lsafe, lvz / lsafe
            facing = (lvx * nx + lvy * ny + lvz * nz) >= 0.0
            active = hit.hit & facing & (llen <= lrad[li])
            light_pre.append([llen, (ldx, ldy, ldz), active])
            if not l.shadow:
                continue
            ridx, inv, dropped, n_live = _row_sel(active, sh_cap)
            self._note_occ(overflow, f"L{level}/shadow{li}", n_live, Rq,
                           mask=active)
            self._count_overflow(overflow, f"L{level}/shadow{li}",
                                 dropped, sh_cap >= Rq)
            chans = [sox, soy, soz,
                     jnp.where(active, ldx, 0.0),
                     jnp.where(active, ldy, 0.0),
                     jnp.where(active, ldz, 1.0),
                     jnp.where(active, llen - 2.0 * DELTA, 0.0),
                     jnp.where(active, sidf, -1.0)]
            for c in range(8):
                sh_rows[c].append(_take_rows(chans[c], ridx))
            sh_segments.append((li, inv, sh_cap))
        if sh_segments:
            Sr = len(sh_segments) * sh_cap
            Srp = ((Sr + per_t - 1) // per_t) * per_t
            sb = shadow_query_table(
                cc, arrays, _rows_to_table(sh_rows, Srp))
            sbr = sb.reshape(-1, ROW)                 # (Srp, 128) rows
            offb = 0
            for li, inv, cap_r in sh_segments:
                rows = jnp.take(sbr[offb:offb + cap_r],
                                jnp.maximum(inv, 0), axis=0,
                                mode='clip')          # (Rq, 128)
                offb += cap_r
                blocked = (rows.reshape(Qc)
                           & jnp.repeat(inv >= 0, ROW))
                light_pre[li][2] = light_pre[li][2] & ~blocked
        if light_pre:
            contrib = jnp.stack(
                [jnp.where(a[:, None],
                           lcol[li] * lights[li].falloff_at(ll)[:, None],
                           0.0)
                 for li, (ll, ld, a) in enumerate(light_pre)])
            ldirs = jnp.stack(
                [jnp.stack(ld, axis=-1) for ll, ld, a in light_pre])
            lactive = jnp.stack([a for ll, ld, a in light_pre])
        else:
            contrib = jnp.zeros((0, Qc, 3), dt)
            ldirs = jnp.zeros((0, Qc, 3), dt)
            lactive = jnp.zeros((0, Qc), bool)

        # ---- spawn children into the fixed queue segments -----------
        # each segment builds its 8 channel planes and keeps only its
        # live 128-lane rows; all segments' rows concatenate into one
        # tile-major table
        child_rows = [[] for _ in range(8)]
        stored_inv = {}
        stored_mask = {}
        stored_extra = {}
        for key, offt, capt in segs:
            if key == "reflect":
                mask = hit.hit & self._stack_uses(hit.tex_stack,
                                                  self.reflect_texids)
                ddn = cdx * nx + cdy * ny + cdz * nz
                rdx = cdx - 2.0 * ddn * nx
                rdy = cdy - 2.0 * ddn * ny
                rdz = cdz - 2.0 * ddn * nz
                rox = px + rdx * DELTA
                roy = py + rdy * DELTA
                roz = pz + rdz * DELTA
                rsid = sidf
            elif key.startswith("refract_"):
                mi = int(key.split("_")[-1])
                m = cc.refract_mats[mi]
                active = hit.hit & self._stack_uses(
                    hit.tex_stack, self.refract_texids[mi])
                ndd = nx * cdx + ny * cdy + nz * cdz
                eta = jnp.where(-ndd > 0.0, m.ior, 1.0 / m.ior)
                c1 = ndd
                cs2 = 1.0 - eta * eta * (1.0 - c1 * c1)
                tir = cs2 < 0.0
                coef = eta * c1 - jnp.sqrt(jnp.maximum(cs2, 0.0))
                rdx = cdx * eta + nx * coef
                rdy = cdy * eta + ny * coef
                rdz = cdz * eta + nz * coef
                stored_extra[f"refract_active_{mi}"] = active
                stored_extra[f"refract_tir_{mi}"] = tir
                mask = active & ~tir
                rox = px + rdx * DELTA
                roy = py + rdy * DELTA
                roz = pz + rdz * DELTA
                rsid = sidf
            elif key.startswith("warp_frame_"):
                wi = int(key.split("_")[-1])
                active = hit.hit & self._stack_uses(
                    hit.tex_stack, self.warp_texids[wi])
                stored_extra[f"warp_active_{wi}"] = active
                mask = active
                rox, roy, roz = (hit.obj_o[:, 0], hit.obj_o[:, 1],
                                 hit.obj_o[:, 2])
                rdx, rdy, rdz = (hit.obj_d[:, 0], hit.obj_d[:, 1],
                                 hit.obj_d[:, 2])
                rsid = jnp.full((Qc,), float(cc.warp_mats[wi].frame_scene),
                                dt)
            else:  # warp_target
                wi = int(key.split("_")[-1])
                w = cc.warp_mats[wi]
                mask = stored_extra[f"warp_active_{wi}"]
                # expression shapes kept IDENTICAL to the round-3 path
                # (einsum over stacked (N,3), vnorm before AND after
                # the matrix): the portal view is boundary-dense (the
                # whole lattice at small scale), so even FMA-contraction
                # differences in this math flip thousands of pixels
                from .vec import vnorm
                fwd = jnp.asarray(np.asarray(w.xfm.fwd), dtype=dt)
                pos3 = jnp.stack([px, py, pz], axis=-1)
                d3 = jnp.stack([cdx, cdy, cdz], axis=-1)
                ro3 = jnp.einsum('ij,nj->ni', fwd[:, :3], pos3) + fwd[:, 3]
                rd3 = vnorm(jnp.einsum('ij,nj->ni', fwd[:, :3],
                                       vnorm(d3)))
                rox, roy, roz = ro3[:, 0], ro3[:, 1], ro3[:, 2]
                rdx, rdy, rdz = rd3[:, 0], rd3[:, 1], rd3[:, 2]
                rsid = jnp.full((Qc,), float(w.target_scene), dt)
            stored_mask[key] = mask
            if last:
                # deepest level: children are never traced (their color
                # is the transparent miss, Trace.hs:60), so the queue
                # table, row selection, and gathers are all dead work
                stored_inv[key] = None
                continue
            ridx, inv, dropped, n_live = _row_sel(mask, capt)
            self._note_occ(overflow, f"L{level}/{key}", n_live, Rq,
                           mask=mask)
            self._count_overflow(overflow, f"L{level}/{key}", dropped,
                                 capt >= Rq)
            stored_inv[key] = inv
            chans = [rox, roy, roz,
                     jnp.where(mask, rdx, 0.0),
                     jnp.where(mask, rdy, 0.0),
                     jnp.where(mask, rdz, 1.0),
                     jnp.where(mask, INFINITY, 0.0).astype(dt),
                     jnp.where(mask, rsid, -1.0)]
            for c in range(8):
                child_rows[c].append(_take_rows(chans[c], ridx))

        if last:
            Qnext = jnp.zeros((1, 8, 8, 128), dt).at[:, 5].set(1.0) \
                .at[:, 7].set(-1.0)
        elif not child_rows[0]:
            child_rows = [[jnp.full((Qr, ROW),
                                    1.0 if c == 5 else
                                    (-1.0 if c == 7 else 0.0), dt)]
                          for c in range(8)]
            Qnext = _rows_to_table(child_rows, Qr)
        else:
            Qnext = _rows_to_table(child_rows, Qr)

        stored = dict(
            t=hit.t, hitmask=hit.hit, pos=hit.pos, norm=hit.norm,
            d=jnp.stack([cdx, cdy, cdz], axis=-1),
            tex=hit.tex_stack, tag=hit.tag_stack,
            serial=hit.prim_serial,
            contrib=contrib, ldirs=ldirs, lactive=lactive,
            inv=stored_inv, mask=stored_mask, extra=stored_extra,
        )
        return Qnext, stored

    # -- one UP level ----------------------------------------------------

    def _up_level(self, stored, segs, color_next, t_next, lights):
        Qc = stored["t"].shape[0]
        dt = stored["pos"].dtype
        L = len(lights)
        children = {}
        # five flat child-result planes viewed as (rows, 128), read
        # back by whole-ROW gathers (per-lane and (N, 5) layouts
        # measured 0.3-1 ms per hop, tools/PERF_BUDGET.md)
        ct_rows = [color_next[:, 0].reshape(-1, ROW),
                   color_next[:, 1].reshape(-1, ROW),
                   color_next[:, 2].reshape(-1, ROW),
                   color_next[:, 3].reshape(-1, ROW),
                   t_next.reshape(-1, ROW)]
        for key, offr, capr in segs:
            inv = stored["inv"][key]             # (Rq,) kept slot or -1
            mask = stored["mask"][key]
            if inv is None:
                # deepest level: every child is the transparent miss
                ccol = C.ca_transparent((Qc,), dt)
                ct = jnp.full((Qc,), INFINITY, dtype=dt)
            else:
                idx = jnp.minimum(offr + jnp.maximum(inv, 0),
                                  ct_rows[0].shape[0] - 1)
                rows = [jnp.take(p, idx, axis=0) for p in ct_rows]
                has = mask & jnp.repeat(inv >= 0, ROW)
                ccol = jnp.where(
                    has[:, None],
                    jnp.stack([rows[c].reshape(Qc) for c in range(4)],
                              axis=-1), 0.0)
                ct = jnp.where(has, rows[4].reshape(Qc), INFINITY)
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

        # pad the root queue to TILE granularity with dead rays and
        # build the root table
        Tq = (N + TILE - 1) // TILE
        Np = Tq * TILE
        if tmax is None:
            tmax = jnp.full((N,), INFINITY, dtype=dt)

        def padded(a, fill=0.0):
            if Np == N:
                return a
            return jnp.concatenate(
                [a, jnp.full((Np - N,), fill, a.dtype)])

        Q = _mk_table([
            padded(o[:, 0]), padded(o[:, 1]), padded(o[:, 2]),
            padded(d[:, 0]), padded(d[:, 1]), padded(d[:, 2], 1.0),
            padded(tmax, 0.0),
            jnp.full((Np,), float(scene_id), dt) if Np == N else
            padded(jnp.full((N,), float(scene_id), dt), -1.0)], Tq)
        stored_levels = []
        seg_plans = []
        overflow = []
        self.overflow_labels = []
        for level in range(R):
            segs, Qt = self._plan(Q.shape[0], level)
            Q, stored = self._down_level(arrays, Q, segs, Qt,
                                         level, lights,
                                         lpos, lcol, lrad, overflow,
                                         last=(level == R - 1))
            stored_levels.append(stored)
            seg_plans.append(segs)

        # deepest level's children are never traced: transparent miss,
        # i.e. trace at recursion 0 (Trace.hs:60)
        Qdeep = Q.shape[0] * TILE
        color = C.ca_transparent((Qdeep,), dt)
        t = jnp.full((Qdeep,), INFINITY, dtype=dt)
        for level in reversed(range(R)):
            color, t = self._up_level(stored_levels[level],
                                      seg_plans[level], color, t, lights)

        s0 = stored_levels[0]
        ov = jnp.stack(overflow) if overflow else None
        return TraceResult(color[:N], s0["t"][:N], s0["tag"][:N],
                           s0["serial"][:N], ov)

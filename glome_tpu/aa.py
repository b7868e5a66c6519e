"""Adaptive subsample/supersample antialiasing.

Port of the reference's 5-pass mutable tile stencil
(GlomeView/Glome.hs:226-323) as masked, compacted vector passes over
the whole frame at once:

  pass 1: trace every 4th even-grid pixel ((x+y) % 4 == 0)
  pass 2: remaining even-grid pixels: trace if the +-2 axis neighbors
          vary more than threshold1, else interpolate
  pass 3: odd-diagonal pixels vs their 4 diagonal neighbors (threshold2)
  pass 4: remaining pixels vs their 4 axis neighbors (threshold3)
  pass 5: supersample at every pixel corner (x+.5, y+.5) when the 2x2
          cell varies (threshold4), averaging corner + cell
          (Glome.hs:299-321) -> at most 2 rays/pixel, as few as 1/8

Out-of-tile neighbor reads are transparent-infinite (Glome.hs:233-235),
so tiles behave independently exactly like the reference's parMap over
tiles.  Layout (round 4): the working image is ONE channel-major
(5, Hp, Wp) array over the tile-padded frame.  The previous
(T, S, S, 5) layout put the 5-wide channel axis in the lane dimension,
so every neighbor shift / decide / average op paid a ~25x padding tax
on TPU; full-frame planes are natively (8,128)-tileable and tile
independence is enforced by static boundary masks instead of physical
tile axes.  Per-pass trace batches are compacted to occupancy-tuned
static caps (RenderConfig.aa_caps, measured on the benchmark scene
with margin); overflowing pixels keep their interpolated value
(passes 2-4) or their averaged corner (pass 5) and are counted in
self.last_overflow -- the same detectable-degradation contract as the
wavefront queue schedule.

The variance metric cCmp (Glome.hs:179-189) sums absolute rgba deltas
plus a proportional depth term.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import INFINITY, RenderConfig
from .trace import Tracer, compact_indices, compact_ranks, scatter
from .render import Camera, pixel_coords, primary_rays

# conservative default per-pass capacity (fractions of padded pixels):
# the structural maxima of the reference stencil
AA_CAPS_FULL = (0.125, 0.125, 0.25, 0.5, 0.5)


def _ccmp(a, b):
    """Color+depth variance between two (5, ...) TColor plane stacks."""
    diff = jnp.sum(jnp.abs(a[:4] - b[:4]), axis=0)
    d1, d2 = a[4], b[4]
    mx = jnp.maximum(d1, d2)
    mn = jnp.minimum(d1, d2)
    muldiff = jnp.where((d1 == 0.0) & (d2 == 0.0), 0.0,
                        jnp.where(mn == 0.0, jnp.inf, mx / mn - 1.0))
    return diff + muldiff


def _cavg(*cs):
    return sum(cs) / float(len(cs))


class AARenderer:
    """Adaptive-AA frame renderer for one compiled scene."""

    def __init__(self, tracer: Tracer, cam: Camera, config: RenderConfig):
        import dataclasses as _dc
        # the wavefront queue floor (min_tiles, sized for full frames)
        # would pad every sub-frame AA pass's child queues to 24 tiles
        # per segment; AA passes are small, so use a small floor.  AA
        # batches hold only EDGE pixels, whose secondary-ray occupancy
        # runs above a full frame's, so the child-queue fractions are
        # widened 1.6x (surfaced overflow counters police the rest).
        def _scale(v, f):
            if v is None:
                return None
            if isinstance(v, (int, float)):
                return min(1.0, float(v) * f)
            return tuple(min(1.0, float(x) * f) for x in v)
        if (getattr(tracer, "compiled", None) is not None
                and config.min_tiles > 4):
            # per-kind widening factors from measured AA batch
            # occupancy (GLOME_OCC=2 on the 720x480 benchmark frame):
            # edge batches reflect at ~0.61 of lanes' rows (frame
            # schedule: 0.45), refract ~0.06 (0.025) and warp ~0.19
            # (0.065) -- edges concentrate exactly where secondary
            # rays spawn
            cfg_aa = _dc.replace(
                config, min_tiles=4,
                reflect_capacity=_scale(config.reflect_capacity, 1.8),
                refract_capacity=_scale(config.refract_capacity, 2.8),
                warp_capacity=_scale(config.warp_capacity, 4.0),
                # shadow drops LEAK LIGHT (overflowing shadow rays
                # count as unblocked); edge batches run well above the
                # full frame's shadow occupancy, so AA shadows stay
                # lossless
                shadow_capacity=None)
            tracer = type(tracer)(tracer.compiled, cfg_aa)
        self.tracer = tracer
        self.cam = cam
        self.config = config
        self._jit = jax.jit(self._render)

    # -- helpers -----------------------------------------------------------

    def _trace_pixels(self, arrays, xf, yf, live=None, off=0.0):
        """Trace rays for global float pixel coords; returns ((cap, 5)
        TColors (r, g, b, a, depth), wavefront queue drops).  `live`
        masks dead lanes out of the trace via tmax=0 (the kernels cull
        them for free)."""
        cfg = self.config
        xc, yc = pixel_coords(cfg.xres, cfg.yres, xf + off, yf + off)
        o, d = primary_rays(self.cam, xc, yc)
        tmax = None
        if live is not None:
            tmax = jnp.where(live, jnp.float32(INFINITY), 0.0)
        res = self.tracer.trace(arrays, o, d, tmax=tmax)
        ov = (jnp.int32(0) if res.overflow is None
              else jnp.sum(res.overflow))
        return (jnp.concatenate([res.color, res.t[:, None]], axis=-1),
                ov, res.overflow)

    def _masked_trace(self, arrays, img, mask, cap, off=0.0):
        """Trace where mask (Hp, Wp) is set, up to `cap` rays; scatter
        the results into the (5, Hp, Wp) plane stack.  Returns
        (img', req, cap_drop, wf_drop, wf_drop_vector).

        Pixel coords come from index ARITHMETIC, not coordinate-table
        gathers (per-lane gathers measured ~1 ms per 128k elements).
        Compaction runs in BEAM-MAJOR order -- (8, 65) raster patches
        flattened block-by-block -- so a compacted 1024-lane kernel
        tile holds edge pixels from ~2 adjacent image patches instead
        of full-width raster rows; scattered batches were paying a
        large BVH-frontier incoherence tax per tile."""
        Hp, Wp = mask.shape
        n = Hp * Wp
        BH = 8 if Hp % 8 == 0 else Hp
        BW = 65 if Wp % 65 == 0 else Wp
        nby, nbx = Hp // BH, Wp // BW

        def to_beam(p):
            lead = p.shape[:-2]
            return (p.reshape(*lead, nby, BH, nbx, BW)
                    .swapaxes(-3, -2).reshape(*lead, n))

        flat = to_beam(mask)
        req = jnp.sum(flat.astype(jnp.int32))
        cap_drop = jnp.maximum(req - cap, 0)
        ranks = compact_ranks(flat)
        idx = compact_indices(flat, cap, ranks=ranks)
        live = idx < n
        blk = idx // (BH * BW)
        within = idx % (BH * BW)
        xf = ((blk % nbx) * BW + within % BW).astype(jnp.float32)
        yf = jnp.minimum((blk // nbx) * BH + within // BW,
                         Hp - 1).astype(jnp.float32)
        tc, wf_ov, wf_vec = self._trace_pixels(arrays, xf, yf,
                                               live=live, off=off)
        traced = flat & (ranks < cap)
        imgb = to_beam(img)                       # (5, n) beam-major
        out = []
        for c in range(5):
            pl = scatter(imgb[c], idx, tc[:, c])
            out.append(jnp.where(traced, pl, imgb[c]))
        img2 = (jnp.stack(out).reshape(5, nby, nbx, BH, BW)
                .swapaxes(2, 3).reshape(5, Hp, Wp))
        return img2, req, cap_drop, wf_ov, wf_vec

    def _shift(self, img, dx, dy, okmask):
        """Neighbor read at (+dx, +dy) with out-of-tile = transparent-
        infinite (Glome.hs:233-235): shift the plane stack, then apply
        the static tile-boundary mask."""
        _, Hp, Wp = img.shape
        pad = jnp.pad(img, ((0, 0), (2, 2), (2, 2)))
        sh = pad[:, 2 + dy:2 + dy + Hp, 2 + dx:2 + dx + Wp]
        oob = jnp.zeros((5, 1, 1), img.dtype).at[4].set(INFINITY)
        return jnp.where(okmask[None], sh, oob)

    # -- the pipeline ------------------------------------------------------

    def _render(self, arrays):
        cfg = self.config
        S = cfg.blocksize
        tx = math.ceil(cfg.xres / S)
        ty = math.ceil(cfg.yres / S)
        Hp, Wp = ty * S, tx * S
        th1, th2, th3, th4 = cfg.thresholds
        n_pix = Hp * Wp
        caps = cfg.aa_caps or AA_CAPS_FULL

        def cap(i):
            return max(1024, int(math.ceil(caps[i] * n_pix / 1024.0))
                       * 1024)

        # static mask planes (numpy constants)
        y, x = np.mgrid[0:Hp, 0:Wp]
        lx, ly = x % S, y % S

        def okmask(dx, dy):
            return jnp.asarray((lx + dx >= 0) & (lx + dx < S)
                               & (ly + dy >= 0) & (ly + dy < S))

        even = (x % 2 == 0) & (y % 2 == 0)

        counts = []
        overflow = []
        img = jnp.zeros((5, Hp, Wp), jnp.float32).at[4].set(INFINITY)

        # passes 1-4 as ONE lax.scan over stacked per-pass constants:
        # the wavefront trace inlines once instead of four times (the
        # AA chain's compile time was dominated by 5 full-depth
        # wavefront inlines at 5 distinct launch widths; the scan also
        # forces one SHARED width, so the Mosaic kernels compile once).
        # Pass 1 has no decide step: its threshold sentinel (-1)
        # forces need = mask.
        m1 = even & ((x + y) % 4 == 0)
        m2 = even & ((x + y) % 4 == 2)
        m3 = (x % 2 == 1) & (y % 2 == 1)
        m4 = (x + y) % 2 == 1
        masks = jnp.asarray(np.stack([m1, m2, m3, m4]))
        offs = jnp.asarray([
            [[-2, 0], [0, 2], [2, 0], [0, -2]],   # pass1 (forced: unused)
            [[-2, 0], [0, 2], [2, 0], [0, -2]],   # pass2: axis +-2
            [[-1, -1], [1, -1], [1, 1], [-1, 1]],  # pass3: diagonals
            [[-1, 0], [0, 1], [1, 0], [0, -1]],   # pass4: axis +-1
        ], jnp.int32)
        ths = jnp.asarray([-1.0, th1, th2, th3], jnp.float32)
        cap14 = max(cap(i) for i in range(4))
        lxj = jnp.asarray(lx)
        lyj = jnp.asarray(ly)
        oob = jnp.zeros((5, 1, 1), jnp.float32).at[4].set(INFINITY)

        def shift_dyn(img, dx, dy):
            padimg = jnp.pad(img, ((0, 0), (2, 2), (2, 2)))
            sh = jax.lax.dynamic_slice(padimg, (0, 2 + dy, 2 + dx),
                                       (5, Hp, Wp))
            ok = ((lxj + dx >= 0) & (lxj + dx < S)
                  & (lyj + dy >= 0) & (lyj + dy < S))
            return jnp.where(ok[None], sh, oob)

        def body(img, spec):
            mask, of, th = spec
            a, b, c, d = [shift_dyn(img, of[i, 0], of[i, 1])
                          for i in range(4)]
            variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
            need = mask & ((th < 0.0) | (variance > th))
            interp = _cavg(a, b, c, d)
            img = jnp.where((mask & ~need)[None], interp, img)
            img, req, cd, wf_ov, wf_vec = self._masked_trace(
                arrays, img, need, cap14)
            return img, (req, cd, wf_ov, wf_vec)

        img, (reqs, cds, wf_ovs, wf_vecs) = jax.lax.scan(
            body, img, (masks, offs, ths))
        for i in range(4):
            counts.append((f"pass{i+1}", reqs[i]))
            overflow.append((f"pass{i+1}", cds[i]))
            overflow.append((f"pass{i+1}/wf", wf_ovs[i]))
            if wf_vecs is not None:
                overflow.append((f"pass{i+1}/wf_detail", wf_vecs[i]))

        # pass 5: supersample at pixel corners and average (Glome.hs:299-321)
        a = img
        b = self._shift(img, 0, 1, okmask(0, 1))
        c = self._shift(img, 1, 1, okmask(1, 1))
        d = self._shift(img, 1, 0, okmask(1, 0))
        variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
        need = variance > th4
        corner = _cavg(a, b, c, d)
        corner, req5, cd5, wf5, wfv5 = self._masked_trace(
            arrays, corner, need, cap(4), off=0.5)
        counts.append(("pass5", req5))
        overflow.append(("pass5", cd5))
        overflow.append(("pass5/wf", wf5))
        if wfv5 is not None:
            overflow.append(("pass5/wf_detail", wfv5))
        last = S - 1
        xe = jnp.asarray(lx == last)
        ye = jnp.asarray(ly == last)
        cell = jnp.where(xe[None],
                         jnp.where(ye[None], corner, _cavg(a, b)),
                         jnp.where(ye[None], _cavg(a, d),
                                   _cavg(a, b, c, d)))
        out = jnp.where((xe & ye)[None], corner, _cavg(corner, cell))

        frame = out[:, :cfg.yres, :cfg.xres]
        rgb = jnp.moveaxis(frame[:3], 0, -1) * frame[3][..., None]
        return (jnp.clip(rgb, 0.0, 1.0), frame[4],
                {k: v for k, v in counts},
                {k: v for k, v in overflow})

    def render(self, arrays):
        """Full adaptive-AA frame: returns ((H, W, 3) rgb, (H, W)
        depth).  Per-pass requested-ray counts (the reference's
        1/8..2 rays/px cost model) land in self.last_ray_counts;
        requests dropped by the static caps in self.last_overflow
        (any nonzero entry means under-refinement: widen
        RenderConfig.aa_caps)."""
        rgb, depth, counts, overflow = self._jit(arrays)
        self.last_ray_counts = {k: int(v) for k, v in counts.items()}
        self.last_overflow = {}
        self.last_overflow_detail = {}
        labels = getattr(self.tracer, "overflow_labels", [])
        for k, v in overflow.items():
            if k.endswith("/wf_detail"):
                vec = np.asarray(v)
                for lbl, n in zip(labels, vec):
                    if int(n):
                        self.last_overflow_detail[
                            f"{k[:-10]}:{lbl}"] = int(n)
            else:
                self.last_overflow[k] = int(v)
        return rgb, depth

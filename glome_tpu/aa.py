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
from .trace import Tracer, compact_indices, gather, scatter
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
        def _scale(v, f=1.6):
            if v is None:
                return None
            if isinstance(v, (int, float)):
                return min(1.0, float(v) * f)
            return tuple(min(1.0, float(x) * f) for x in v)
        if (getattr(tracer, "compiled", None) is not None
                and config.min_tiles > 8):
            cfg_aa = _dc.replace(
                config, min_tiles=8,
                reflect_capacity=_scale(config.reflect_capacity),
                refract_capacity=_scale(config.refract_capacity),
                warp_capacity=_scale(config.warp_capacity))
            tracer = type(tracer)(tracer.compiled, cfg_aa)
        self.tracer = tracer
        self.cam = cam
        self.config = config
        self._jit = jax.jit(self._render)

    # -- helpers -----------------------------------------------------------

    def _trace_pixels(self, arrays, xf, yf):
        """Trace rays for global float pixel coords; returns ((cap, 5)
        TColors (r, g, b, a, depth), wavefront queue drops)."""
        cfg = self.config
        xc, yc = pixel_coords(cfg.xres, cfg.yres, xf, yf)
        o, d = primary_rays(self.cam, xc, yc)
        res = self.tracer.trace(arrays, o, d)
        ov = (jnp.int32(0) if res.overflow is None
              else jnp.sum(res.overflow))
        return jnp.concatenate([res.color, res.t[:, None]], axis=-1), ov

    def _masked_trace(self, arrays, img, mask, xcoord, ycoord, cap,
                      counts, overflow, label):
        """Trace where mask (Hp, Wp) is set, up to `cap` rays; scatter
        the results into the (5, Hp, Wp) plane stack.  Requested-ray
        counts land in `counts` (the reference cost model's 1/8..2
        rays/px budget is asserted against them); requests beyond cap
        are dropped, keeping the pixel's current value, and counted in
        `overflow`."""
        Hp, Wp = mask.shape
        flat = mask.reshape(-1)
        req = jnp.sum(flat.astype(jnp.int32))
        counts.append((label, req))
        overflow.append((label, jnp.maximum(req - cap, 0)))
        idx = compact_indices(flat, cap)
        xf = gather(xcoord.reshape(-1), idx)
        yf = gather(ycoord.reshape(-1), idx)
        tc, wf_ov = self._trace_pixels(arrays, xf, yf)
        overflow.append((label + "/wf", wf_ov))
        traced = jnp.zeros((Hp * Wp,), bool).at[idx].set(True, mode='drop')
        out = []
        for c in range(5):
            pl = scatter(img[c].reshape(-1), idx, tc[:, c])
            out.append(jnp.where(traced, pl, img[c].reshape(-1)))
        return jnp.stack(out).reshape(5, Hp, Wp)

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

        # static coordinate/mask planes (numpy constants)
        y, x = np.mgrid[0:Hp, 0:Wp]
        lx, ly = x % S, y % S
        xcoord = jnp.asarray(x.astype(np.float32))
        ycoord = jnp.asarray(y.astype(np.float32))

        def okmask(dx, dy):
            return jnp.asarray((lx + dx >= 0) & (lx + dx < S)
                               & (ly + dy >= 0) & (ly + dy < S))

        even = (x % 2 == 0) & (y % 2 == 0)

        counts = []
        overflow = []
        img = jnp.zeros((5, Hp, Wp), jnp.float32).at[4].set(INFINITY)

        # pass 1: even grid, (x+y) % 4 == 0
        m1 = jnp.asarray(even & ((x + y) % 4 == 0))
        img = self._masked_trace(arrays, img, m1, xcoord, ycoord,
                                 cap(0), counts, overflow, "pass1")

        def decide_pass(img, mask, offs, threshold, ci, label):
            a, b, c, d = [self._shift(img, dx, dy, okmask(dx, dy))
                          for dx, dy in offs]
            variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
            need = mask & (variance > threshold)
            interp = _cavg(a, b, c, d)
            img = jnp.where((mask & ~need)[None], interp, img)
            return self._masked_trace(arrays, img, need, xcoord, ycoord,
                                      cap(ci), counts, overflow, label)

        # pass 2: even grid, (x+y) % 4 == 2 -- trace-or-interpolate
        m2 = jnp.asarray(even & ((x + y) % 4 == 2))
        img = decide_pass(img, m2, [(-2, 0), (0, 2), (2, 0), (0, -2)],
                          th1, 1, "pass2")

        # pass 3: odd diagonal pixels vs diagonal neighbors
        m3 = jnp.asarray((x % 2 == 1) & (y % 2 == 1))
        img = decide_pass(img, m3, [(-1, -1), (1, -1), (1, 1), (-1, 1)],
                          th2, 2, "pass3")

        # pass 4: remaining odd pixels vs axis neighbors
        m4 = jnp.asarray((x + y) % 2 == 1)
        img = decide_pass(img, m4, [(-1, 0), (0, 1), (1, 0), (0, -1)],
                          th3, 3, "pass4")

        # pass 5: supersample at pixel corners and average (Glome.hs:299-321)
        a = img
        b = self._shift(img, 0, 1, okmask(0, 1))
        c = self._shift(img, 1, 1, okmask(1, 1))
        d = self._shift(img, 1, 0, okmask(1, 0))
        variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
        need = variance > th4
        corner = _cavg(a, b, c, d)
        corner = self._masked_trace(arrays, corner, need,
                                    xcoord + 0.5, ycoord + 0.5,
                                    cap(4), counts, overflow, "pass5")
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
        self.last_overflow = {k: int(v) for k, v in overflow.items()}
        return rgb, depth

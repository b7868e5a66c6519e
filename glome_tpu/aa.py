"""Adaptive subsample/supersample antialiasing.

Port of the reference's 5-pass mutable tile stencil
(GlomeView/Glome.hs:226-323) as masked, compacted vector passes over
all tiles at once:

  pass 1: trace every 4th even-grid pixel ((x+y) % 4 == 0)
  pass 2: remaining even-grid pixels: trace if the +-2 axis neighbors
          vary more than threshold1, else interpolate
  pass 3: odd-diagonal pixels vs their 4 diagonal neighbors (threshold2)
  pass 4: remaining pixels vs their 4 axis neighbors (threshold3)
  pass 5: supersample at every pixel corner (x+.5, y+.5) when the 2x2
          cell varies (threshold4), averaging corner + cell
          (Glome.hs:299-321) -> at most 2 rays/pixel, as few as 1/8

Out-of-tile neighbor reads are transparent-infinite (Glome.hs:233-235),
so tiles are processed independently exactly like the reference's
parMap over tiles -- here as one leading tile axis, with each pass's
rays gathered across *all* tiles into a single compacted trace batch.

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


def _ccmp(a, b):
    """Color+depth variance between two TColor arrays (..., 5)."""
    diff = jnp.sum(jnp.abs(a[..., :4] - b[..., :4]), axis=-1)
    d1, d2 = a[..., 4], b[..., 4]
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
        self.tracer = tracer
        self.cam = cam
        self.config = config
        self._jit = jax.jit(self._render)

    # -- helpers -----------------------------------------------------------

    def _trace_pixels(self, arrays, xf, yf):
        """Trace rays for global float pixel coords; returns (..., 5)
        TColors (r, g, b, a, depth)."""
        cfg = self.config
        xc, yc = pixel_coords(cfg.xres, cfg.yres, xf, yf)
        o, d = primary_rays(self.cam, xc, yc)
        res = self.tracer.trace(arrays, o, d)
        return jnp.concatenate([res.color, res.t[:, None]], axis=-1)

    def _masked_trace(self, arrays, img, mask, xcoord, ycoord, cap,
                      counts=None, label=None):
        """Trace where mask (tiles, S, S) is set; scatter into img.
        Appends (label, requested-ray count) to `counts` -- the
        reference cost model's budget (1/8 .. 2 rays/px,
        /root/reference/README.md:20) is asserted against these."""
        T, S, _ = mask.shape
        flat = mask.reshape(-1)
        if counts is not None:
            counts.append((label, jnp.sum(flat.astype(jnp.int32))))
        idx = compact_indices(flat, cap)
        xf = gather(xcoord.reshape(-1), idx)
        yf = gather(ycoord.reshape(-1), idx)
        tc = self._trace_pixels(arrays, xf, yf)
        out = scatter(img.reshape(-1, 5), idx, tc).reshape(T, S, S, 5)
        return jnp.where(mask[..., None], out, img)

    @staticmethod
    def _neighbors(img, offs):
        """Shifted copies with out-of-tile = (0,0,0,0,inf)."""
        T, S, _, _ = img.shape
        oob = jnp.zeros((5,), img.dtype).at[4].set(INFINITY)
        pad = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)),
                      constant_values=0.0)
        # fix the depth channel of padding to INFINITY
        padmask = jnp.pad(jnp.ones((T, S, S), bool),
                          ((0, 0), (2, 2), (2, 2)), constant_values=False)
        pad = jnp.where(padmask[..., None], pad,
                        jnp.broadcast_to(oob, pad.shape))
        outs = []
        for dx, dy in offs:
            outs.append(pad[:, 2 + dy:2 + dy + S, 2 + dx:2 + dx + S, :])
        return outs

    # -- the pipeline ------------------------------------------------------

    def _render(self, arrays):
        cfg = self.config
        S = cfg.blocksize
        tx = math.ceil(cfg.xres / S)
        ty = math.ceil(cfg.yres / S)
        T = tx * ty
        th1, th2, th3, th4 = cfg.thresholds

        # global pixel coordinates per tile-local pixel
        tile_ox = (np.arange(tx) * S)[None, :].repeat(ty, 0).reshape(-1)
        tile_oy = (np.arange(ty) * S)[:, None].repeat(tx, 1).reshape(-1)
        lx = np.arange(S)
        xcoord = jnp.asarray((tile_ox[:, None, None]
                              + lx[None, None, :]).astype(np.float32)
                             + np.zeros((1, S, 1), np.float32))
        ycoord = jnp.asarray((tile_oy[:, None, None]
                              + lx[None, :, None]).astype(np.float32)
                             + np.zeros((1, 1, S), np.float32))

        counts = []
        img = jnp.zeros((T, S, S, 5), jnp.float32).at[..., 4].set(INFINITY)
        xl = jnp.asarray(lx[None, None, :], jnp.int32) + jnp.zeros(
            (T, S, 1), jnp.int32)
        yl = jnp.asarray(lx[None, :, None], jnp.int32) + jnp.zeros(
            (T, 1, S), jnp.int32)
        even = (xl % 2 == 0) & (yl % 2 == 0)

        n_pix = T * S * S

        # pass 1: even grid, (x+y) % 4 == 0
        m1 = even & ((xl + yl) % 4 == 0)
        img = self._masked_trace(arrays, img, m1, xcoord, ycoord,
                                 cap=_cap(n_pix, 8), counts=counts,
                                 label="pass1")

        # pass 2: even grid, (x+y) % 4 == 2 -- trace-or-interpolate
        m2 = even & ((xl + yl) % 4 == 2)
        a, b, c, d = self._neighbors(img, [(-2, 0), (0, 2), (2, 0), (0, -2)])
        img = self._decide_pass(arrays, img, m2, a, b, c, d, th1,
                                xcoord, ycoord, _cap(n_pix, 8),
                                counts, "pass2")

        # pass 3: odd diagonal pixels vs diagonal neighbors
        m3 = (xl % 2 == 1) & (yl % 2 == 1)
        a, b, c, d = self._neighbors(img, [(-1, -1), (1, -1), (1, 1), (-1, 1)])
        img = self._decide_pass(arrays, img, m3, a, b, c, d, th2,
                                xcoord, ycoord, _cap(n_pix, 4),
                                counts, "pass3")

        # pass 4: remaining odd pixels vs axis neighbors
        m4 = (xl + yl) % 2 == 1
        a, b, c, d = self._neighbors(img, [(-1, 0), (0, 1), (1, 0), (0, -1)])
        img = self._decide_pass(arrays, img, m4, a, b, c, d, th3,
                                xcoord, ycoord, _cap(n_pix, 2),
                                counts, "pass4")

        # pass 5: supersample at pixel corners and average (Glome.hs:299-321)
        a = img
        b, c, d = self._neighbors(img, [(0, 1), (1, 1), (1, 0)])
        variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
        need = variance > th4
        corner = _cavg(a, b, c, d)
        corner = self._masked_trace(arrays, corner, need,
                                    xcoord + 0.5, ycoord + 0.5,
                                    cap=_cap(n_pix, 2), counts=counts,
                                    label="pass5")
        last = S - 1
        cell = jnp.where((xl == last)[..., None],
                         jnp.where((yl == last)[..., None], corner,
                                   _cavg(a, b)),
                         jnp.where((yl == last)[..., None], _cavg(a, d),
                                   _cavg(a, b, c, d)))
        out = jnp.where(((xl == last) & (yl == last))[..., None],
                        corner, _cavg(corner, cell))

        # stitch tiles back into the frame
        frame = out.reshape(ty, tx, S, S, 5).transpose(0, 2, 1, 3, 4)
        frame = frame.reshape(ty * S, tx * S, 5)
        frame = frame[:cfg.yres, :cfg.xres]
        rgb = frame[..., :3] * frame[..., 3:4]
        return (jnp.clip(rgb, 0.0, 1.0), frame[..., 4],
                {k: v for k, v in counts})

    def _decide_pass(self, arrays, img, mask, a, b, c, d, threshold,
                     xcoord, ycoord, cap, counts=None, label=None):
        variance = jnp.maximum(_ccmp(a, c), _ccmp(b, d))
        need = mask & (variance > threshold)
        interp = _cavg(a, b, c, d)
        img = jnp.where((mask & ~need)[..., None], interp, img)
        return self._masked_trace(arrays, img, need, xcoord, ycoord, cap,
                                  counts=counts, label=label)

    def render(self, arrays):
        """Full adaptive-AA frame: returns ((H, W, 3) rgb, (H, W)
        depth).  Per-pass requested-ray counts (the reference's
        1/8..2 rays/px cost model) land in self.last_ray_counts."""
        rgb, depth, counts = self._jit(arrays)
        self.last_ray_counts = {k: int(v) for k, v in counts.items()}
        return rgb, depth


def _cap(n_pix, frac_div):
    return max(64, n_pix // frac_div)

"""Camera model and frame rendering.

Camera construction mirrors GlomeTrace/Data/Glome/Scene.hs:48-57; the
screen-to-camera mapping and primary ray generation mirror
GlomeView/Glome.hs:27-33,119-140.  Rendering is organized as flat ray
batches (optionally chunked) rather than the reference's 65x65 tiles +
monad-par; tiles reappear only in the adaptive-AA pipeline (aa.py)
where their boundary semantics matter.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import INFINITY, RenderConfig
from .trace import Tracer, TraceResult


@dataclasses.dataclass
class Camera:
    pos: np.ndarray
    fwd: np.ndarray
    up: np.ndarray
    right: np.ndarray


def camera(pos, at, up, angle_deg) -> Camera:
    """Build an orthonormal camera basis scaled by tan(fov/2)
    (reference Scene.hs:48-57)."""
    pos = np.asarray(pos, dtype=np.float64)
    at = np.asarray(at, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = at - pos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    up_ = np.cross(fwd, right)
    up_ = up_ / np.linalg.norm(up_)
    cam_scale = math.tan((math.pi / 180.0) * (angle_deg / 2.0))
    return Camera(pos, fwd, up_ * cam_scale, right * cam_scale)


def tile_order(xres, yres, bw=32, bh=32):
    """Permutation putting rays in screen-tile-major order (bw x bh
    pixel tiles).  Spatially compact ray tiles are what the Pallas
    dense kernel's per-block culling and the packet BVH traversal need:
    1024 consecutive rays form a 32x32 beam instead of 1.4 rows
    spanning the image.  Pure reordering -- per-ray results are
    identical; callers scatter outputs back through the permutation."""
    ys, xs = np.mgrid[0:yres, 0:xres]
    ntx = (xres + bw - 1) // bw
    key = (((ys // bh) * ntx + (xs // bw)) * (bw * bh)
           + (ys % bh) * bw + (xs % bw))
    return np.argsort(key.reshape(-1), kind="stable")


def pixel_coords(width, height, xf, yf):
    """Screen (pixel) -> camera plane coordinates (Glome.hs:133-140).
    Accepts float arrays for sub-pixel sampling."""
    xcoord = ((xf / width) * 2.0 - 1.0) * (width / height)
    ycoord = -((yf / height) * 2.0 - 1.0)
    return xcoord, ycoord


def primary_rays(cam: Camera, xcoord, ycoord, dtype=jnp.float32):
    """Primary rays for camera-plane coordinates
    (dir = norm(fwd - x*right + y*up), Glome.hs:30-32)."""
    fwd = jnp.asarray(cam.fwd, dtype=dtype)
    up = jnp.asarray(cam.up, dtype=dtype)
    right = jnp.asarray(cam.right, dtype=dtype)
    d = (fwd[None, :] - xcoord[:, None] * right[None, :]
         + ycoord[:, None] * up[None, :])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(cam.pos, dtype=dtype), d.shape)
    return o, d


class Renderer:
    """Holds a jitted whole-frame render function for one compiled scene."""

    def __init__(self, tracer: Tracer, cam: Camera,
                 config: Optional[RenderConfig] = None,
                 ray_chunk: Optional[int] = None,
                 cache_tag: Optional[str] = None):
        self.tracer = tracer
        self.cam = cam
        self.config = config or tracer.config
        self.ray_chunk = ray_chunk
        # cache_tag: persist the traced+lowered render executable on
        # disk (glome_tpu/cache.py) keyed by this scene-identity tag +
        # config + source digest.  The caller must guarantee the tag
        # identifies the scene STRUCTURE (e.g. "test", or a hash of
        # the NFF source); array values stay runtime inputs.
        self._cache_tag = cache_tag
        if cache_tag is not None:
            import hashlib
            ck = hashlib.sha256(repr(self.config).encode()).hexdigest()[:8]
            self._cache_tag = f"{cache_tag}-{ck}"
            self._rr_cached = None

            def call(arrays, o, d):
                if self._rr_cached is None:
                    from .cache import cached_jit
                    self._rr_cached, _ = cached_jit(
                        self._cache_tag, self._render_rays, arrays, o, d)
                return self._rr_cached(arrays, o, d)
            self._render_rays_jit = call
        else:
            self._render_rays_jit = jax.jit(self._render_rays)

    # differentiable core: rays -> premultiplied rgb + depth (+ queue
    # overflow counts; nonzero = capacity schedule truncated work)
    def _render_rays(self, arrays, o, d):
        res = self.tracer.trace(arrays, o, d)
        rgb = res.color[..., :3] * res.color[..., 3:4]
        return rgb, res.t, res.overflow

    def rays_for_pixels(self, xf, yf, dtype=jnp.float32):
        cfg = self.config
        xc, yc = pixel_coords(cfg.xres, cfg.yres,
                              jnp.asarray(xf, dtype=dtype),
                              jnp.asarray(yf, dtype=dtype))
        return primary_rays(self.cam, xc, yc, dtype=dtype)

    def render(self, arrays, subpixel_offset: float = 0.0):
        """Render a full frame at 1 ray/pixel; returns (H, W, 3) rgb in
        [0, 1] (premultiplied by alpha, like the reference blit,
        Glome.hs:353-358) and the (H, W) depth map.  Rays are traced in
        32x32-tile order (see tile_order) and scattered back."""
        cfg = self.config
        ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
        perm = tile_order(cfg.xres, cfg.yres)
        xf = xs.reshape(-1)[perm].astype(np.float32) + subpixel_offset
        yf = ys.reshape(-1)[perm].astype(np.float32) + subpixel_offset
        o, d = self.rays_for_pixels(xf, yf)
        n = o.shape[0]
        chunk = self.ray_chunk or n
        rgbs, depths = [], []
        self.last_overflow = None
        for s in range(0, n, chunk):
            rgb, t, ov = self._render_rays_jit(arrays, o[s:s + chunk],
                                               d[s:s + chunk])
            rgbs.append(rgb)
            depths.append(t)
            if ov is not None:
                self.last_overflow = (ov if self.last_overflow is None
                                      else self.last_overflow + ov)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0])
        rgb = jnp.concatenate(rgbs)[inv].reshape(cfg.yres, cfg.xres, 3)
        t = jnp.concatenate(depths)[inv].reshape(cfg.yres, cfg.xres)
        return jnp.clip(rgb, 0.0, 1.0), t

"""Object picking: trace a pick ray and return the hit's tag stack.

The reference prints the tag stack on mouse click (Glome.hs:416-438 via
get_tags, Glome.hs:69-72); tags accumulate from Tag wrappers during
intersection (Tex.hs:54).  Here the tag stack is a static per-prim
array, gathered at the winning hit.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from .render import Camera, pixel_coords, primary_rays
from .trace import Tracer


def pick(tracer: Tracer, cam: Camera, arrays, x: int, y: int,
         scene_id: int = 0) -> List:
    """Tag names of the object under pixel (x, y)."""
    cfg = tracer.config
    xc, yc = pixel_coords(cfg.xres, cfg.yres,
                          jnp.asarray([float(x)]), jnp.asarray([float(y)]))
    o, d = primary_rays(cam, xc, yc)
    res = tracer.trace(arrays, o, d)
    stack = np.asarray(res.tag_stack)[0]
    return [tracer.compiled.tag_names[t] for t in stack if t >= 0]


def pick_hit(tracer: Tracer, cam: Camera, arrays, x: int, y: int):
    """Full hit record under pixel (x, y) (depth, prim serial, tags)."""
    cfg = tracer.config
    xc, yc = pixel_coords(cfg.xres, cfg.yres,
                          jnp.asarray([float(x)]), jnp.asarray([float(y)]))
    o, d = primary_rays(cam, xc, yc)
    res = tracer.trace(arrays, o, d)
    return {
        "t": float(res.t[0]),
        "prim_serial": int(res.prim_serial[0]),
        "tags": [tracer.compiled.tag_names[t]
                 for t in np.asarray(res.tag_stack)[0] if t >= 0],
        "color": np.asarray(res.color)[0],
    }

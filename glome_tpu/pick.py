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


class PickSession:
    """Persistent render->click->tags session (the reference's SDL
    event loop, Glome.hs:416-438, headless): the pick trace is jitted
    ONCE with the pixel coordinate as a traced argument, so every
    subsequent pick reuses the compiled executable instead of paying a
    scene recompile per click."""

    def __init__(self, tracer: Tracer, cam: Camera, arrays,
                 scene_id: int = 0):
        import jax
        self.tracer = tracer
        self.cam = cam
        self.arrays = arrays
        cfg = tracer.config

        def fn(arrays, xy):
            xc, yc = pixel_coords(cfg.xres, cfg.yres, xy[:1], xy[1:])
            o, d = primary_rays(cam, xc, yc)
            res = tracer.trace(arrays, o, d, scene_id=scene_id)
            return res.t[0], res.prim_serial[0], res.tag_stack[0]

        self._fn = jax.jit(fn)

    def pick(self, x: float, y: float):
        """{'t', 'prim_serial', 'tags'} under pixel (x, y)."""
        t, serial, stack = self._fn(
            self.arrays, jnp.asarray([float(x), float(y)], jnp.float32))
        return {
            "t": float(t),
            "prim_serial": int(serial),
            "tags": [self.tracer.compiled.tag_names[s]
                     for s in np.asarray(stack) if s >= 0],
        }

    def run(self, inp=None, out=None):
        """Interactive loop: read 'X Y' lines, print tag stacks;
        'q' quits (the reference's q key, Glome.hs:429)."""
        import sys as _sys
        inp = inp or _sys.stdin
        out = out or _sys.stdout
        print("pick session: 'X Y' picks, 'q' quits", file=out,
              flush=True)
        for line in inp:
            line = line.strip()
            if not line:
                continue
            if line.lower() in ("q", "quit", "exit"):
                break
            try:
                x, y = (float(v) for v in line.split()[:2])
            except ValueError:
                print(f"? {line!r}", file=out, flush=True)
                continue
            h = self.pick(x, y)
            tags = " ".join(h["tags"]) if h["tags"] else "(no tags)"
            print(f"{int(x)} {int(y)}: t={h['t']:.4f} "
                  f"serial={h['prim_serial']} {tags}", file=out,
                  flush=True)


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

"""Honest per-pass TestScene cost breakdown on the local TPU.

Uses tools.tpu_time.device_time (chained in-executable timing) for
every number -- see that module for why naive timing lies here.

Measures, for the heavy groups and for the whole pipeline, both
row-major and 32x32-tile-swizzled primary rays, and dense vs BVH for
the big sphere groups.  Dev tool.
"""

import importlib
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time  # noqa: E402

import glome_tpu as G  # noqa: E402
from glome_tpu.scenes import test_scene  # noqa: E402
from glome_tpu.config import RenderConfig, INFINITY  # noqa: E402
from glome_tpu.render import Renderer  # noqa: E402

I = importlib.import_module("glome_tpu.intersect")


def swizzle_perm(xres, yres, bw=32, bh=32):
    ys, xs = np.mgrid[0:yres, 0:xres]
    key = ((ys // bh) * ((xres + bw - 1) // bw) + (xs // bw)) * (bw * bh) \
        + (ys % bh) * bw + (xs % bw)
    return np.argsort(key.reshape(-1), kind="stable")


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    cfg = RenderConfig(xres=720, yres=480, secondary_capacity=0.5)
    tracer = G.WavefrontTracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)

    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    o_r, d_r = renderer.rays_for_pixels(xs.reshape(-1).astype(np.float32),
                                        ys.reshape(-1).astype(np.float32))
    perm = swizzle_perm(cfg.xres, cfg.yres)
    o_s = jax.device_put(o_r[perm])
    d_s = jax.device_put(d_r[perm])
    o_r = jax.device_put(o_r)
    d_r = jax.device_put(d_r)
    N = o_r.shape[0]

    sc = compiled.scenes[0]
    garrs_dev = arrays["scenes"][0]

    def group_step(gi, o, d, kind):
        def step(p):
            oo = o + p * 1e-4
            seed = jnp.full((N,), INFINITY, jnp.float32)
            if kind == "bvh":
                bt, bl = I.bvh_pass(sc, garrs_dev, gi, oo, d, seed, False)
            else:
                bt, bl = I.dense_pass(sc, garrs_dev, gi, oo, d, seed, False)
            return jnp.mean(jnp.where(bt >= INFINITY, 0.0, bt))
        return step

    interesting = [gi for gi, g in enumerate(sc.groups)
                   if g.size >= 256 and g.vclass in ("plain", "inline")]
    for gi in interesting:
        g = sc.groups[gi]
        if only and only not in ("groups",):
            break
        for rays, tag in ((o_r, "rowmaj"), (o_s, "swizzl")):
            d_ = d_r if tag == "rowmaj" else d_s
            device_time(group_step(gi, rays, d_, "dense"),
                        verbose=f"g{gi} {g.ptype} size={g.size} "
                                f"dense {tag}")
        if g.accel is None:
            from glome_tpu.accel import build_bvh, group_bounds
            g.accel = build_bvh(*group_bounds(g))
            try:
                device_time(group_step(gi, o_s, d_s, "bvh"),
                            verbose=f"g{gi} {g.ptype} size={g.size} "
                                    f"bvh swizzl")
            finally:
                g.accel = None
        else:
            device_time(group_step(gi, o_s, d_s, "bvh"),
                        verbose=f"g{gi} {g.ptype} size={g.size} bvh swizzl")

    if only in (None, "full"):
        def full_step_factory(o, d):
            def step(p):
                oo = o + p * 1e-4
                h = I.intersect(compiled, arrays, 0, oo, d)
                return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
            return step
        device_time(full_step_factory(o_r, d_r), verbose="intersect rowmaj")
        device_time(full_step_factory(o_s, d_s), verbose="intersect swizzl")

        def shadow_step_factory(o, d):
            def step(p):
                oo = o + p * 1e-4
                h = I.intersect(compiled, arrays, 0, oo, d, shadow=True)
                return jnp.mean(jnp.where(h.t >= INFINITY, 0.0, h.t))
            return step
        device_time(shadow_step_factory(o_r, d_r), verbose="shadow rowmaj")

        def trace_step_factory(o, d):
            def step(p):
                res = tracer.trace(arrays, o + p * 1e-4, d)
                return jnp.mean(res.color[:, :3])
            return step
        device_time(trace_step_factory(o_r, d_r), verbose="trace rowmaj")
        device_time(trace_step_factory(o_s, d_s), verbose="trace swizzl")


if __name__ == "__main__":
    main()

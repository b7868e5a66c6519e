"""Per-group cost breakdown of the TestScene intersect on the local device.

Times each group's standalone pass (dense/bvh/deferred) over the full
primary-ray batch, plus the complete intersect and the full trace, to
show where the frame time goes.  Dev tool, not part of the library.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig, INFINITY
from glome_tpu.render import Renderer
import importlib
I = importlib.import_module("glome_tpu.intersect")


def timeit(fn, arrays, o, *rest, n=3):
    """Times fn(arrays, o, *rest), jittering o per run: the TPU tunnel
    memoizes identical executions (see bench.py)."""
    out = fn(arrays, o, *rest)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = fn(arrays, o + np.float32(1e-6 * (i + 1)), *rest)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    cfg = RenderConfig(xres=720, yres=480, secondary_capacity=0.5)
    tracer = G.WavefrontTracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)

    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    o, d = renderer.rays_for_pixels(xs.reshape(-1).astype(np.float32),
                                    ys.reshape(-1).astype(np.float32))
    o = jax.device_put(o)
    d = jax.device_put(d)
    N = o.shape[0]
    seed = jnp.full((N,), INFINITY, jnp.float32)

    sc = compiled.scenes[0]

    def group_fn(gi):
        g = sc.groups[gi]
        if g.vclass == "deferred":
            return None

        def f(arrays, o, d, seed):
            garrs = arrays["scenes"][0]
            if g.accel is not None:
                return I.bvh_pass(sc, garrs, gi, o, d, seed, False)
            return I.dense_pass(sc, garrs, gi, o, d, seed, False)
        return jax.jit(f)

    total = 0.0
    rows = []
    for gi, g in enumerate(sc.groups):
        f = group_fn(gi)
        if f is None:
            rows.append((gi, g.ptype, g.size, g.vclass, None))
            continue
        dt = timeit(f, arrays, o, d, seed)
        total += dt
        rows.append((gi, g.ptype, g.size, g.vclass, dt))
    rows.sort(key=lambda r: -(r[4] or 0))
    for gi, pt, size, vc, dt in rows:
        print(f"g{gi:3d} {pt:13s} size={size:6d} {vc:9s} "
              f"{'deferred-skip' if dt is None else f'{dt*1e3:8.2f} ms'}")
    print(f"sum of standalone group passes: {total*1e3:.1f} ms")

    fi = jax.jit(lambda a, o_, d_: I.intersect(compiled, a, 0, o_, d_))
    print(f"full intersect scene0:  {timeit(fi, arrays, o, d)*1e3:8.2f} ms")
    fs = jax.jit(lambda a, o_, d_: I.intersect(
        compiled, a, 0, o_, d_, shadow=True))
    print(f"full shadow scene0:     {timeit(fs, arrays, o, d)*1e3:8.2f} ms")
    ft = jax.jit(lambda a, o_, d_: tracer.trace(a, o_, d_).color)
    print(f"full trace depth3:      {timeit(ft, arrays, o, d)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

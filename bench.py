"""Benchmark: TestScene forward trace throughput on the local device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is primary-ray throughput (Mrays/s) for the full Whitted
trace (depth 3: shadows, reflection, refraction, CSG, portal) of the
reference benchmark scene at 720x480, 1 ray/pixel -- BASELINE.md's
implied reference throughput is 0.02-0.7 Mrays/s on a 2014 multicore
CPU; vs_baseline is computed against the top of that range.
"""

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 0.7  # best implied reference throughput (BASELINE.md)


def _init_jax():
    """The axon TPU tunnel registers flakily under 'axon' vs 'tpu';
    try the configured platform then sane fallbacks."""
    import os
    for plat in (os.environ.get("JAX_PLATFORMS"), "tpu", "axon", "cpu", ""):
        if plat is None:
            continue
        os.environ["JAX_PLATFORMS"] = plat
        try:
            import jax
            devs = jax.devices()
            print(f"# platform {plat or 'auto'}: {devs}", file=sys.stderr)
            return jax
        except Exception as e:  # noqa: BLE001
            print(f"# platform {plat!r} failed: {e}", file=sys.stderr)
            import jax.extend
            try:
                jax._src.xla_bridge.backends.cache_clear()
            except Exception:
                pass
    raise RuntimeError("no jax backend available")


def main():
    jax = _init_jax()
    import glome_tpu as G
    from glome_tpu.scenes import test_scene
    from glome_tpu.config import RenderConfig
    from glome_tpu.render import Renderer

    t0 = time.time()
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    cfg = RenderConfig(xres=720, yres=480, secondary_capacity=0.5)
    try:
        tracer = G.WavefrontTracer(compiled, cfg)
    except NotImplementedError:
        tracer = G.Tracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)
    setup_s = time.time() - t0
    print(f"# scene setup {setup_s:.1f}s", file=sys.stderr)

    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    o, d = renderer.rays_for_pixels(xs.reshape(-1).astype(np.float32),
                                    ys.reshape(-1).astype(np.float32))
    o = jax.device_put(o)
    d = jax.device_put(d)

    fn = jax.jit(lambda a, o_, d_: tracer.trace(a, o_, d_).color)

    t0 = time.time()
    out = fn(arrays, o, d)
    jax.block_until_ready(out)
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    # timed runs; block every frame and jitter the inputs per frame so
    # no layer of the stack can memoize identical executions
    n_iters = 5
    t0 = time.time()
    for i in range(n_iters):
        oj = o + np.float32(1e-6 * (i + 1))
        out = fn(arrays, oj, d)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iters
    n_rays = o.shape[0]
    mrays = n_rays / dt / 1e6
    print(f"# {dt*1e3:.1f} ms/frame, {n_rays} primary rays", file=sys.stderr)

    print(json.dumps({
        "metric": "TestScene_720x480_depth3_primary_Mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
    }))


if __name__ == "__main__":
    main()

"""Capture a device trace of one wavefront frame (dev tool).

Writes an xplane trace under /tmp/jaxtrace; parse with
tools/parse_xplane.py or tensorboard.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig
from glome_tpu.render import Renderer, tile_order

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
arrays = jax.device_put(compiled.arrays())
cfg = RenderConfig.tuned(xres=720, yres=480,
                         maxdepth=int(sys.argv[1]) if len(sys.argv) > 1
                         else 3)
tracer = G.WavefrontTracer(compiled, cfg)
renderer = Renderer(tracer, cam, cfg)
ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
perm = tile_order(cfg.xres, cfg.yres)
o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                ys.reshape(-1)[perm].astype(np.float32))
o = jax.device_put(o); d = jax.device_put(d)


@jax.jit
def frame(p):
    res = tracer.trace(arrays, o + p * 1e-4, d)
    return jnp.mean(res.color)


print("# warm", float(frame(jnp.float32(0.0))))
jax.profiler.start_trace("/tmp/jaxtrace")
for i in range(3):
    v = jax.block_until_ready(frame(jnp.float32(1e-3 * (i + 1))))
jax.profiler.stop_trace()
print("# traced", float(v))

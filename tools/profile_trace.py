"""Whole-frame device-time attribution via jax.profiler.

Runs ONE wavefront TestScene frame (already compiled) under
jax.profiler.trace and prints every device-side op >= 0.1 ms, so the
frame budget sums to the frame.  Op names carry jax named_scope
prefixes, so the tracer's phases are directly attributable.

Usage: python tools/profile_trace.py [out_dir]
"""
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig
from glome_tpu.render import Renderer, tile_order

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glome_trace"

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
arrays = jax.device_put(compiled.arrays())
cfg = RenderConfig.tuned(xres=720, yres=480)
tracer = G.WavefrontTracer(compiled, cfg)
renderer = Renderer(tracer, cam, cfg)
ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
perm = tile_order(cfg.xres, cfg.yres)
o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                ys.reshape(-1)[perm].astype(np.float32))
o = jax.device_put(o)
d = jax.device_put(d)


@jax.jit
def frame(p):
    res = tracer.trace(arrays, o + p * 1e-4, d)
    return jnp.mean(res.color)


t0 = time.time()
jax.block_until_ready(frame(jnp.float32(0.0)))
print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
jax.block_until_ready(frame(jnp.float32(1.0)))
print(f"# second (incl dispatch) {(time.time()-t0)*1e3:.1f} ms",
      file=sys.stderr)

with jax.profiler.trace(out_dir):
    jax.block_until_ready(frame(jnp.float32(2.0)))

# ---- parse newest trace ----------------------------------------------------
paths = sorted(glob.glob(out_dir + "/plugins/profile/*/*.trace.json.gz"))
path = paths[-1]
print(f"# parsing {path}", file=sys.stderr)
with gzip.open(path) as f:
    tr = json.load(f)
ev = tr.get("traceEvents", [])

# device lanes: find pids whose process name mentions TPU / device
pid_name = {}
tid_name = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_name[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
print("# processes:", pid_name, file=sys.stderr)

by_op = {}
total = 0.0
for e in ev:
    if e.get("ph") != "X":
        continue
    pname = pid_name.get(e["pid"], "")
    tname = tid_name.get((e["pid"], e.get("tid")), "")
    lane = f"{pname}/{tname}"
    if not ("TPU" in pname or "device" in pname.lower()
            or "XLA" in tname or "Stream" in tname or "tpu" in lane.lower()):
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # ms
    key = (lane, name)
    by_op[key] = by_op.get(key, 0.0) + dur
    total += dur

print(f"\n== device op totals (sum {total:.1f} ms) ==")
for (lane, name), ms in sorted(by_op.items(), key=lambda kv: -kv[1]):
    if ms < 0.05:
        continue
    print(f"{ms:9.3f} ms  [{lane}]  {name}")

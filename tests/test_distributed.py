"""Two-process jax.distributed CPU mesh test (SURVEY §4e, VERDICT r3
#4): the standard no-hardware pod-slice check.  Each process runs
jax.distributed.initialize against a local coordinator with 4 virtual
CPU devices, builds the global 2x4-device mesh, and runs a psum'd
sharded train step on a small scene; process 0 asserts the loss is
finite and identical across processes."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

sys.path.insert(0, os.getcwd())
import glome_tpu as G
from glome_tpu.config import RenderConfig
from glome_tpu.materials import Surface, light
from glome_tpu.parallel import make_mesh, sharded_train_step_fn
from glome_tpu.render import Renderer, camera

scene = G.tex(G.sphere((0, 1, 0), 1.0),
              G.t_uniform(Surface(color=(1, 0, 0), ambient=0.2, kd=0.8)))
lights = (light((-3, 6, 4), (60, 60, 60)),)
compiled = G.compile_scene(scene, lights)
arrays = compiled.arrays()
cfg = RenderConfig(xres=32, yres=16, maxdepth=1)
tracer = G.Tracer(compiled, cfg)
cam = camera((0, 2, 6), (0, 1, 0), (0, 1, 0), 45)
renderer = Renderer(tracer, cam, cfg)

mesh = make_mesh()  # all 8 global devices
step = sharded_train_step_fn(tracer, mesh, lr=1e-2)

total = mesh.devices.size
n = ((cfg.xres * cfg.yres + total - 1) // total) * total
ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
xf = np.resize(xs.reshape(-1).astype(np.float32), n)
yf = np.resize(ys.reshape(-1).astype(np.float32), n)
o, d = renderer.rays_for_pixels(xf, yf)

# shard the global batch: this process provides its addressable slice
sh = NamedSharding(mesh, P(("dp", "sp")))
def put(x):
    return jax.make_array_from_callback(
        x.shape, sh, lambda idx: np.asarray(x[idx]))
o_g, d_g = put(np.asarray(o)), put(np.asarray(d))
t_g = put(np.zeros((n, 3), np.float32))
arrays_g = jax.tree.map(
    lambda x: jax.make_array_from_callback(
        np.shape(x), NamedSharding(mesh, P()),
        lambda idx: np.asarray(x)[idx]), arrays)

new_arrays, loss = step(arrays_g, o_g, d_g, t_g)
jax.block_until_ready(loss)
lf = float(loss.addressable_shards[0].data if hasattr(loss, 'addressable_shards') and loss.addressable_shards else loss)
assert np.isfinite(lf), lf
print(f"WORKER_OK {proc_id} {lf:.8f}", flush=True)
"""


def test_two_process_cpu_mesh(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out, out[-2000:]
    # both processes computed the same global psum'd loss
    l0 = [ln for ln in outs[0].splitlines() if "WORKER_OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "WORKER_OK" in ln][0]
    assert l0.split()[-1] == l1.split()[-1], (l0, l1)

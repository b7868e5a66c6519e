"""Scaling-efficiency harness over a virtual CPU device mesh.

Real multi-chip hardware is not available on this box (one TPU chip via
a relay), so the >=85% rays/s scaling target (BASELINE.json,
SURVEY.md 5.8) cannot be measured end to end.  What CAN be measured
honestly -- and what this harness reports -- is the *sharding overhead*
of the distributed path on an N-virtual-device CPU mesh
(xla_force_host_platform_device_count): all N virtual devices share the
same physical cores, so with a FIXED global batch the total FLOPs are
constant and the ideal N-device wall time equals the 1-device wall
time.  Efficiency = t(1 device) / t(N devices) then isolates exactly
the costs the mesh adds: pjit partitioning, shard copies, psum
collectives, and any load imbalance from padding.  ICI latency is the
one term this cannot see; on hardware the same harness runs unchanged
with real devices.

Writes SCALING.json: {"devices": [...], "ms": [...], "efficiency": ...,
"mode": "virtual-cpu"}.

Usage:
  python tools/scaling_bench.py            # orchestrates 1/2/4/8
  python tools/scaling_bench.py --n 4      # one measurement (subprocess)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
N_RAYS = 262144         # global batch, fixed across device counts
REPS = 7


def measure(n: int) -> float:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}")
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import glome_tpu as G
    from glome_tpu.config import RenderConfig
    from glome_tpu.parallel.mesh import make_mesh, sharded_render_fn
    from glome_tpu.render import Renderer
    from glome_tpu.scenes.testscene import (simple_scene, cust_cam,
                                            lights as mk_lights)

    solid, lights, cam = simple_scene(), mk_lights(), cust_cam()
    compiled = G.compile_scene(solid, lights)
    arrays = compiled.arrays()
    tracer = G.WavefrontTracer(compiled, RenderConfig(maxdepth=3))
    mesh = make_mesh(n)
    fn = sharded_render_fn(tracer, mesh)

    rng = np.random.default_rng(0)
    renderer = Renderer(tracer, cam, RenderConfig())
    xs = rng.uniform(0, 720, N_RAYS).astype(np.float32)
    ys = rng.uniform(0, 480, N_RAYS).astype(np.float32)
    o, d = renderer.rays_for_pixels(xs, ys)

    rgb, t = fn(arrays, o, d)
    jax.block_until_ready(rgb)           # compile + warm
    dts = []
    for r in range(REPS):
        o2 = o + np.float32(1e-5 * (r + 1))
        t0 = time.time()
        rgb, t = fn(arrays, o2, d)
        jax.block_until_ready(rgb)
        dts.append(time.time() - t0)
    dts.sort()
    return dts[len(dts) // 2], dts[0], dts[-1]


def main():
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
        med, lo, hi = measure(n)
        print(json.dumps({"n": n, "s": med, "lo": lo, "hi": hi}))
        return
    counts = [1, 2, 4, 8]
    results = {}
    spread = {}
    # Every virtual-device count runs PINNED TO ONE CORE (taskset):
    # round 2's unpinned runs measured XLA CPU *threading* differences
    # (efficiency 1.36-1.92 > 1, non-physical).  On one core with a
    # fixed global batch the total FLOPs are constant, so ideal
    # efficiency is exactly 1.0 and any shortfall is sharding overhead
    # (pjit partitioning, shard copies, psum, padding imbalance).
    pin = ["taskset", "-c", "0"]
    for n in counts:
        out = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__),
                   "--n", str(n)],
            capture_output=True, text=True, cwd=REPO, timeout=1800)
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        results[n] = rec["s"]
        spread[n] = (rec["lo"], rec["hi"])
        print(f"# {n} virtual devices: {results[n]*1e3:.1f} ms "
              f"[{rec['lo']*1e3:.1f}..{rec['hi']*1e3:.1f}] "
              f"({N_RAYS} rays, 1 core)", file=sys.stderr)
    eff = {n: results[1] / results[n] for n in counts}
    payload = {
        "mode": "virtual-cpu-fixed-global-batch-1core",
        "n_rays": N_RAYS,
        "reps": REPS,
        "devices": counts,
        "ms": [round(results[n] * 1e3, 2) for n in counts],
        "ms_spread": {str(n): [round(spread[n][0] * 1e3, 2),
                               round(spread[n][1] * 1e3, 2)]
                      for n in counts},
        "efficiency_vs_1dev": {str(n): round(eff[n], 3) for n in counts},
        "note": ("all device counts pinned to ONE physical core with a "
                 "fixed global batch: ideal efficiency is exactly 1.0; "
                 "the shortfall is sharding/collective overhead.  Real "
                 "compute scaling needs multi-chip hardware; this "
                 "harness runs unchanged there."),
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

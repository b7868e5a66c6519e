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
    import jax.numpy as jnp
    import glome_tpu as G
    from glome_tpu.scenes import test_scene
    from glome_tpu.config import RenderConfig
    from glome_tpu.render import Renderer

    t0 = time.time()
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    # same config the golden image is verified at (app default: the
    # tuned queue schedule, zero-overflow-checked on this scene)
    cfg = RenderConfig.tuned(xres=720, yres=480)
    try:
        tracer = G.WavefrontTracer(compiled, cfg)
    except NotImplementedError:
        tracer = G.Tracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)
    setup_s = time.time() - t0
    print(f"# scene setup {setup_s:.1f}s", file=sys.stderr)

    from glome_tpu.render import tile_order
    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    perm = tile_order(cfg.xres, cfg.yres)  # 32x32 beams (renderer order)
    o, d = renderer.rays_for_pixels(
        xs.reshape(-1)[perm].astype(np.float32),
        ys.reshape(-1)[perm].astype(np.float32))
    o = jax.device_put(o)
    d = jax.device_put(d)

    # Measurement must be robust against the TPU relay's quirks: it
    # memoizes repeated executions, its per-call blocking semantics are
    # unreliable, and every dispatch pays a large host round trip.  So
    # the whole timed workload is ONE device program: a fori_loop of
    # chained frames (frame i+1's ray origins are jittered by frame i's
    # mean color, so no frame can be skipped, cached, or overlapped),
    # and the per-frame time is the difference between a long and a
    # short chain, which cancels the fixed dispatch/transfer overhead.
    # The trip count is a DYNAMIC argument, so both chain lengths share
    # one executable and the frame body compiles exactly once.
    # The traced+lowered+compiled program is memoized on disk
    # (glome_tpu/cache.py), so compile_s is ~2 s when the cache is
    # warm and ~70 s cold; compile_cache in the JSON says which.
    from glome_tpu.cache import cached_jit

    def frame_chain(n, a, o_, d_, prev):
        def body(_, p):
            res = tracer.trace(a, o_ + p * 1e-4, d_)
            return jnp.mean(res.color[:, :3], axis=0)
        return jax.lax.fori_loop(0, n, body, prev)

    n_long, n_short = 12, 2
    prev0 = jnp.zeros((3,), jnp.float32)
    t0 = time.time()
    f_chain, cache_state = cached_jit(
        f"bench_frame_{cfg.xres}x{cfg.yres}", frame_chain,
        jnp.int32(2), arrays, o, d, prev0)
    out = f_chain(jnp.int32(n_short), arrays, o, d, prev0)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"# compile+first chain {compile_s:.1f}s"
          f" (cache {cache_state})", file=sys.stderr)
    assert np.all(np.isfinite(np.asarray(out)))

    def timed(n, p0):
        t0 = time.time()
        jax.block_until_ready(f_chain(jnp.int32(n), arrays, o, d, p0))
        return time.time() - t0

    reps = 3
    dts = []
    for r in range(reps):
        # distinct seeds each rep so no execution repeats exactly
        eps = jnp.float32(1e-5 * (r + 1))
        t_s = timed(n_short, prev0 + 2.0 * eps)
        t_l = timed(n_long, prev0 + eps)
        dts.append((t_l - t_s) / (n_long - n_short))
        print(f"# rep {r}: short {t_s*1e3:.1f} ms, long {t_l*1e3:.1f} ms"
              f" -> {dts[-1]*1e3:.2f} ms/frame", file=sys.stderr)
    dt = sorted(dts)[len(dts) // 2]
    n_rays = o.shape[0]
    mrays = n_rays / dt / 1e6
    print(f"# {dt*1e3:.1f} ms/frame, {n_rays} primary rays", file=sys.stderr)

    failures = []
    mesh_stats = {}
    try:
        mesh_stats = bench_mesh(jax)
        mesh_stats.update(bench_mesh(jax, cast_shadows=True,
                                     tag="_meshshadow"))
    except Exception as e:  # noqa: BLE001 -- secondary metric must not
        print(f"# mesh bench failed: {e}", file=sys.stderr)
        failures.append(f"mesh: {e}")

    aa_stats = {}
    try:
        aa_stats = bench_aa(jax, compiled, tracer, cam)
    except Exception as e:  # noqa: BLE001
        print(f"# aa bench failed: {e}", file=sys.stderr)
        failures.append(f"aa: {e}")

    print(json.dumps({
        "metric": "TestScene_720x480_depth3_primary_Mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
        "compile_s": round(compile_s, 1),
        "compile_cache": cache_state,
        **mesh_stats,
        **aa_stats,
    }))
    if failures:
        # a broken section must not quietly ship (VERDICT r4 #2)
        print(f"# BENCH SECTIONS FAILED: {failures}", file=sys.stderr)
        sys.exit(1)


def bench_aa(jax, compiled, tracer, cam):
    """Adaptive-AA frame (the reference's actual render cost model:
    subsample 1/8 ray/px adaptively up to 2 rays/px,
    /root/reference/README.md:20, GlomeView/Glome.hs:226-323)."""
    import jax.numpy as jnp
    from glome_tpu.aa import AARenderer

    arrays = jax.device_put(compiled.arrays())
    aa = AARenderer(tracer, cam, tracer.config)
    xres, yres = tracer.config.xres, tracer.config.yres

    # one executable serves timing AND the per-pass ray counts: the
    # chained fori carries (mean rgb, total requested rays), light
    # positions jittered per frame so no execution repeats
    from glome_tpu.cache import cached_jit

    def aa_chain(n, a, prev):
        def body(_, c):
            p, _ = c
            l2 = {**a["lights"], "pos": a["lights"]["pos"] + p * 1e-6}
            rgb, _depth, counts, _ov = aa._render({**a, "lights": l2})
            tot = sum(jnp.asarray(v) for v in counts.values())
            return (jnp.mean(rgb, axis=(0, 1)), tot)
        return jax.lax.fori_loop(0, n, body, (prev, jnp.int32(0)))

    n_long, n_short = 4, 1
    prev0 = jnp.zeros((3,), jnp.float32)
    t0 = time.time()
    f_chain, aa_cache = cached_jit(f"bench_aa_{xres}x{yres}", aa_chain,
                                   jnp.int32(1), arrays, prev0)
    out = f_chain(jnp.int32(n_short), arrays, prev0)
    jax.block_until_ready(out)
    aa_compile_s = time.time() - t0
    n_rays = int(out[1])
    print(f"# aa compile+first {aa_compile_s:.1f}s; "
          f"{n_rays/(xres*yres):.3f} rays/px", file=sys.stderr)
    dts = []
    for r in range(3):
        eps = jnp.float32(1e-5 * (r + 1))
        t0 = time.time()
        jax.block_until_ready(f_chain(jnp.int32(n_short), arrays, prev0 + 2 * eps))
        t_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(f_chain(jnp.int32(n_long), arrays, prev0 + eps))
        t_l = time.time() - t0
        dts.append((t_l - t_s) / (n_long - n_short))
        print(f"# aa rep {r}: {dts[-1]*1e3:.1f} ms/frame", file=sys.stderr)
    dt = sorted(dts)[len(dts) // 2]
    return {
        "aa_720x480_ms_per_frame": round(dt * 1e3, 1),
        "aa_rays_per_px": round(n_rays / (xres * yres), 3),
        "aa_720x480_Mrays_per_s": round(n_rays / dt / 1e6, 3),
        "aa_compile_s": round(aa_compile_s, 1),
        "aa_compile_cache": aa_cache,
    }


def bench_mesh(jax, cast_shadows: bool = False, tag: str = ""):
    """BASELINE config 4: 100k-triangle shared-vertex mesh at 1080p,
    primary rays + per-light shadows (depth 1).  cast_shadows=True is
    the honest row: the mesh itself occludes (the default preserves
    the reference's Mesh.hs:210 no-shadow quirk)."""
    import jax.numpy as jnp
    import glome_tpu as G
    from glome_tpu.scenes.meshscene import mesh_scene
    from glome_tpu.config import RenderConfig
    from glome_tpu.render import Renderer, tile_order

    t0 = time.time()
    solid, lights, cam = mesh_scene(100_000, cast_shadows=cast_shadows)
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    cfg = RenderConfig(xres=1920, yres=1080, maxdepth=1)
    tracer = G.WavefrontTracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)
    print(f"# mesh scene setup {time.time()-t0:.1f}s", file=sys.stderr)

    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    perm = tile_order(cfg.xres, cfg.yres)
    o, d = renderer.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                                    ys.reshape(-1)[perm].astype(np.float32))
    o = jax.device_put(o)
    d = jax.device_put(d)

    from glome_tpu.cache import cached_jit

    def mesh_chain(n, a, o_, d_, prev):
        def body(_, p):
            res = tracer.trace(a, o_ + p * 1e-4, d_)
            return jnp.mean(res.color[:, :3], axis=0)
        return jax.lax.fori_loop(0, n, body, prev)

    n_long, n_short = 5, 1
    prev0 = jnp.zeros((3,), jnp.float32)
    t0 = time.time()
    f_chain, _st = cached_jit(f"bench_mesh{tag}", mesh_chain,
                              jnp.int32(1), arrays, o, d, prev0)
    jax.block_until_ready(f_chain(jnp.int32(n_short), arrays, o, d, prev0))
    print(f"# mesh compile+first {time.time()-t0:.1f}s (cache {_st})",
          file=sys.stderr)
    dts = []
    for r in range(2):
        eps = jnp.float32(1e-5 * (r + 1))
        t0 = time.time()
        jax.block_until_ready(f_chain(jnp.int32(n_short), arrays, o, d,
                                      prev0 + 2.0 * eps))
        t_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(f_chain(jnp.int32(n_long), arrays, o, d,
                                      prev0 + eps))
        t_l = time.time() - t0
        dts.append((t_l - t_s) / (n_long - n_short))
        print(f"# mesh{tag} rep {r}: {dts[-1]*1e3:.1f} ms/frame",
              file=sys.stderr)
    dt = sorted(dts)[len(dts) // 2]
    n_rays = o.shape[0]
    return {
        f"mesh100k_1080p{tag}_ms_per_frame": round(dt * 1e3, 1),
        f"mesh100k_1080p{tag}_Mrays_per_s": round(n_rays / dt / 1e6, 3),
    }


if __name__ == "__main__":
    main()

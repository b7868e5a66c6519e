"""Command-line renderer: the reference GlomeView executable, headless.

Replicates the reference driver's behavior (GlomeView/Glome.hs:440-469):
print primcount, time scene setup / render / output separately, render
the TestScene (or an NFF file) and write a PNG.  The interactive window
becomes --pick x y: trace a pick ray and print the tag stack of the hit
object (the reference's mouse handler, Glome.hs:416-438).

Usage:
  python -m glome_tpu.app [--scene test|simple|path.nff] [--out out.png]
      [--xres 720 --yres 480] [--depth 3] [--aa] [--pick X Y]
      [--iters 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="test",
                   help="'test', 'simple', or a .nff file path")
    p.add_argument("--out", default="out.png")
    p.add_argument("--xres", type=int, default=720)
    p.add_argument("--yres", type=int, default=480)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--aa", action="store_true",
                   help="adaptive subsample/supersample antialiasing")
    p.add_argument("--pick", type=int, nargs=2, metavar=("X", "Y"),
                   help="print the tag stack for the object at pixel X,Y")
    p.add_argument("--interactive", action="store_true",
                   help="persistent pick session: read 'X Y' lines from "
                        "stdin and print tag stacks, compiling the pick "
                        "trace once (the reference's event loop, "
                        "Glome.hs:416-438, headless)")
    p.add_argument("--debug-full", action="store_true",
                   help="like --debug but through the FULL trace: "
                        "shadow + child-ray work per level ascends to "
                        "the primary pixel (trace_debug parity, "
                        "Trace.hs:86-109)")
    p.add_argument("--debug", action="store_true",
                   help="render the rayint_debug work map instead of "
                        "color: prims tested -> red, BVH nodes -> green "
                        "(reference get_color_debug, Glome.hs:57-62)")
    p.add_argument("--iters", type=int, default=1,
                   help="repeat the render (timing consistency)")
    p.add_argument("--lattice-n", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import glome_tpu as G
    from glome_tpu.config import RenderConfig
    from glome_tpu.render import Renderer, camera
    from glome_tpu.io import write_png

    t0 = time.time()
    background = None
    if args.scene == "test":
        from glome_tpu.scenes import test_scene
        solid, lights, cam = test_scene(lattice_n=args.lattice_n)
    elif args.scene == "simple":
        from glome_tpu.scenes import simple_scene
        from glome_tpu.scenes.testscene import cust_cam, lights as _lights
        solid, lights, cam = simple_scene(), _lights(), cust_cam()
    else:
        from glome_tpu import spd
        s = spd.load(args.scene)
        solid, lights = s.geom, s.lights
        cam = s.cam or camera((0, 0, -5), (0, 0, 0), (0, 1, 0), 45)
        if s.resolution:
            args.xres, args.yres = s.resolution
        background = s.background  # NFF `b` feeds missshade (Spd.hs:118-122)

    print(f"(primitives,transforms,bounding objects): {G.primcount(solid)}")
    compiled = G.compile_scene(solid, lights)
    arrays = jax.device_put(compiled.arrays())
    # the tuned queue schedule is verified zero-overflow on TestScene;
    # for any scene, nonzero overflow is detected and reported below
    cfg = RenderConfig.tuned(xres=args.xres, yres=args.yres,
                             maxdepth=args.depth, background=background)
    try:
        # O(N)-queue scan-over-depth tracer (compiles smaller and peaks
        # far lower than the unrolled recursive tracer)
        tracer = G.WavefrontTracer(compiled, cfg)
    except NotImplementedError:
        tracer = G.Tracer(compiled, cfg)
    print(f"scene setup: {time.time()-t0:.3f}s")

    if args.debug or args.debug_full:
        from glome_tpu.debug import debug_image
        t0 = time.time()
        img, prims, nodes = debug_image(compiled, arrays, cam,
                                        args.xres, args.yres,
                                        full=args.debug_full,
                                        recurs=cfg.maxdepth)
        print(f"debug render: {time.time()-t0:.3f}s; per-ray prims "
              f"mean {prims.mean():.1f} max {prims.max():.0f}, nodes "
              f"mean {nodes.mean():.1f} max {nodes.max():.0f}")
        write_png(args.out, img)
        print(f"-> {args.out}")
        return

    if args.pick:
        from glome_tpu.pick import pick
        tags = pick(tracer, cam, arrays, args.pick[0], args.pick[1])
        print(f"{args.pick[0]} {args.pick[1]}:")
        for t in tags:
            print(t)
        return

    if args.interactive:
        from glome_tpu.pick import PickSession
        PickSession(tracer, cam, arrays).run()
        return

    # scene-identity tag for the persistent executable cache: the
    # built-in scenes are identified by name (+ their only structural
    # knob), NFF scenes by a digest of the file bytes
    if args.scene in ("test", "simple"):
        cache_tag = f"app_{args.scene}_{args.lattice_n}"
    else:
        import hashlib
        with open(args.scene, "rb") as f:
            cache_tag = "app_nff_" + hashlib.sha256(
                f.read()).hexdigest()[:16]

    if args.aa:
        from glome_tpu.aa import AARenderer
        r = AARenderer(tracer, cam, cfg)
        render = lambda: r.render(arrays)
    else:
        r = Renderer(tracer, cam, cfg, cache_tag=cache_tag)
        render = lambda: r.render(arrays)

    for _ in range(args.iters):
        t0 = time.time()
        rgb, depth = render()
        jax.block_until_ready(rgb)
        print(f"render: {time.time()-t0:.3f}s")

    ov = getattr(r, "last_overflow", None)
    if ov is not None:
        ov = np.asarray(ov)
        if ov.any():
            labels = getattr(tracer, "overflow_labels", [])
            bad = {labels[i] if i < len(labels) else i: int(n)
                   for i, n in enumerate(ov) if n}
            print(f"WARNING: queue overflow (under-traced rays): {bad}; "
                  f"widen the RenderConfig *_capacity schedule",
                  file=sys.stderr)

    t0 = time.time()
    write_png(args.out, np.asarray(rgb))
    print(f"write: {time.time()-t0:.3f}s -> {args.out}")


if __name__ == "__main__":
    main()

"""Regenerate the committed CPU golden image for tests/test_golden.py.

Run on the CPU backend (forced below); commit the PNG and justify the
pixel delta whenever this is regenerated.
"""
import os
import sys

sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import glome_tpu as G
from glome_tpu.scenes import test_scene
from glome_tpu.config import RenderConfig
from glome_tpu.render import Renderer
from glome_tpu.io import write_png

def regen_main():
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    cfg = RenderConfig.tuned(xres=180, yres=120)
    tracer = G.WavefrontTracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg)
    rgb, depth = renderer.render(compiled.arrays())
    ov = getattr(renderer, "last_overflow", None)
    if ov is not None:
        assert int(np.asarray(ov).sum()) == 0, np.asarray(ov)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "testscene_180x120_cpu.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_png(out, np.asarray(rgb))
    print("wrote", out)


def regen_aa():
    """Regenerate the 64x64 adaptive-AA golden (tests/test_aa.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_aa import _scene, _render
    solid, lights, cam = _scene()
    rgb, _counts = _render(solid, lights, cam)
    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "golden", "aa_64.npy")
    np.save(out, np.asarray(rgb))
    print("wrote", out)


def regen_nff():
    """Regenerate the NFF conformance goldens
    (tests/test_spd_conformance.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_spd_conformance import _render_nff
    for name in ("miniflake.nff", "gears.nff"):
        rgb, _depth = _render_nff(name)
        out = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "golden", name.replace(".nff", "_rgb.npy"))
        np.save(out, np.asarray(rgb))
        print("wrote", out)


def regen_fast():
    """Regenerate the 90x60 default-profile golden
    (tests/test_golden.py::test_golden_testscene_cpu_fast)."""
    from glome_tpu.config import RenderConfig
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    cfg = RenderConfig.tuned(xres=90, yres=60)
    tracer = G.WavefrontTracer(compiled, cfg)
    renderer = Renderer(tracer, cam, cfg, cache_tag="golden_test")
    rgb, _depth = renderer.render(compiled.arrays())
    ov = getattr(renderer, "last_overflow", None)
    if ov is not None:
        assert int(np.asarray(ov).sum()) == 0, np.asarray(ov)
    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "golden", "testscene_90x60_cpu.png")
    write_png(out, np.asarray(rgb))
    print("wrote", out)


if "--aa" in sys.argv:
    regen_aa()
elif "--nff" in sys.argv:
    regen_nff()
elif "--fast" in sys.argv:
    regen_fast()
else:
    regen_main()
    regen_fast()

"""Gradient optimization loop + orbax checkpoint/resume (config 5)."""

import numpy as np
import pytest
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.config import RenderConfig
from glome_tpu.materials import Surface, light
from glome_tpu.optimize import optimize
from glome_tpu.render import Renderer, camera


def _setup():
    scene = G.group([
        G.tex(G.sphere((0.0, 1.0, 0.0), 1.0),
              G.t_uniform(Surface(color=(0.9, 0.2, 0.2), ambient=0.3,
                                  kd=0.7))),
        G.tex(G.plane((0, 0, 0), (0, 1, 0)),
              G.t_uniform(Surface(color=(0.2, 0.7, 0.3), ambient=0.3,
                                  kd=0.7))),
    ])
    lights = (light((-3, 5, 3), (25, 25, 25)),)
    compiled = G.compile_scene(scene, lights)
    cfg = RenderConfig(xres=48, yres=32, maxdepth=1)
    tracer = G.Tracer(compiled, cfg)
    cam = camera((0, 2, 5), (0, 1, 0), (0, 1, 0), 45)
    renderer = Renderer(tracer, cam, cfg)
    ys, xs = np.mgrid[0:cfg.yres, 0:cfg.xres]
    o, d = renderer.rays_for_pixels(xs.reshape(-1).astype(np.float32),
                                    ys.reshape(-1).astype(np.float32))
    return compiled, tracer, o, d


def _perturb(arrays):
    import jax
    return jax.tree.map(
        lambda p: p + 0.15 if (jnp.issubdtype(p.dtype, jnp.floating)
                               and p.shape == (1,)) else p, arrays)


@pytest.mark.slow
def test_optimize_recovers_radius_and_checkpoints(tmp_path):
    import jax
    compiled, tracer, o, d = _setup()
    true_arrays = compiled.arrays()
    res = tracer.trace(true_arrays, o, d)
    target = res.color[..., :3] * res.color[..., 3:4]

    start = _perturb(true_arrays)  # radius off by +0.15
    ckdir = str(tmp_path / "ck")
    out = optimize(tracer, start, o, d, target, steps=8, lr=3e-2,
                   checkpoint_dir=ckdir, checkpoint_every=4)
    assert out.losses[-1] < out.losses[0] * 0.7

    # resume: a fresh call with the same dir starts from step 8 (no-op)
    out2 = optimize(tracer, start, o, d, target, steps=8, lr=3e-2,
                    checkpoint_dir=ckdir, checkpoint_every=4)
    assert out2.steps_run == 0

    # and continuing to 12 runs only 4 more steps from the restored state
    out3 = optimize(tracer, start, o, d, target, steps=12, lr=3e-2,
                    checkpoint_dir=ckdir, checkpoint_every=4)
    assert out3.steps_run == 4
    # adam wobbles a step or two after restore; just require
    # the continued run to stay well below the starting loss
    assert out3.losses[-1] < out.losses[0] * 0.8

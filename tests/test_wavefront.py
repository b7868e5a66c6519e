"""Wavefront (scan-over-depth) tracer vs the recursive reference tracer."""

import numpy as np
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.config import RenderConfig
from glome_tpu.materials import Reflect, Refract, Surface, Warp, light
from glome_tpu.trace import Tracer
from glome_tpu.trace_wavefront import WavefrontTracer
from glome_tpu import xfm as X


def _full_feature_scene():
    m_red = Surface(color=(1, 0, 0), alpha=1, ambient=0.2, kd=0.8, ks=0.3,
                    shine=8)
    m_blue = Surface(color=(0.2, 0.3, 1), alpha=1, ambient=0.2, kd=0.9)
    frame = G.tex(G.box((-1.2, 0, -0.1), (1.2, 2.4, 0.1)),
                  G.t_uniform(m_blue))
    lights = (light((-4, 6, 5), (80, 80, 80)),)
    warp = Warp(frame=frame, scene=None, lights=lights,
                xfm=X.compose([X.translate((0, 0, -4))]))
    scene = G.group([
        G.tex(G.sphere((0, 1, 0), 1.0), G.t_uniform(m_red)),
        G.tex(G.difference(G.sphere((2.5, 1, 0), 0.9),
                           G.sphere((3.0, 1.5, 0), 0.6)),
              G.t_uniform(m_blue)),
        G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(Reflect(0.7))),
        G.transform(G.tex(G.sphere((-2.5, 1, 0), 0.9),
                          G.t_uniform(Refract(0.3, 0.7, 1.5))),
                    [G.scale((1, 0.6, 1))]),
        G.transform(G.group([
            frame,
            G.tex(G.box((-1.0, 0.2, -0.01), (1.0, 2.2, 0.01)),
                  G.t_uniform(warp))]),
            [G.translate((0, 0, -3))]),
    ])
    return scene, lights


def test_wavefront_matches_recursive():
    scene, lights = _full_feature_scene()
    compiled = G.compile_scene(scene, lights)
    arrays = compiled.arrays()
    cfg = RenderConfig(maxdepth=3, secondary_capacity=1.0)

    rng = np.random.RandomState(0)
    n = 128
    o = np.tile(np.array([[0.0, 2.0, 8.0]], np.float32), (n, 1))
    tgt = np.stack([rng.uniform(-4, 4, n), rng.uniform(0, 3, n),
                    rng.uniform(-4, 1, n)], -1)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    rec = Tracer(compiled, cfg)
    wav = WavefrontTracer(compiled, cfg)
    r1 = jax.jit(lambda a: rec.trace(a, o, d))(arrays)
    r2 = jax.jit(lambda a: wav.trace(a, o, d))(arrays)

    np.testing.assert_allclose(np.asarray(r2.t), np.asarray(r1.t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r2.color), np.asarray(r1.color),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(r2.prim_serial),
                                  np.asarray(r1.prim_serial))


def test_wavefront_depth1_is_local_shading():
    scene, lights = _full_feature_scene()
    compiled = G.compile_scene(scene, lights)
    arrays = compiled.arrays()
    cfg = RenderConfig(maxdepth=1, secondary_capacity=1.0)
    o = jnp.asarray([[0.0, 2.0, 8.0]] * 4, jnp.float32)
    d = jnp.asarray([[0, -0.2, -1], [0.3, -0.1, -1],
                     [-0.3, -0.1, -1], [0, 0.1, -1]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rec = Tracer(compiled, cfg)
    wav = WavefrontTracer(compiled, cfg)
    r1 = jax.jit(lambda a: rec.trace(a, o, d))(arrays)
    r2 = jax.jit(lambda a: wav.trace(a, o, d))(arrays)
    np.testing.assert_allclose(np.asarray(r2.color), np.asarray(r1.color),
                               rtol=1e-4, atol=1e-4)

"""Shading semantics tests (Shader.hs:65-184) and differentiability."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.config import RenderConfig
from glome_tpu.materials import Reflect, Surface, light
from glome_tpu.trace import Tracer


def _trace_fn(compiled, maxdepth=3):
    tracer = Tracer(compiled, RenderConfig(maxdepth=maxdepth))
    return jax.jit(lambda a, o, d: tracer.trace(a, o, d)), tracer


def _rays(data):
    o = np.asarray([r[0] for r in data], dtype=np.float32)
    d = np.asarray([r[1] for r in data], dtype=np.float64)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_surface_shading_and_shadows():
    # matte red sphere on a matte white plane, one overhead light
    m_red = Surface(color=(1, 0, 0), alpha=1, ambient=0.2, kd=1.0)
    m_white = Surface(color=(1, 1, 1), alpha=1, ambient=0.1, kd=1.0)
    scene = G.group([
        G.tex(G.sphere((0, 1, 0), 0.5), G.t_uniform(m_red)),
        G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(m_white)),
    ])
    lights = (light((0, 5, 0), (25, 25, 25)),)
    compiled = G.compile_scene(scene, lights)
    arrays = compiled.arrays()
    fn, _ = _trace_fn(compiled)
    o, d = _rays([
        ((0, 3, 0), (0, -1, 0)),     # sphere top: lit, diffuse 1
        ((0.55, 3, 0), (0, -1, 0)),  # plane inside the shadow disk
        ((3, 3, 0), (0, -1, 0)),     # plane, lit (no blocker)
    ])
    res = fn(arrays, o, d)
    c = np.asarray(res.color)

    # ray 0 hits the sphere top at t=1.5
    np.testing.assert_allclose(res.t[0], 1.5, rtol=1e-4)
    # shading: ambient (0.2,0,0) + lcolor/llen^2 * kd * cos
    # light at (0,5,0), hit (0,1.5,0): llen=3.5, cos=1
    expect_direct = 25.0 / 3.5**2
    np.testing.assert_allclose(
        c[0, :3], [0.2 + expect_direct, expect_direct, expect_direct],
        rtol=1e-3)

    # ray 2 hits the plane at (3,0,0), lit:
    # llen = sqrt(9+25), cos = 5/llen
    llen = np.sqrt(34.0)
    expect = 0.1 + 25.0 / 34.0 * (5.0 / llen)
    np.testing.assert_allclose(c[2, :3], [expect] * 3, rtol=1e-3)

    # ray 1 hits the plane just under the sphere -> in shadow, ambient only
    np.testing.assert_allclose(c[1, :3], [0.1] * 3, atol=1e-3)


def test_backface_light_culled():
    m = Surface(color=(0.5, 0.5, 0.5), alpha=1, ambient=0.3, kd=1.0)
    scene = G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(m))
    lights = (light((0, -5, 0), (100, 100, 100)),)  # below the plane
    compiled = G.compile_scene(scene, lights)
    fn, _ = _trace_fn(compiled)
    o, d = _rays([((0, 3, 0), (0, -1, 0))])
    res = fn(compiled.arrays(), o, d)
    # light is behind the surface: only ambient
    np.testing.assert_allclose(np.asarray(res.color)[0, :3], [0.15] * 3,
                               atol=1e-4)


def test_mirror_reflection():
    m_red = Surface(color=(1, 0, 0), alpha=1, ambient=1.0, kd=0.0)
    scene = G.group([
        G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(Reflect(1.0))),
        G.tex(G.sphere((0, 2, 0), 0.5), G.t_uniform(m_red)),
    ])
    compiled = G.compile_scene(scene, ())
    fn, _ = _trace_fn(compiled)
    # ray angled down at the mirror under the sphere... easier: straight
    # down; reflection goes straight up into the sphere
    o, d = _rays([((0, 1, 0), (0, -1, 0))])
    res = fn(compiled.arrays(), o, d)
    c = np.asarray(res.color)
    # sees the sphere's ambient red in the mirror
    assert c[0, 0] > 0.9 and c[0, 1] < 1e-3


def test_recursion_budget():
    # two facing mirrors: must terminate and return black-ish
    scene = G.group([
        G.tex(G.plane((0, -1, 0), (0, 1, 0)), G.t_uniform(Reflect(1.0))),
        G.tex(G.plane((0, 1, 0), (0, -1, 0)), G.t_uniform(Reflect(1.0))),
    ])
    compiled = G.compile_scene(scene, ())
    fn, _ = _trace_fn(compiled, maxdepth=3)
    o, d = _rays([((0, 0, 0), (0, -1, 0))])
    res = fn(compiled.arrays(), o, d)
    assert np.all(np.isfinite(np.asarray(res.color)))


def test_pixel_gradients_match_finite_differences():
    # gradient of a shaded pixel w.r.t. the sphere center (smooth region)
    m = Surface(color=(0.8, 0.2, 0.1), alpha=1, ambient=0.1, kd=1.0)
    scene = G.tex(G.sphere((0.2, 0.1, 0), 1.0), G.t_uniform(m))
    lights = (light((3, 4, -5), (200, 200, 200)),)
    compiled = G.compile_scene(scene, lights)
    arrays = compiled.arrays()
    tracer = Tracer(compiled, RenderConfig(maxdepth=2))
    o = jnp.asarray([[0.3, -0.2, -4.0]], dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)

    def loss(a):
        res = tracer.trace(a, o, d)
        return jnp.sum(res.color[..., :3])

    g = jax.jit(jax.grad(loss))(arrays)
    gc = np.asarray(g["scenes"][0][0]["center"])[0]
    assert np.any(np.abs(gc) > 1e-4)

    # finite differences on the x component
    eps = 1e-3
    lj = jax.jit(loss)
    def at(dx):
        a2 = jax.tree.map(lambda x: x, arrays)
        import copy
        a2 = {"scenes": [[dict(gd) for gd in s] for s in arrays["scenes"]],
              "lights": arrays["lights"]}
        c = np.asarray(a2["scenes"][0][0]["center"]).copy()
        c[0, 0] += dx
        a2["scenes"][0][0]["center"] = c
        return float(lj(a2))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    np.testing.assert_allclose(gc[0], fd, rtol=0.05, atol=1e-3)


def test_background_miss_shader():
    # missshade parity (Trace.hs:64, Shader.hs:186-189): rays that miss
    # take the configured background as an OPAQUE color; None stays the
    # transparent miss (mmissshade).
    m = Surface(color=(1, 0, 0), alpha=1, ambient=1.0, kd=0.0)
    scene = G.tex(G.sphere((0, 0, 0), 0.5), G.t_uniform(m))
    compiled = G.compile_scene(scene, ())
    arrays = compiled.arrays()
    o, d = _rays([((0, 0, -3), (0, 0, 1)),    # hits the sphere
                  ((0, 5, -3), (0, 0, 1))])   # misses
    bgcfg = RenderConfig(maxdepth=2, background=(0.1, 0.2, 0.3))
    for cls in (Tracer, G.WavefrontTracer):
        res = jax.jit(lambda a: cls(compiled, bgcfg).trace(a, o, d))(arrays)
        c = np.asarray(res.color)
        np.testing.assert_allclose(c[1], [0.1, 0.2, 0.3, 1.0], atol=1e-6)
        np.testing.assert_allclose(c[0, :3], [1, 0, 0], atol=1e-5)
        # default config: transparent miss
        res0 = jax.jit(lambda a: cls(compiled,
                                     RenderConfig(maxdepth=2)).trace(
                                         a, o, d))(arrays)
        np.testing.assert_allclose(np.asarray(res0.color)[1], 0.0, atol=0)


def test_background_seen_in_mirror():
    # a secondary (reflected) ray that misses must also take the
    # background -- missshade applies at every trace level (Trace.hs:64)
    scene = G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(Reflect(1.0)))
    compiled = G.compile_scene(scene, ())
    arrays = compiled.arrays()
    o, d = _rays([((0, 1, 0), (0, -1, 0))])
    bgcfg = RenderConfig(maxdepth=3, background=(0.0, 0.5, 0.0))
    for cls in (Tracer, G.WavefrontTracer):
        res = jax.jit(lambda a: cls(compiled, bgcfg).trace(a, o, d))(arrays)
        c = np.asarray(res.color)[0]
        np.testing.assert_allclose(c, [0.0, 0.5, 0.0, 1.0], atol=1e-5)


def test_light_custom_falloff():
    # Light.falloff is an arbitrary distance->scale closure like the
    # reference's litfalloff (Shader.hs:13-23); constant falloff here.
    m = Surface(color=(1, 1, 1), alpha=1, ambient=0.0, kd=1.0)
    scene = G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(m))
    lights = (light((0, 5, 0), (0.6, 0.6, 0.6),
                    falloff=lambda d: jnp.ones_like(d)),)
    compiled = G.compile_scene(scene, lights)
    fn, _ = _trace_fn(compiled, maxdepth=2)
    o, d = _rays([((0, 3, 0), (0, -1, 0))])
    res = fn(compiled.arrays(), o, d)
    # cos = 1, falloff = 1 -> direct = 0.6 exactly (no 1/d^2)
    np.testing.assert_allclose(np.asarray(res.color)[0, :3], [0.6] * 3,
                               rtol=1e-5)


def test_reflect_depth_exhaustion_is_transparent():
    # Pin reference semantics (VERDICT r1 weak #7): mpostshade's
    # `Reflect refl -> if (refl > 0) && (recurs > 0) ... else ca_black`
    # (Shader.hs:107-118) runs with recurs >= 1 always (trace returns
    # traceMiss BEFORE shading at recurs 0, Trace.hs:60), so the child
    # trace at the floor is the transparent miss and the shaded Reflect
    # color is ColorA r g b (a*refl) = transparent -- NOT black.  The
    # ca_black arm is only reachable via refl <= 0.
    scene = G.tex(G.plane((0, 0, 0), (0, 1, 0)), G.t_uniform(Reflect(1.0)))
    compiled = G.compile_scene(scene, ())
    arrays = compiled.arrays()
    o, d = _rays([((0, 1, 0), (0, -1, 0))])
    for cls in (Tracer, G.WavefrontTracer):
        res = jax.jit(lambda a: cls(compiled,
                                    RenderConfig(maxdepth=1)).trace(
                                        a, o, d))(arrays)
        np.testing.assert_allclose(np.asarray(res.color)[0], 0.0, atol=0)

"""Megakernel parity: the single-launch Pallas intersector (interpret
mode) must reproduce the jnp pass-per-group pipeline bit-for-bit on a
scene exercising every phase kind: dense groups, in-kernel BVH groups
(plain and transformed), convex CSG, deferred difference-B prims with
restricted member scans, inline constraints, retexture, shadow flags,
and multi-scene (portal) dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import glome_tpu as G
import importlib

from glome_tpu import megakernel as MK
I = importlib.import_module("glome_tpu.intersect")
from glome_tpu.materials import Surface, Reflect, Warp, t_uniform, light
from glome_tpu.xfm import translate, rotate, scale, compose


def _mat(c):
    return t_uniform(Surface(color=c, ambient=0.3, kd=0.7))


def build_scene():
    """All phase kinds in one scene (>DENSE_MAX prims per BVH group)."""
    rng = np.random.RandomState(7)
    items = []
    # dense boxes
    for i in range(6):
        items.append(G.tex(G.box((i, -1, -1), (i + 0.5, 1, 1)),
                           _mat((1, 0, 0))))
    # BVH sphere grid (150 > DENSE_MAX), minus a sphere: A inline w/
    # 1-member constraint, B deferred with a restricted ~150-member scan
    lat = [G.sphere((0.4 * a, 0.4 * b, 4.0 + 0.4 * c), 0.18)
           for a in range(6) for b in range(5) for c in range(5)]
    items.append(G.tex(G.difference(G.group(lat),
                                    G.sphere((1.0, 0.8, 4.8), 0.9)),
                       _mat((0, 1, 0))))
    # transformed cones (BVH, transformed leaf tests)
    cones = []
    for i in range(100):
        p = rng.randn(3) * 2 + np.array([0, 0, 8.0])
        q = p + rng.randn(3) * 0.3
        cones.append(G.cone(tuple(p), 0.2, tuple(q), 0.05))
    items.append(G.tex(G.group(cones), _mat((0, 0, 1))))
    # convex csg: intersection of planes (icosahedron-style wedge)
    items.append(G.tex(G.intersection([
        G.plane((0, 0, 12), (0, 0, 1)),
        G.plane((0, 0, 10), (0, 0, -1)),
        G.plane((1, 0, 11), (1, 0.2, 0)),
        G.plane((-1, 0, 11), (-1, 0.1, 0)),
        G.plane((0, 1, 11), (0.05, 1, 0)),
        G.plane((0, -1, 11), (0, -1, 0.02))]), _mat((1, 1, 0))))
    # retexture difference (useatex): box minus sphere
    items.append(G.difference(
        G.tex(G.box((-4, -1, 2), (-2, 1, 4)), _mat((1, 0, 1))),
        G.tex(G.sphere((-2, 0, 3), 0.8), _mat((0, 1, 1)))))
    # nested CSG (conjunctive normalization): (lens & lens) - bite
    items.append(G.tex(G.difference(
        G.intersection([G.sphere((4.5, 0, 5.0), 1.0),
                        G.sphere((5.5, 0, 5.0), 1.0)]),
        G.sphere((5.0, 0.45, 5.0), 0.5)), _mat((0.2, 0.8, 0.6))))
    # shadow-control wrappers
    items.append(G.noshadow(G.tex(G.sphere((3, 3, 3), 0.5),
                                  _mat((0.5, 0.5, 0.5)))))
    items.append(G.onlyshadow(G.sphere((-3, 3, 3), 0.5)))
    # transformed box + squashed sphere (dense transformed)
    xf = compose([scale((1.0, 0.5, 1.0)), rotate((0, 0, 1), 0.4),
                  translate((2, -2, 6))])
    items.append(G.tex(G.transform(G.sphere((0, 0, 0), 1.0), [xf]),
                       _mat((0.9, 0.3, 0.1))))
    return G.group(items)


def rays(n, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 0.5 + np.array(
        [0.5, 0.2, -4.0], np.float32)
    at = rng.randn(n, 3).astype(np.float32) * 3.0 + np.array(
        [0.0, 0.0, 6.0], np.float32)
    d = at - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def scene():
    compiled = G.compile_scene(build_scene(),
                               (light((0, 8, 0), (50, 50, 50)),))
    return compiled, compiled.arrays()


def test_plan_phases(scene):
    compiled, arrays = scene
    plan = MK.get_plan(compiled)
    kinds = {ph.kind for ph in plan.phases}
    bvh_kind = "bvh2" if MK.ORDERED_BVH else "bvh"
    assert kinds == {"dense", bvh_kind, "convex", "deferred"}
    bvh_ph = [ph for ph in plan.phases if ph.kind == bvh_kind]
    assert any(ph.transformed for ph in bvh_ph)
    # the deferred B prim's restricted scan must be a strict subset
    dp = [ph for ph in plan.phases if ph.kind == "deferred"]
    assert dp
    lattice_dp = [ph for ph in dp
                  if ph.cons and any(m.M > 4 for _, ms in ph.cons
                                     for m in ms)]
    if lattice_dp:
        M = sum(m.M for _, ms in lattice_dp[0].cons for m in ms)
        assert M < 150


def test_mega_matches_jnp(scene):
    compiled, arrays = scene
    o, d = rays(1500)  # > 1 tile, non-multiple of 1024 (padding)
    ref = I.intersect(compiled, arrays, 0, o, d)
    got = MK.mega_intersect(compiled, arrays, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    # finalize's instance transform runs as flat-plane FMAs while the
    # jnp reference path applies (3,4) einsums; the contraction-order
    # difference costs a few f32 ulps on near-tangent lanes
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=5e-5, atol=1e-4)
    m = np.asarray(ref.hit)
    # near-tangent lanes on thin cones (oak twigs) amplify the e-4
    # contraction-order shift in the recomputed t into e-3 normal
    # shifts (normal ~ hit point / radius); those lanes are
    # geometrically ill-conditioned in both pipelines
    np.testing.assert_allclose(np.asarray(got.norm)[m],
                               np.asarray(ref.norm)[m],
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(got.tex_stack)[m],
                                  np.asarray(ref.tex_stack)[m])
    np.testing.assert_array_equal(np.asarray(got.tag_stack)[m],
                                  np.asarray(ref.tag_stack)[m])
    np.testing.assert_array_equal(np.asarray(got.prim_serial)[m],
                                  np.asarray(ref.prim_serial)[m])


def test_mega_shadow_matches(scene):
    compiled, arrays = scene
    o, d = rays(800, seed=3)
    tmax = jnp.full((800,), 20.0, jnp.float32)
    ref = I.intersect(compiled, arrays, 0, o, d, tmax=tmax,
                      shadow=True).hit
    got = MK.mega_shadow(compiled, arrays, o, d, tmax=tmax)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_mega_tmax(scene):
    compiled, arrays = scene
    o, d = rays(512, seed=5)
    tmax = jnp.full((512,), 6.5, jnp.float32)
    ref = I.intersect(compiled, arrays, 0, o, d, tmax=tmax)
    got = MK.mega_intersect(compiled, arrays, o, d, tmax=tmax)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-4)


def test_mega_multi_scene():
    """Portal scenes: per-ray scene-id dispatch in one launch."""
    mirror = G.tex(G.sphere((0, 0, 3), 1.0), _mat((1, 0, 0)))
    frame = G.tex(G.box((-1, -1, -0.1), (1, 1, 0.1)), _mat((0, 1, 0)))
    warp = Warp(frame=frame, scene=mirror, lights=(), xfm=translate((0, 0, 1)))
    root = G.group([
        G.tex(G.box((-2, -2, 4), (2, 2, 5)), t_uniform(warp)),
        G.tex(G.sphere((0, 3, 2), 0.7), _mat((0, 0, 1)))])
    compiled = G.compile_scene(root, (light((0, 8, 0), (50, 50, 50)),))
    arrays = compiled.arrays()
    n = 600
    o, d = rays(n, seed=9)
    sid = jnp.asarray(np.random.RandomState(2).randint(-1, len(compiled.scenes),
                                                       size=n), jnp.int32)
    ref = I.intersect_multi.__wrapped__(compiled, arrays, o, d, sid) \
        if hasattr(I.intersect_multi, "__wrapped__") else None
    # jnp reference path: force-disable mega (we're on CPU so it's off)
    ref = I.intersect_multi(compiled, arrays, o, d, sid)
    got = MK.mega_intersect(compiled, arrays, o, d, sid=sid)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-4)
    m = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.tex_stack)[m],
                                  np.asarray(ref.tex_stack)[m])
    assert not np.asarray(got.hit)[np.asarray(sid) < 0].any()

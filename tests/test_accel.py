"""BVH traversal must agree exactly with the brute-force reference path."""

import copy

import numpy as np
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.intersect import intersect
from glome_tpu.materials import Surface


def _rand_scene(seed=0, n=150):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        c = rng.uniform(-10, 10, 3)
        kind = i % 3
        if kind == 0:
            items.append(G.sphere(c, rng.uniform(0.2, 1.5)))
        elif kind == 1:
            d = rng.uniform(0.2, 1.5, 3)
            items.append(G.box(c - d, c + d))
        else:
            p2 = c + rng.uniform(-2, 2, 3)
            p3 = c + rng.uniform(-2, 2, 3)
            items.append(G.triangle(c, p2, p3))
    return G.group(items)


def _rays(seed, n=128):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_matches_brute_force():
    compiled = G.compile_scene(_rand_scene(), (), accel_min_size=16)
    arrays = compiled.arrays()
    assert any(g.accel is not None for g in compiled.scenes[0].groups)

    o, d = _rays(1)
    fast = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))(
        arrays, o, d)

    brute = copy.copy(compiled)
    import dataclasses as dc
    sc = compiled.scenes[0]
    saved = [g.accel for g in sc.groups]
    for g in sc.groups:
        g.accel = None
    slow = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))(
        arrays, o, d)
    for g, a in zip(sc.groups, saved):
        g.accel = a

    np.testing.assert_allclose(np.asarray(fast.t), np.asarray(slow.t),
                               rtol=1e-5)
    hit = np.asarray(slow.hit)
    np.testing.assert_array_equal(np.asarray(fast.hit), hit)
    np.testing.assert_array_equal(np.asarray(fast.prim_serial)[hit],
                                  np.asarray(slow.prim_serial)[hit])
    np.testing.assert_allclose(np.asarray(fast.norm)[hit],
                               np.asarray(slow.norm)[hit], atol=1e-5)


def test_bvh_with_inline_csg_and_shadow():
    # lattice of spheres minus a big sphere: the lattice members become
    # an inline-constraint BVH group
    items = [G.sphere((x, y, z), 0.3)
             for x in range(-3, 4) for y in range(-3, 4) for z in range(-3, 4)]
    s = G.difference(G.group(items), G.sphere((0, 0, 0), 2.5))
    compiled = G.compile_scene(s, (), accel_min_size=16)
    arrays = compiled.arrays()
    sc = compiled.scenes[0]
    inline = [g for g in sc.groups if g.vclass == "inline"]
    assert inline and inline[0].accel is not None
    assert inline[0].constraints is not None

    o, d = _rays(2, n=64)
    fast = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))(
        arrays, o, d)
    saved = [g.accel for g in sc.groups]
    for g in sc.groups:
        g.accel = None
    slow = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))(
        arrays, o, d)
    for g, a in zip(sc.groups, saved):
        g.accel = a
    np.testing.assert_allclose(np.asarray(fast.t), np.asarray(slow.t),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(fast.hit), np.asarray(slow.hit))

    # shadow parity
    from glome_tpu.intersect import shadow_query
    tmax = jnp.full((64,), 30.0)
    fast_s = jax.jit(lambda a, o_, d_: shadow_query(compiled, a, 0, o_, d_,
                                                    tmax))(arrays, o, d)
    for g in sc.groups:
        g.accel = None
    slow_s = jax.jit(lambda a, o_, d_: shadow_query(compiled, a, 0, o_, d_,
                                                    tmax))(arrays, o, d)
    for g, a in zip(sc.groups, saved):
        g.accel = a
    np.testing.assert_array_equal(np.asarray(fast_s), np.asarray(slow_s))


def test_gradients_through_accelerated_scene():
    # grads must flow to prim params even when the group is BVH-traversed
    # (the traversal selects; the finalize pass recomputes differentiably)
    compiled = G.compile_scene(_rand_scene(seed=3, n=60), (), accel_min_size=16)
    arrays = compiled.arrays()
    assert any(g.accel is not None for g in compiled.scenes[0].groups)
    o, d = _rays(4, n=32)

    def loss(a):
        h = intersect(compiled, a, 0, o, d)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    g = jax.jit(jax.grad(loss))(arrays)
    total = 0.0
    for ga in g["scenes"][0]:
        for k, v in ga.items():
            total += float(jnp.sum(jnp.abs(v)))
    assert total > 1e-3

"""Pallas dense-intersect kernel vs the lax.scan reference path.

Runs in interpreter mode on CPU (tiny sizes -- the interpreter is
slow); on TPU the same comparison runs compiled (see /tmp probes and
bench.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.config import INFINITY
from glome_tpu import pallas_kernels as PK
import glome_tpu.intersect as _  # noqa: F401  (ensure module import)
import sys
I = sys.modules["glome_tpu.intersect"]


def _cmp_group(compiled, arrays, gi, o, d):
    sc = compiled.scenes[0]
    garrs = arrays["scenes"][0]
    N = o.shape[0]
    seed = jnp.full((N,), INFINITY, jnp.float32)
    ref_t, ref_l = I.brute_scan(sc, garrs, gi, o, d, seed, False)
    g = sc.groups[gi]
    ga = garrs[gi]
    pm = PK.pack_params_T(g.ptype, {k: v for k, v in ga.items()
                                    if k not in ("m_inv", "m_fwd")})
    cons = []
    for positive, members in (g.constraints or []):
        ms = []
        for gi2, idx in members:
            g2 = sc.groups[gi2]
            ga2 = garrs[gi2]
            cmat = PK.pack_params_rows(g2.ptype,
                                       {k: ga2[k][idx] for k in ga2
                                        if k not in ("m_inv", "m_fwd")})
            cmi = (ga2["m_inv"][idx].reshape(len(idx), 12)
                   if g2.m_inv is not None else None)
            ms.append((g2.ptype, cmat, cmi))
        cons.append((positive, ms))
    vis = jnp.asarray((~g.onlyshadow).astype(np.float32))
    got_t, got_l = PK.dense_intersect(
        g.ptype, pm, ga.get("m_inv"), vis, cons, o, d, seed, interpret=True)
    hit = np.asarray(ref_t) < INFINITY
    rt, gt = np.asarray(ref_t), np.asarray(got_t)
    # Two-tier distance check: the scan path and the Pallas kernel use
    # the same formulas but different op order (matmul association,
    # rsqrt), so grazing quadric hits (discriminant ~0) legitimately
    # differ by O(1e-2) in f32 -- the sqrt amplifies ulp input noise.
    # The bulk must agree tightly; a small grazing tail may deviate but
    # stays bounded and must pick the same winning prim.
    close = np.isclose(gt, rt, rtol=1e-5, atol=1e-4)
    assert close.mean() > 0.93, f"only {close.mean():.2%} within tight tol"
    np.testing.assert_allclose(gt, rt, rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(got_l)[hit],
                                  np.asarray(ref_l)[hit])
    return hit.mean()


def _rays(n, seed=1, span=6.0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3))
    dd = (dd / np.linalg.norm(dd, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(dd)


def test_pallas_sphere_with_constraint():
    rng = np.random.RandomState(0)
    items = [G.sphere(rng.uniform(-4, 4, 3), rng.uniform(0.4, 1.0))
             for i in range(12)]
    s = G.difference(G.group(items), G.sphere((0, 0, 0), 2.0))
    compiled = G.compile_scene(s, ())
    arrays = compiled.arrays()
    o, d = _rays(256)
    hits = 0.0
    for gi, g in enumerate(compiled.scenes[0].groups):
        if g.vclass == "deferred":
            continue
        hits += _cmp_group(compiled, arrays, gi, o, d)
    assert hits > 0


def test_pallas_mixed_types():
    rng = np.random.RandomState(2)
    items = []
    for i in range(6):
        c = rng.uniform(-4, 4, 3)
        items.append(G.box(c - 0.5, c + 0.5))
        items.append(G.triangle(c, c + [1, 0, 0], c + [0, 1, 0]))
        items.append(G.transform(G.cylinder(c, c + [0, 1.5, 0], 0.4), []))
    compiled = G.compile_scene(G.group(items), ())
    arrays = compiled.arrays()
    o, d = _rays(256, seed=3)
    for gi, g in enumerate(compiled.scenes[0].groups):
        if g.vclass == "deferred":
            continue
        _cmp_group(compiled, arrays, gi, o, d)


def test_pallas_bvh_traversal_matches_brute():
    # per-tile SMEM traversal kernel vs the dense scan oracle
    from glome_tpu.accel import build_bvh, group_bounds
    rng = np.random.RandomState(5)
    items = [G.sphere(rng.uniform(-6, 6, 3), rng.uniform(0.2, 0.7))
             for _ in range(300)]
    compiled = G.compile_scene(G.group(items), ())
    arrays = compiled.arrays()
    sc = compiled.scenes[0]
    garrs = arrays["scenes"][0]
    gi = next(i for i, g in enumerate(sc.groups) if g.size == 300)
    g = sc.groups[gi]
    g.accel = build_bvh(*group_bounds(g))

    o, d = _rays(1024, seed=11, span=8.0)
    seed = jnp.full((1024,), INFINITY, jnp.float32)
    ref_t, ref_l = I.brute_scan(sc, garrs, gi, o, d, seed, False)

    order = np.asarray(g.accel.order)
    params_lo = {k: garrs[gi][k][order] for k in garrs[gi]}
    rows = PK.pack_params_rows(g.ptype, params_lo)
    vis = jnp.ones((300,), jnp.float32)
    bt, bl_leaf = PK.bvh_intersect(g.ptype, g.accel, rows, vis, [],
                                   o, d, seed, interpret=True)
    local = np.asarray(order)[np.maximum(np.asarray(bl_leaf), 0)]

    hit = np.asarray(ref_t) < INFINITY
    np.testing.assert_allclose(np.asarray(bt), np.asarray(ref_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(local[hit], np.asarray(ref_l)[hit])

"""Primitive kernel tests: analytic hits plus a crossing/inside
consistency property (entry/exit crossings must agree with the volume
inside tests, which is exactly what the CSG validity logic relies on)."""

import numpy as np
import jax.numpy as jnp

from glome_tpu import geom
from glome_tpu.config import INFINITY

EPS = 1e-3


def _ray(o, d):
    d = np.asarray(d, dtype=np.float64)
    d = d / np.linalg.norm(d)
    return jnp.asarray([o], dtype=jnp.float32), jnp.asarray([d], dtype=jnp.float32)


def test_sphere_analytic():
    o, d = _ray([0, 0, -5], [0, 0, 1])
    t0, n0, t1, n1 = geom.sphere_hits2(jnp.asarray([0.0, 0, 0]), 1.0, o, d)
    np.testing.assert_allclose(t0, [4.0], rtol=1e-5)
    np.testing.assert_allclose(t1, [6.0], rtol=1e-5)
    np.testing.assert_allclose(n0[0], [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(n1[0], [0, 0, 1], atol=1e-5)


def test_sphere_miss():
    o, d = _ray([0, 0, -5], [0, 1, 0])
    t0, _, t1, _ = geom.sphere_hits2(jnp.asarray([0.0, 0, 0]), 1.0, o, d)
    assert float(t0[0]) >= INFINITY and float(t1[0]) >= INFINITY


def test_plane_slots():
    n = jnp.asarray([0.0, 1, 0])
    # downward ray enters the half-space y<0: crossing in slot 0
    o, d = _ray([0, 2, 0], [0, -1, 0])
    t0, n0, t1, _ = geom.plane_hits2(n, 0.0, o, d)
    np.testing.assert_allclose(t0, [2.0], rtol=1e-5)
    assert float(t1[0]) >= INFINITY
    # upward ray exits: slot 1
    o, d = _ray([0, -2, 0], [0, 1, 0])
    t0, _, t1, _ = geom.plane_hits2(n, 0.0, o, d)
    assert float(t0[0]) >= INFINITY
    np.testing.assert_allclose(t1, [2.0], rtol=1e-5)
    assert bool(geom.plane_inside(n, 0.0, jnp.asarray([0.0, -1, 0])))
    assert not bool(geom.plane_inside(n, 0.0, jnp.asarray([0.0, 1, 0])))


def test_box_entry_exit_normals():
    bmin = jnp.asarray([-1.0, -1, -1])
    bmax = jnp.asarray([1.0, 1, 1])
    o, d = _ray([-5, 0.2, 0.3], [1, 0, 0])
    t0, n0, t1, n1 = geom.box_hits2(bmin, bmax, o, d)
    np.testing.assert_allclose(t0, [4.0], rtol=1e-5)
    np.testing.assert_allclose(t1, [6.0], rtol=1e-5)
    np.testing.assert_allclose(n0[0], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(n1[0], [1, 0, 0], atol=1e-6)
    # origin inside: only the exit is ahead
    o, d = _ray([0, 0, 0], [0, 1, 0])
    t0, _, t1, n1 = geom.box_hits2(bmin, bmax, o, d)
    assert float(t0[0]) < 0 and abs(float(t1[0]) - 1.0) < 1e-5
    np.testing.assert_allclose(n1[0], [0, 1, 0], atol=1e-6)


def test_box_axis_parallel_ray():
    bmin = jnp.asarray([-1.0, -1, -1])
    bmax = jnp.asarray([1.0, 1, 1])
    o, d = _ray([0.5, 0.5, -9], [0, 0, 1])  # parallel to x and y slabs
    t0, _, t1, _ = geom.box_hits2(bmin, bmax, o, d)
    np.testing.assert_allclose(t0, [8.0], rtol=1e-5)
    np.testing.assert_allclose(t1, [10.0], rtol=1e-5)
    o, d = _ray([1.5, 0.5, -9], [0, 0, 1])  # outside the x slab
    t0, _, t1, _ = geom.box_hits2(bmin, bmax, o, d)
    assert float(t0[0]) >= INFINITY


def test_triangle():
    p1 = jnp.asarray([0.0, 0, 0])
    p2 = jnp.asarray([2.0, 0, 0])
    p3 = jnp.asarray([0.0, 2, 0])
    o, d = _ray([0.5, 0.5, -3], [0, 0, 1])
    t0, n0, t1, _ = geom.triangle_hits2(p1, p2, p3, o, d)
    np.testing.assert_allclose(t0, [3.0], rtol=1e-5)
    np.testing.assert_allclose(n0[0], [0, 0, 1], atol=1e-6)
    assert float(t1[0]) >= INFINITY
    o, d = _ray([1.5, 1.5, -3], [0, 0, 1])  # outside the hypotenuse
    t0, _, _, _ = geom.triangle_hits2(p1, p2, p3, o, d)
    assert float(t0[0]) >= INFINITY


def test_trianglenorm_interpolation():
    p1 = jnp.asarray([0.0, 0, 0])
    p2 = jnp.asarray([2.0, 0, 0])
    p3 = jnp.asarray([0.0, 2, 0])
    nz = jnp.asarray([0.0, 0, 1])
    nx = jnp.asarray([1.0, 0, 0])
    # hit at the first vertex -> normal == n1
    o, d = _ray([0.01, 0.01, -3], [0, 0, 1])
    t0, n0, _, _ = geom.trianglenorm_hits2(p1, p2, p3, nx, nz, nz, o, d)
    assert n0[0, 0] > 0.9


def test_disc():
    pos = jnp.asarray([0.0, 0, 0])
    n = jnp.asarray([0.0, 0, 1])
    o, d = _ray([0.5, 0, 5], [0, 0, -1])
    t0, n0, _, _ = geom.disc_hits2(pos, n, 1.0, o, d)
    np.testing.assert_allclose(t0, [5.0], rtol=1e-5)
    o, d = _ray([1.5, 0, 5], [0, 0, -1])
    t0, _, _, _ = geom.disc_hits2(pos, n, 1.0, o, d)
    assert float(t0[0]) >= INFINITY


def test_cylinder_side_and_caps():
    # side hit
    o, d = _ray([-5, 0, 1], [1, 0, 0])
    t0, n0, t1, n1 = geom.cylinder_hits2(1.0, 0.0, 2.0, o, d)
    np.testing.assert_allclose(t0, [4.0], rtol=1e-4)
    np.testing.assert_allclose(n0[0], [-1, 0, 0], atol=1e-5)
    # vertical ray through both caps
    o, d = _ray([0.2, 0.2, 5], [0, 0, -1])
    t0, n0, t1, n1 = geom.cylinder_hits2(1.0, 0.0, 2.0, o, d)
    np.testing.assert_allclose(t0, [3.0], rtol=1e-4)   # top cap z=2
    np.testing.assert_allclose(t1, [5.0], rtol=1e-4)   # bottom cap z=0
    np.testing.assert_allclose(n0[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(n1[0], [0, 0, -1], atol=1e-5)


def test_cone_side():
    # cone radius 1 at z=0 tapering to 0 at z=2, clipped [0, 2]
    # at z=1 radius is 0.5
    o, d = _ray([-5, 0, 1], [1, 0, 0])
    t0, n0, t1, n1 = geom.cone_hits2(1.0, 0.0, 2.0, 2.0, o, d)
    np.testing.assert_allclose(t0, [4.5], rtol=1e-4)
    np.testing.assert_allclose(t1, [5.5], rtol=1e-4)
    assert n0[0, 0] < 0 and n0[0, 2] > 0  # side normal tilts up


def test_cone_bottom_cap():
    o, d = _ray([0.2, 0, -3], [0, 0, 1])
    t0, n0, _, _ = geom.cone_hits2(1.0, 0.0, 2.0, 2.0, o, d)
    np.testing.assert_allclose(t0, [3.0], rtol=1e-4)
    np.testing.assert_allclose(n0[0], [0, 0, -1], atol=1e-5)


def _crossing_consistency(hits2, inside, params, n_rays=256, span=4.0, seed=0):
    """Entry/exit crossings must match the inside predicate: just after an
    entry the point is inside, just before it is outside (and vice versa
    for exits)."""
    rng = np.random.RandomState(seed)
    o = rng.uniform(-span, span, size=(n_rays, 3))
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j = jnp.asarray(o, dtype=jnp.float64)
    d_j = jnp.asarray(d, dtype=jnp.float64)
    t0, _, t1, _ = hits2(*params, o_j, d_j)
    t0 = np.asarray(t0)
    t1 = np.asarray(t1)

    def at(t, eps):
        return jnp.asarray(o + d * (t[:, None] + eps))

    fin0 = np.isfinite(t0) & (np.abs(t0) < 100)
    ins_after = np.asarray(inside(*params, at(t0, EPS)))
    ins_before = np.asarray(inside(*params, at(t0, -EPS)))
    assert (ins_after[fin0]).mean() > 0.99
    assert (~ins_before[fin0]).mean() > 0.99
    fin1 = np.isfinite(t1) & (np.abs(t1) < 100)
    outs_after = np.asarray(inside(*params, at(t1, EPS)))
    outs_before = np.asarray(inside(*params, at(t1, -EPS)))
    assert (~outs_after[fin1]).mean() > 0.99
    assert (outs_before[fin1]).mean() > 0.99


def test_sphere_crossing_consistency():
    _crossing_consistency(geom.sphere_hits2, geom.sphere_inside,
                          (jnp.asarray([0.3, -0.2, 0.5]), 1.3))


def test_box_crossing_consistency():
    _crossing_consistency(geom.box_hits2, geom.box_inside,
                          (jnp.asarray([-1.0, -0.5, -2.0]),
                           jnp.asarray([1.5, 1.0, 0.5])))


def test_cylinder_crossing_consistency():
    _crossing_consistency(geom.cylinder_hits2, geom.cylinder_inside,
                          (1.2, -0.5, 1.5))


def test_cone_crossing_consistency():
    _crossing_consistency(geom.cone_hits2, geom.cone_inside,
                          (1.0, 0.0, 1.8, 2.0))

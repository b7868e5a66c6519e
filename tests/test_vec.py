"""Vector/transform math tests (invariants mirror the reference's
runtime assertions: check_xfm, assert_norm, vrotate self-check)."""

import numpy as np
import pytest
import jax.numpy as jnp

from glome_tpu import vec as V
from glome_tpu import xfm as X
from glome_tpu.config import deg


def test_vdot_vcross():
    a = jnp.asarray([[1.0, 2, 3], [0, 1, 0]])
    b = jnp.asarray([[4.0, 5, 6], [0, 0, 1]])
    np.testing.assert_allclose(V.vdot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(V.vcross(a, b)[1], [1.0, 0, 0])


def test_vnorm_reflect():
    v = jnp.asarray([3.0, 0, 4])
    np.testing.assert_allclose(V.vlen(V.vnorm(v)), 1.0, rtol=1e-6)
    # reflect straight-down ray off a floor
    r = V.reflect(jnp.asarray([0.0, -1, 0]), jnp.asarray([0.0, 1, 0]))
    np.testing.assert_allclose(r, [0.0, 1, 0], atol=1e-7)


def test_bisect():
    b = V.bisect(jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 1, 0]))
    np.testing.assert_allclose(b, [2**-0.5, 2**-0.5, 0], rtol=1e-6)


def test_compose_order():
    # scale then translate: point (1,0,0) -> (2,0,0) -> (5,0,0)
    x = X.compose([X.scale([2, 2, 2]), X.translate([3, 0, 0])])
    np.testing.assert_allclose(x.point([1, 0, 0]), [5, 0, 0], atol=1e-12)
    # reversed application order gives (1,0,0)->(4,0,0)->(8,0,0)
    y = X.compose([X.translate([3, 0, 0]), X.scale([2, 2, 2])])
    np.testing.assert_allclose(y.point([1, 0, 0]), [8, 0, 0], atol=1e-12)


def test_xfm_inverse_roundtrip():
    x = X.compose([X.rotate([0, 0, 1], deg(30)),
                   X.scale([2, 3, 4]),
                   X.translate([1, -2, 0.5])])
    p = np.array([0.3, -1.2, 2.5])
    np.testing.assert_allclose(x.inv_point(x.point(p)), p, atol=1e-9)
    # check_xfm invariant (reference Vec.hs:466-477)
    X.check_xfm(x)


def test_rotate_requires_unit_axis():
    with pytest.raises(ValueError):
        X.rotate([0, 0, 2], deg(30))


def test_rotate_matches_known():
    x = X.rotate([0, 0, 1], deg(90))
    np.testing.assert_allclose(x.point([1, 0, 0]), [0, 1, 0], atol=1e-9)


def test_inv_normal_nonuniform_scale():
    # a plane normal under non-uniform scaling must use inverse transpose
    x = X.scale([2, 1, 1])
    n = x.inv_normal(np.array([1.0, 1.0, 0]))
    n = n / np.linalg.norm(n)
    # surface y = -x+c is stretched along x: the new normal tilts toward y
    assert n[1] > n[0] > 0


def test_orth():
    v2, v3 = X.orth(np.array([0.0, 0, 1]))
    assert abs(v2 @ v3) < 1e-9
    assert abs(v2 @ [0, 0, 1]) < 1e-9


def test_bbclip():
    near, far = V.bbclip(jnp.asarray([0.0, 0, -5]), 1.0 / jnp.asarray([1e-9, 1e-9, 1.0]),
                         jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
    assert near <= far
    np.testing.assert_allclose(near, 4.0, rtol=1e-5)
    np.testing.assert_allclose(far, 6.0, rtol=1e-5)

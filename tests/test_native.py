"""Native C++ BVH builder vs the numpy reference builder."""

import numpy as np
import pytest

from glome_tpu import accel


def _boxes(n=500, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.uniform(-20, 20, (n, 3))
    h = rng.uniform(0.1, 2.0, (n, 3))
    return c - h, c + h


def test_native_matches_numpy_builder():
    from glome_tpu import native
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    bmin, bmax = _boxes()
    a = accel.build_bvh(bmin, bmax, native=False)
    b = accel.build_bvh(bmin, bmax, native=True)
    # identical trees: same heuristic, same traversal arrays
    np.testing.assert_array_equal(a.leaf_start, b.leaf_start)
    np.testing.assert_array_equal(a.leaf_count, b.leaf_count)
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.order, b.order)
    np.testing.assert_allclose(a.bmin, b.bmin, rtol=1e-6)
    np.testing.assert_allclose(a.bmax, b.bmax, rtol=1e-6)


def test_structural_invariants():
    bmin, bmax = _boxes(n=2000, seed=1)
    b = accel.build_bvh(bmin, bmax)
    M = b.n_nodes
    # skip links point forward and stay in range
    assert np.all(b.skip > np.arange(M))
    assert np.all(b.skip <= M)
    # every prim appears exactly once in leaf order
    assert sorted(b.order.tolist()) == list(range(2000))
    # leaves cover their prims
    leaves = np.where(b.leaf_count > 0)[0]
    for li in leaves[:50]:
        s, c = b.leaf_start[li], b.leaf_count[li]
        for p in b.order[s:s + c]:
            assert np.all(b.bmin[li] <= bmin[p] + 1e-4)
            assert np.all(b.bmax[li] >= bmax[p] - 1e-4)

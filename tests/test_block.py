"""block_kernel coverage: giant groups (beyond the megakernel's SMEM
ceiling, BLOCK_MIN) stream as seeded block-dense launches.  Default
routing keeps TestScene-sized groups in the megakernel phases (the
faster path, tools/profile_shadow_ab.py), so the tests force routing
with a low threshold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import glome_tpu as G
from glome_tpu import megakernel as MK
from glome_tpu.intersect import intersect as jnp_intersect
from glome_tpu.materials import light


@pytest.fixture()
def low_threshold(monkeypatch):
    monkeypatch.setattr(MK, "BLOCK_MIN", 256)


def _scene(with_cons):
    rng = np.random.default_rng(3)
    objs = [G.sphere(tuple(rng.uniform(-4, 4, 3)), 0.3)
            for _ in range(700)]
    solid = G.group(objs)
    if with_cons:
        solid = G.difference(solid, G.sphere((0.0, 0.0, 0.0), 2.0))
    compiled = G.compile_scene(solid, [light((9, 9, 9), (1, 1, 1))])
    return compiled, compiled.arrays(), rng


@pytest.mark.parametrize("with_cons", [False, True])
def test_block_routing_matches_oracle(low_threshold, with_cons):
    compiled, arrays, rng = _scene(with_cons)
    plan = MK.get_plan(compiled)
    assert plan.blocks, "expected block routing under the low threshold"
    N = 1536
    o = rng.uniform(-6, 6, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    h_ref = jnp_intersect(compiled, arrays, 0, o_j, d_j)
    h = MK.mega_intersect(compiled, arrays, o_j, d_j)
    np.testing.assert_array_equal(np.asarray(h_ref.hit),
                                  np.asarray(h.hit))
    m = np.asarray(h_ref.hit)
    np.testing.assert_allclose(np.asarray(h.t)[m],
                               np.asarray(h_ref.t)[m],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.norm)[m],
                               np.asarray(h_ref.norm)[m], atol=1e-4)
    # shadow parity (any-hit semantics)
    tmax = jnp.full((N,), 7.0, jnp.float32)
    b_ref = np.asarray(jnp_intersect(compiled, arrays, 0, o_j, d_j,
                                     tmax=tmax, shadow=True).hit)
    b = np.asarray(MK.mega_shadow(compiled, arrays, o_j, d_j, tmax=tmax))
    np.testing.assert_array_equal(b_ref, b)


def test_default_threshold_keeps_testscene_in_phases():
    from glome_tpu.scenes import test_scene
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    plan = MK.get_plan(compiled)
    assert not plan.blocks
    assert any(p.kind in ("bvh", "bvh2") for p in plan.phases)

"""Perlin noise parity vs a direct scalar port of the reference
(GlomeVec/Data/Glome/Texture.hs:49-116)."""

import math

import numpy as np
import jax.numpy as jnp

from glome_tpu import noise as N


# -- scalar oracle: literal transcription of the Haskell semantics ---------

PHI = [3, 0, 2, 7, 4, 1, 5, 11, 8, 10, 9, 6]
GRAD = [v for v in
        [(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)]
        if 1.1 < math.sqrt(v[0]**2 + v[1]**2 + v[2]**2) < 1.5]


def omega(t):
    t = abs(t)
    t3 = t * t * t
    return -6 * t3 * t * t + 15 * t3 * t - 10 * t3 + 1


def gamma(i, j, k):
    a = PHI[abs(k) % 12]
    b = PHI[abs(j + a) % 12]
    c = PHI[abs(i + b) % 12]
    return GRAD[c]


def knot(i, j, k, v):
    g = gamma(i, j, k)
    return (omega(v[0]) * omega(v[1]) * omega(v[2])
            * (g[0] * v[0] + g[1] * v[1] + g[2] * v[2]))


def noise_scalar(x, y, z):
    i, j, k = math.floor(x), math.floor(y), math.floor(z)
    u, v, w = x - i, y - j, z - k
    total = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                total += knot(i + di, j + dj, k + dk,
                              (u - di, v - dj, w - dk))
    return total


def test_noise_matches_scalar_reference():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, size=(64, 3))
    got = np.asarray(N.noise(jnp.asarray(pts)))
    want = np.array([noise_scalar(*p) for p in pts])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_perlin_range():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-40, 40, size=(512, 3))
    p = np.asarray(N.perlin(jnp.asarray(pts)))
    # reference errors outside [0,1] (Texture.hs:109-116)
    assert p.min() >= 0.0 and p.max() <= 1.0


def test_waves():
    x = jnp.asarray([0.25, 0.75, 1.25])
    np.testing.assert_allclose(N.square_wave(x), [0, 1, 0])
    np.testing.assert_allclose(N.triangle_wave(x), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(N.sine_wave(jnp.asarray([0.0, 0.25])),
                               [0.5, 1.0], atol=1e-6)


def test_stripe():
    pos = jnp.asarray([[0.25, 0.0, 0.0]])
    w = N.stripe(pos, [1.0, 0, 0], N.triangle_wave)
    np.testing.assert_allclose(w, [0.5])


def test_turbulence_range():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-10, 10, size=(128, 3))
    t = np.asarray(N.turbulence(jnp.asarray(pts), 4))
    assert t.min() >= 0.0

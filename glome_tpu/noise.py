"""Procedural noise: waves, stripes and Perlin noise.

Vectorized port of GlomeVec/Data/Glome/Texture.hs semantics over
(..., 3) point batches.  The permutation and gradient tables are built
exactly like the reference (Texture.hs:57-65) so scalar outputs match
the Haskell implementation bit-for-bit in float64.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .vec import vdot


# -- interpolation functions (Texture.hs:11-28) ----------------------------

def square_wave(x):
    off = x - jnp.floor(x)
    return jnp.where(off < 0.5, 0.0, 1.0)


def triangle_wave(x):
    off = x - jnp.floor(x)
    return jnp.where(off < 0.5, off * 2.0, 2.0 - off * 2.0)


def sine_wave(x):
    return jnp.sin(x * 2.0 * np.pi) * 0.5 + 0.5


def lump_wave(x):
    return 1.0 - x * x * x


def stripe(pos, axis, interp):
    """Scalar stripe field: interp(dot(pos, axis)) (Texture.hs:35-40)."""
    return interp(vdot(pos, jnp.asarray(axis, dtype=pos.dtype)))


# -- Perlin noise (Texture.hs:43-116) --------------------------------------

# phi permutation (Texture.hs:57-58)
_PHI = np.array([3, 0, 2, 7, 4, 1, 5, 11, 8, 10, 9, 6], dtype=np.int32)

# gradient table: the 12 edge vectors of a cube, in list-comprehension
# order with 1.1 < |v| < 1.5 (Texture.hs:60-65)
_GRAD = np.array([v for v in
                  [[x, y, z] for x in (-1, 0, 1)
                   for y in (-1, 0, 1)
                   for z in (-1, 0, 1)]
                  if 1.1 < np.sqrt(np.dot(v, v)) < 1.5], dtype=np.float64)
assert _GRAD.shape == (12, 3)


def _omega(t):
    """Quintic falloff -6t^5 + 15t^4 - 10t^3 + 1 on |t| (Texture.hs:49-54)."""
    t = jnp.abs(t)
    t3 = t * t * t
    return -6.0 * t3 * t * t + 15.0 * t3 * t - 10.0 * t3 + 1.0


def _gamma(i, j, k, dtype):
    """Gradient at lattice point (i, j, k) (Texture.hs:67-72)."""
    phi = jnp.asarray(_PHI)
    a = phi[jnp.abs(k) % 12]
    b = phi[jnp.abs(j + a) % 12]
    c = phi[jnp.abs(i + b) % 12]
    return jnp.asarray(_GRAD, dtype=dtype)[c]


def _knot(i, j, k, v):
    g = _gamma(i, j, k, v.dtype)
    return (_omega(v[..., 0]) * _omega(v[..., 1]) * _omega(v[..., 2])
            * vdot(g, v))


# grad[phi[x]] fused into one table: the corner's last permutation step
# returns the gradient directly (saves one gather per corner)
_GRADPHI = _GRAD[_PHI]


def _phi_lut(idx):
    """phi[idx] as a select chain: 12-entry gathers at ray-batch widths
    are dispatch-overhead-bound on TPU; 11 compare-selects are pure VPU
    and fuse into the surrounding arithmetic."""
    out = jnp.full_like(idx, int(_PHI[0]))
    for t in range(1, 12):
        out = jnp.where(idx == t, int(_PHI[t]), out)
    return out


def _gradphi_lut(idx, dtype):
    """grad[phi[idx]] per xyz component, as select chains."""
    comps = []
    for c in range(3):
        out = jnp.full(idx.shape, float(_GRADPHI[0, c]), dtype=dtype)
        for t in range(1, 12):
            out = jnp.where(idx == t, float(_GRADPHI[t, c]), out)
        comps.append(out)
    return comps


def noise(p):
    """Perlin noise in roughly [-1, 1] (Texture.hs:92-107).

    Same arithmetic as summing _knot over the 8 corners (bit-identical;
    see tests/test_noise.py), but lattice hash lookups shared between
    corners are computed once: a(k) has 2 values, b(j, a) 4, and the
    final permutation is fused with the gradient table -- 14 table
    lookups per point instead of 32."""
    ijk = jnp.floor(p)
    i = ijk[..., 0].astype(jnp.int32)
    j = ijk[..., 1].astype(jnp.int32)
    k = ijk[..., 2].astype(jnp.int32)
    u = p - ijk
    om = [[_omega(u[..., c] - 0.0), _omega(u[..., c] - 1.0)]
          for c in range(3)]
    a = [_phi_lut(jnp.abs(k + dk) % 12) for dk in (0, 1)]
    b = [[_phi_lut(jnp.abs(j + dj + a[dk]) % 12) for dk in (0, 1)]
         for dj in (0, 1)]
    out = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    for di in (0, 1):
        ui = u[..., 0] - di
        for dj in (0, 1):
            uj = u[..., 1] - dj
            w_ij = om[0][di] * om[1][dj]
            for dk in (0, 1):
                g0, g1, g2 = _gradphi_lut(
                    jnp.abs(i + di + b[dj][dk]) % 12, p.dtype)
                uk = u[..., 2] - dk
                dot = g0 * ui + g1 * uj + g2 * uk
                out = out + w_ij * om[2][dk] * dot
    return out


def turbulence(p, n):
    """Octave sum of |noise|; octaves get *coarser* (Texture.hs:85-90)."""
    t = jnp.abs(noise(p))
    if n <= 1:
        return t
    return t + 0.5 * turbulence(p * 0.5, n - 1)


def perlin(p):
    """Perlin noise mapped to [0, 1] (Texture.hs:109-116)."""
    return (noise(p) + 1.0) * 0.5

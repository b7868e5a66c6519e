"""Vector math over batched jnp arrays.

The reference implements scalar 3-vector math on an unboxed record
(GlomeVec/Data/Glome/Vec.hs:105-402).  Here every op is defined over
arrays of shape (..., 3) so the whole renderer is a single SPMD array
program: a "Vec" is the trailing axis, and batches of rays/points are
leading axes.  All functions work with both numpy and jax.numpy inputs
(host-side scene building uses numpy float64, device code jnp float32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import DELTA, INFINITY


def _xp(a):
    # jnp operations accept numpy arrays and return jnp arrays; for
    # host-side float64 paths callers use the numpy twin in xfm.py.
    return jnp


def vec(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype=jnp.result_type(float, x)),
        jnp.asarray(y, dtype=jnp.result_type(float, y)),
        jnp.asarray(z, dtype=jnp.result_type(float, z))), axis=-1)


def vdot(a, b):
    """Dot product (reference Vec.hs:185-187)."""
    return jnp.sum(a * b, axis=-1)


def vcross(a, b):
    """Cross product (reference Vec.hs:193-198)."""
    return jnp.cross(a, b)


def vlensqr(v):
    return vdot(v, v)


def vlen(v):
    return jnp.sqrt(vdot(v, v))


def vnorm(v):
    """Normalize (reference Vec.hs:314-317).

    Guarded against zero vectors: dead queue lanes carry d = 0, and an
    unguarded 1/sqrt(0) = inf turns their (value-masked) products into
    NaN whose *backward cotangents* poison whole-parameter gradients
    (sum over lanes).  max() is exact for any real magnitude, so live
    lanes are bit-identical."""
    inv = 1.0 / jnp.sqrt(jnp.maximum(vdot(v, v), 1e-30))
    return v * inv[..., None]


def vinvert(v):
    return -v


@jax.custom_vjp
def finite_grad(x):
    """Identity whose backward zeroes non-finite cotangent LANES.

    Differentiable-render backward passes hit isolated singular lanes
    (exact tangencies, zero-length dead rays, grazing transposes);
    their inf/NaN cotangents are meaningless there, but one such lane
    poisons the whole accumulated parameter gradient the moment a
    gather-transpose sums over lanes.  Placing this at the per-lane
    gather boundary filters BEFORE accumulation -- the per-lane
    version of the optimizer's existing non-finite-update policy."""
    return x


def _finite_grad_fwd(x):
    return x, None


def _finite_grad_bwd(_, ct):
    return (jnp.where(jnp.isfinite(ct), ct, 0.0),)


finite_grad.defvjp(_finite_grad_fwd, _finite_grad_bwd)


def vscale(v, s):
    return v * jnp.asarray(s)[..., None]


def vscaleadd(a, b, s):
    """a + b * s (reference Vec.hs:302-306)."""
    return a + b * jnp.asarray(s)[..., None]


def bisect(a, b):
    """Unit bisector of two (unit) vectors (reference Vec.hs:331-332)."""
    return vnorm(a + b)


def vdist(a, b):
    return vlen(b - a)


def reflect(v, norm):
    """Reflect v off a surface with normal `norm` (reference Vec.hs:340-342)."""
    return vscaleadd(v, norm, -2.0 * vdot(v, norm))


def vrcp(v):
    return 1.0 / v


def ray_move(origin, direction, d):
    """Advance a ray origin along its direction (reference Vec.hs:361-363)."""
    return vscaleadd(origin, direction, d)


def plane_int_dist(orig, direction, p, norm):
    """Distance along ray to the plane through p with normal `norm`
    (reference Vec.hs:391-394)."""
    return -vdot(norm, orig - p) / vdot(norm, direction)


# --- bounding boxes -------------------------------------------------------
# A Bbox is a pair of (..., 3) arrays (bmin, bmax); reference Vec.hs:646.

def bbjoin(a, b):
    return jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])


def bboverlap(a, b):
    return jnp.maximum(a[0], b[0]), jnp.minimum(a[1], b[1])


def bbinside(bb, pt):
    """Point-in-box, boundary inclusive (reference Vec.hs:662-664)."""
    bmin, bmax = bb
    return jnp.all((bmin <= pt) & (pt <= bmax), axis=-1)


def bbsa(bb):
    """Surface area, clamped at 0 (reference Vec.hs:694-697)."""
    d = bb[1] - bb[0]
    sa = 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2]
                + d[..., 1] * d[..., 2])
    return jnp.maximum(sa, 0.0)


def empty_bbox():
    return (jnp.full((3,), INFINITY), jnp.full((3,), -INFINITY))


def everything_bbox():
    return (jnp.full((3,), -INFINITY), jnp.full((3,), INFINITY))


def bbclip(orig, inv_dir, bmin, bmax):
    """Ray/AABB slab clip with reciprocal directions; returns (near, far).
    Hit iff near <= far (caller decides).  Reference Vec.hs:725-741."""
    t1 = (bmin - orig) * inv_dir
    t2 = (bmax - orig) * inv_dir
    near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return near, far

"""RGBA color algebra over (..., 4) arrays.

Port of the alpha-compositing semantics in GlomeTrace/Data/Glome/Clr.hs.
A ColorA is the trailing 4-axis (r, g, b, a); batches are leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def colora(r, g, b, a):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(r, jnp.result_type(float, r)),
        jnp.asarray(g, jnp.result_type(float, g)),
        jnp.asarray(b, jnp.result_type(float, b)),
        jnp.asarray(a, jnp.result_type(float, a))), axis=-1)


def ca_transparent(shape=(), dtype=jnp.float32):
    return jnp.zeros(shape + (4,), dtype=dtype)


def ca_black(shape=(), dtype=jnp.float32):
    c = jnp.zeros(shape + (4,), dtype=dtype)
    return c.at[..., 3].set(1.0)


def cascale(c, s):
    """Scale rgb, leave alpha (reference Clr.hs:48-50)."""
    return jnp.concatenate([c[..., :3] * jnp.asarray(s)[..., None],
                            c[..., 3:]], axis=-1)


def aclamp(x):
    return jnp.clip(x, 0.0, 1.0)


def caweight(c1, c2, weight):
    """Lerp: c1*w + c2*(1-w) on all four channels (reference Clr.hs:87-91)."""
    w = jnp.asarray(weight)[..., None]
    return c1 * w + c2 * (1.0 - w)


def casum(cs):
    """Additive layers: rgb = sum(rgb_i * a_i); a = 1 - prod(1 - clamp a_i)
    (reference Clr.hs:82-103).  `cs` is a sequence of (...,4) colors."""
    rgb = sum(c[..., :3] * c[..., 3:4] for c in cs)
    trans = 1.0
    for c in cs:
        trans = trans * (1.0 - aclamp(c[..., 3]))
    a = 1.0 - trans
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def cafold(ca, cb):
    """Layer cb under ca (the over operator; reference Clr.hs:106-113)."""
    trans = 1.0 - ca[..., 3:4]
    rgb = ca[..., :3] + cb[..., :3] * trans * cb[..., 3:4]
    a = ca[..., 3:4] + cb[..., 3:4] * trans
    return jnp.concatenate([rgb, a], axis=-1)

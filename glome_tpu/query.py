"""Point queries: `inside` and `metainfo` over a packed scene.

Parity with the reference Solid methods `inside` (Solid.hs:166) and
`get_metainfo` (Solid.hs:200; BIH point traversal Bih.hs:550-585):
given world points, report whether any scene solid contains them and
the texture/tag stacks of a containing leaf solid.

CSG semantics (Csg.hs:92-101): a point is inside a Difference iff
inside A and not inside B; inside an Intersection iff inside every
member (empty intersection => True).  Plain prims use their own
`inside` kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .compile import (CompiledScene, TEX_DEPTH, TAG_DEPTH,
                      materialize_scene_params)
from .intersect import clause_in, group_inside_any, group_inside


def inside(compiled: CompiledScene, arrays, pts, scene_id: int = 0):
    """(...,) bool: any solid of the scene contains each point."""
    sc = compiled.scenes[scene_id]
    garrs = materialize_scene_params(sc, arrays["scenes"][scene_id])
    pts = jnp.asarray(pts)
    out = jnp.zeros(pts.shape[:-1], dtype=bool)
    # plain prims (csg members are handled per csg object below)
    for gi, g in enumerate(sc.groups):
        if g.size == 0 or np.any(g.csg_id >= 0):
            continue
        out = out | group_inside_any(sc, garrs, gi, np.arange(g.size), pts)
    for csg in sc.csgs:
        ok = jnp.ones(pts.shape[:-1], dtype=bool)
        for clause in csg.clauses:
            inn = clause_in(sc, garrs, clause, pts)
            ok = ok & (inn == clause.positive)
        out = out | ok
    return out


def metainfo(compiled: CompiledScene, arrays, pts, scene_id: int = 0):
    """(found, tex_stack, tag_stack) of the first containing leaf solid
    per point (stacks are (-1)-padded int32 id arrays; resolve tag ids
    through compiled.tag_names)."""
    sc = compiled.scenes[scene_id]
    garrs = materialize_scene_params(sc, arrays["scenes"][scene_id])
    pts = jnp.asarray(pts)
    shape = pts.shape[:-1]
    found = jnp.zeros(shape, dtype=bool)
    tex = jnp.full(shape + (TEX_DEPTH,), -1, jnp.int32)
    tag = jnp.full(shape + (TAG_DEPTH,), -1, jnp.int32)

    def take(first_found, g_tex, g_tag, ins):
        nonlocal found, tex, tag
        any_here = jnp.any(ins, axis=-1)
        first = jnp.argmax(ins, axis=-1)
        new_tex = jnp.asarray(g_tex)[first]
        new_tag = jnp.asarray(g_tag)[first]
        use = any_here & ~found
        tex = jnp.where(use[..., None], new_tex, tex)
        tag = jnp.where(use[..., None], new_tag, tag)
        found = found | any_here

    for gi, g in enumerate(sc.groups):
        if g.size == 0 or np.any(g.csg_id >= 0):
            continue
        ins = group_inside(sc, garrs, gi, np.arange(g.size), pts)
        take(found, g.tex_stack, g.tag_stack, ins)

    for csg in sc.csgs:
        ok = jnp.ones(shape, dtype=bool)
        for clause in csg.clauses:
            inn = clause_in(sc, garrs, clause, pts)
            ok = ok & (inn == clause.positive)
        # containing leaf = first containing member of the first
        # positive clause (the A side / first intersection member)
        for clause in csg.clauses:
            if not clause.positive:
                continue
            for gi, idx in clause.members:
                g = sc.groups[gi]
                ins = group_inside(sc, garrs, gi, idx, pts)
                ins = ins & ok[..., None]
                take(found, g.tex_stack[idx], g.tag_stack[idx], ins)
            break
    return found, tex, tag

"""Vectorized ray-scene intersection with CSG clause semantics.

This replaces the reference's polymorphic recursive `rayint` dispatch
(Solid.hs:146, Csg.hs:33-90) with data-parallel passes over the packed
SoA prim groups from compile.py:

  - every primitive yields up to two boundary-crossing candidates
    (geom.py *_hits2);
  - plain prims use standard nearest-hit semantics (entry if t>0 else
    exit, matching each reference rayint_*);
  - CSG prims keep both candidates and filter them by *clause validity*:
    a candidate on prim p of CSG object G is a visible surface of G iff
    every other clause of G is satisfied at the hit point, and -- for
    difference-B (negative clause) candidates -- the ray is exiting the
    clause set (Csg.hs:38: `inside sa bp && not (inside sb (bp+delta*dir))`);
  - difference-B winners with `useatex` are retextured from the first
    containing A member (get_metainfo semantics, Csg.hs:39-41).

All loops over groups/chunks/clauses are static Python; the emitted
program is pure vector code.  Memory is bounded by chunking the prim
axis; callers bound the ray axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from . import geom
from .compile import CompiledScene, PackedScene, PrimGroup, TEX_DEPTH, TAG_DEPTH
from .config import DELTA, INFINITY
from .vec import vnorm, vscaleadd
from .xfm import apply_point, apply_vector, apply_normal_T

PRIM_CHUNK = 4096


def _mega_enabled():
    """The single-launch Pallas megakernel path (megakernel.py) serves
    all intersection on TPU; the jnp pass-per-group pipeline below is
    the CPU / oracle path (and the megakernel's parity reference).
    GLOME_FORCE_MEGA=1 routes CPU through the megakernel in interpret
    mode (the multi-chip dry run uses this to exercise the production
    path on the virtual mesh)."""
    import os
    import jax
    if os.environ.get("GLOME_FORCE_MEGA", "0") == "1":
        return True
    return (jax.default_backend() == "tpu"
            and os.environ.get("GLOME_DISABLE_MEGA", "0") != "1")


class Hit(NamedTuple):
    """Per-ray nearest-hit record (the reference Rayint, Solid.hs:20-28)."""
    t: jnp.ndarray          # (N,) world distance; INFINITY = miss
    hit: jnp.ndarray        # (N,) bool
    pos: jnp.ndarray        # (N, 3)
    norm: jnp.ndarray       # (N, 3)
    obj_o: jnp.ndarray      # (N, 3) object-space ray (riray for Warp)
    obj_d: jnp.ndarray      # (N, 3)
    tex_stack: jnp.ndarray  # (N, TEX_DEPTH) texture ids, innermost first
    tag_stack: jnp.ndarray  # (N, TAG_DEPTH) tag ids
    prim_serial: jnp.ndarray  # (N,) global prim id, -1 = miss


def _kernel_hits2(ptype, params, o, d):
    if ptype == "sphere":
        return geom.sphere_hits2(params["center"], params["radius"], o, d)
    if ptype == "plane":
        return geom.plane_hits2(params["norm"], params["offset"], o, d)
    if ptype == "box":
        return geom.box_hits2(params["bmin"], params["bmax"], o, d)
    if ptype == "triangle":
        return geom.triangle_hits2(params["p1"], params["p2"], params["p3"], o, d)
    if ptype == "trianglenorm":
        return geom.trianglenorm_hits2(params["p1"], params["p2"], params["p3"],
                                       params["n1"], params["n2"], params["n3"],
                                       o, d)
    if ptype == "disc":
        return geom.disc_hits2(params["pos"], params["norm"], params["rsqr"], o, d)
    if ptype == "cylinder":
        return geom.cylinder_hits2(params["radius"], params["h1"], params["h2"], o, d)
    if ptype == "cone":
        return geom.cone_hits2(params["radius"], params["clip1"],
                               params["clip2"], params["height"], o, d)
    raise ValueError(ptype)


def _kernel_inside(ptype, params, p):
    if ptype == "sphere":
        return geom.sphere_inside(params["center"], params["radius"], p)
    if ptype == "plane":
        return geom.plane_inside(params["norm"], params["offset"], p)
    if ptype == "box":
        return geom.box_inside(params["bmin"], params["bmax"], p)
    if ptype in ("triangle", "trianglenorm", "disc"):
        return jnp.zeros(p.shape[:-1], dtype=bool)
    if ptype == "cylinder":
        return geom.cylinder_inside(params["radius"], params["h1"], params["h2"], p)
    if ptype == "cone":
        return geom.cone_inside(params["radius"], params["clip1"],
                                params["clip2"], params["height"], p)
    raise ValueError(ptype)


def _slice_params(garr, g: PrimGroup, sl):
    """Static chunk slice of a group's parameter arrays, expanded for
    broadcasting against a leading ray axis."""
    out = {}
    for k, v in garr.items():
        if k in ("m_inv", "m_fwd"):
            continue
        out[k] = v[sl]
    return out


def group_inside(scene_static: PackedScene, garrs, gi: int, idx: np.ndarray,
                 pts, chunk=PRIM_CHUNK):
    """Inside test of member prims (group gi, static local indices idx) at
    points pts (..., 3).  Returns (..., len(idx)) bools."""
    g = scene_static.groups[gi]
    ga = garrs[gi]
    outs = []
    for s in range(0, len(idx), chunk):
        sub = idx[s:s + chunk]
        params = {k: v[sub] for k, v in ga.items()
                  if k not in ("m_inv", "m_fwd")}
        p = pts[..., None, :]
        if g.m_inv is not None:
            minv = ga["m_inv"][sub]
            p = apply_point(minv, p)
        outs.append(_kernel_inside(g.ptype, params, p))
    return jnp.concatenate(outs, axis=-1)


def group_inside_any(scene_static: PackedScene, garrs, gi: int,
                     idx: np.ndarray, pts, chunk: int = 32):
    """any(inside) over member prims without materializing the full
    (..., M) membership matrix: a lax.scan over member chunks keeps the
    peak at (..., chunk).  Used for big clause sets (the lattice shell
    in TestScene) where the dense matrix was tens of GB."""
    import jax

    g = scene_static.groups[gi]
    ga = garrs[gi]
    M = len(idx)
    if M <= 2 * chunk:
        return jnp.any(group_inside(scene_static, garrs, gi, idx, pts),
                       axis=-1)
    C = (M + chunk - 1) // chunk
    padM = C * chunk - M
    idx_p = np.concatenate([idx, np.zeros(padM, idx.dtype)]) if padM else idx
    validrow = np.ones(C * chunk, bool)
    if padM:
        validrow[M:] = False

    def stack(v):
        return v[idx_p].reshape((C, chunk) + v.shape[1:])

    params_s = {k: stack(v) for k, v in ga.items()
                if k not in ("m_inv", "m_fwd")}
    xs = {"p": params_s, "v": jnp.asarray(validrow.reshape(C, chunk))}
    if g.m_inv is not None:
        xs["m"] = stack(ga["m_inv"])

    def step(carry, x):
        p = pts[..., None, :]
        if g.m_inv is not None:
            p = apply_point(x["m"], p)
        ins = _kernel_inside(g.ptype, x["p"], p) & x["v"]
        return carry | jnp.any(ins, axis=-1), None

    # derive the init from pts so its manual-axes "varying" status
    # matches the body output under shard_map (JAX scan vma rule)
    init = pts[..., 0] > jnp.inf
    out, _ = jax.lax.scan(step, init, xs)
    return out


def clause_in(scene_static, garrs, clause, pts):
    """IN(clause set) at pts (..., 3) -> (...) bool (group `inside`
    semantics: any member contains the point, Solid.hs:331)."""
    out = jnp.zeros(pts.shape[:-1], dtype=bool)
    for gi, idx in clause.members:
        out = out | group_inside_any(scene_static, garrs, gi, idx, pts)
    return out


def clause_first_inside(scene_static, garrs, clause, pts):
    """First member (ordinal within the clause's flattened member list)
    containing each point; returns (found, ordinal)."""
    found = jnp.zeros(pts.shape[:-1], dtype=bool)
    ordinal = jnp.zeros(pts.shape[:-1], dtype=jnp.int32)
    base = 0
    for gi, idx in clause.members:
        ins = group_inside(scene_static, garrs, gi, idx, pts)  # (..., M)
        any_here = jnp.any(ins, axis=-1)
        first = jnp.argmax(ins, axis=-1).astype(jnp.int32) + base
        take = any_here & ~found
        ordinal = jnp.where(take, first, ordinal)
        found = found | any_here
        base += len(idx)
    return found, ordinal


def _gather_params(ga, local):
    return {k: v[local] for k, v in ga.items() if k not in ("m_inv", "m_fwd")}


def _inline_valid(sc, garrs, constraints, pts):
    """Evaluate a group's static inline CSG constraint list at pts."""
    ok = jnp.ones(pts.shape[:-1], dtype=bool)
    for positive, members in constraints:
        inn = jnp.zeros(pts.shape[:-1], dtype=bool)
        for gi, idx in members:
            inn = inn | group_inside_any(sc, garrs, gi, idx, pts)
        ok = ok & (inn == positive)
    return ok


def _member_interval(sc, garrs, gi, li, o, d):
    """Exact parameter interval [t_in, t_out] of one convex volumetric
    prim along each ray, as extended reals (empty = [INF, INF], which
    max/min handles correctly for intersections).  World distances."""
    g = sc.groups[gi]
    ga = garrs[gi]
    params = {k: v[li] for k, v in ga.items() if k not in ("m_inv", "m_fwd")}
    if g.m_inv is not None:
        minv = ga["m_inv"][li]
        oo = apply_point(minv, o)
        dd = apply_vector(minv, d)
        ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
        ou, du = oo, dd * ils[..., None]
    else:
        ou, du, ils = o, d, None
    if g.ptype == "plane":
        # half-space interval (plane_hits2 slots encode crossing kind,
        # not the interval): entering -> [t, +INF); exiting -> (-INF, t];
        # parallel -> all-or-nothing by inside(o)
        n, off = params["norm"], params["offset"]
        dn = jnp.sum(n * du, axis=-1)
        t = -(jnp.sum(n * ou, axis=-1) - off) / jnp.where(dn == 0.0, 1.0, dn)
        ins = jnp.sum(n * ou, axis=-1) < off
        t0 = jnp.where(dn < 0.0, t, -INFINITY)
        t1 = jnp.where(dn > 0.0, t, INFINITY)
        t0 = jnp.where(dn == 0.0, jnp.where(ins, -INFINITY, INFINITY), t0)
        t1 = jnp.where(dn == 0.0, jnp.where(ins, INFINITY, -INFINITY), t1)
    else:
        t0, _, t1, _ = _kernel_hits2(g.ptype, params, ou, du)
    if ils is not None:
        t0 = jnp.where(jnp.abs(t0) >= INFINITY, t0, t0 * ils)
        t1 = jnp.where(jnp.abs(t1) >= INFINITY, t1, t1 * ils)
    return t0, t1


def _convex_members(sc, csg):
    """Flattened member list [(gi, li)] of a convex csg in clause order."""
    out = []
    for clause in csg.clauses:
        for gi, idx in clause.members:
            for li in idx:
                out.append((gi, int(li)))
    return out


def convex_pass(sc, garrs, csg, o, d, seed_t, shadow: bool):
    """Direct interval intersection of one convex CSG object: the hit is
    the max of member entries if ahead of the origin, else the min of
    member exits (origin inside).  Select-only (winner finalized
    differentiably by _finalize_convex).  Returns (t, ordinal, exit?)."""
    import jax

    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    garrs = jax.tree.map(jax.lax.stop_gradient, garrs)

    members = _convex_members(sc, csg)
    g0, l0 = members[0]
    vis = ((~sc.groups[g0].noshadow[l0]) if shadow
           else (~sc.groups[g0].onlyshadow[l0]))
    N = o.shape[0]
    if not bool(vis):
        return (jnp.full((N,), INFINITY, o.dtype),
                jnp.zeros((N,), jnp.int32), jnp.zeros((N,), bool))
    t_in = jnp.full((N,), -INFINITY, o.dtype) + 0.0 * o[:, 0]
    t_out = jnp.full((N,), INFINITY, o.dtype) + 0.0 * o[:, 0]
    a_in = jnp.zeros((N,), jnp.int32)
    a_out = jnp.zeros((N,), jnp.int32)
    for k, (gi, li) in enumerate(members):
        t0, t1 = _member_interval(sc, garrs, gi, li, o, d)
        upd0 = t0 > t_in
        t_in = jnp.where(upd0, t0, t_in)
        a_in = jnp.where(upd0, k, a_in)
        upd1 = t1 < t_out
        t_out = jnp.where(upd1, t1, t_out)
        a_out = jnp.where(upd1, k, a_out)
    entering = t_in > 0.0
    t_cand = jnp.where(entering, t_in, t_out)
    ok = (t_in <= t_out) & (t_cand > 0.0) & (t_cand < seed_t) \
        & (t_cand < INFINITY)
    return (jnp.where(ok, t_cand, INFINITY),
            jnp.where(entering, a_in, a_out), ~entering)


def _finalize_convex(sc, garrs, csg, o, d, t, ordinal, is_exit):
    """Differentiable recompute of the winning member's surface for rays
    whose global best came from a convex csg object."""
    members = _convex_members(sc, csg)
    N = o.shape[0]
    tsel = t
    n = jnp.zeros((N, 3), o.dtype)
    oo_sel, du_sel = o, d
    tex = jnp.full((N, TEX_DEPTH), -1, jnp.int32)
    tag = jnp.full((N, TAG_DEPTH), -1, jnp.int32)
    ser = jnp.full((N,), -1, jnp.int32)
    for k, (gi, li) in enumerate(members):
        g = sc.groups[gi]
        ga = garrs[gi]
        params = {kk: v[li] for kk, v in ga.items()
                  if kk not in ("m_inv", "m_fwd")}
        if g.m_inv is not None:
            minv = ga["m_inv"][li]
            oo = apply_point(minv, o)
            dd = apply_vector(minv, d)
            ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
            du = dd * ils[..., None]
            t0k, n0k, t1k, n1k = _kernel_hits2(g.ptype, params, oo, du)
            t0k = t0k * ils
            t1k = t1k * ils
            n0k = vnorm(apply_normal_T(minv, n0k))
            n1k = vnorm(apply_normal_T(minv, n1k))
        else:
            oo, du = o, d
            t0k, n0k, t1k, n1k = _kernel_hits2(g.ptype, params, o, d)
        sel = ordinal == k
        tk = jnp.where(is_exit, t1k, t0k)
        # clamp differentiable recompute to the selected value when the
        # kernels disagree numerically (e.g. tangency)
        tk = jnp.where(jnp.abs(tk - t) < 1e-2 * (1.0 + jnp.abs(t)), tk, t)
        nk = jnp.where(is_exit[:, None], n1k, n0k)
        tsel = jnp.where(sel, tk, tsel)
        n = jnp.where(sel[:, None], nk, n)
        oo_sel = jnp.where(sel[:, None], oo, oo_sel)
        du_sel = jnp.where(sel[:, None], du, du_sel)
        tex = jnp.where(sel[:, None], jnp.asarray(g.tex_stack)[li][None], tex)
        tag = jnp.where(sel[:, None], jnp.asarray(g.tag_stack)[li][None], tag)
        ser = jnp.where(sel, int(g.prim_serial[li]), ser)
    return tsel, n, oo_sel, du_sel, tex, tag, ser


TILE = 256  # rays per traversal packet


def brute_scan(sc, garrs, gi, o, d, seed_t, shadow: bool, chunk: int = 256):
    """Dense intersection of one plain/inline group via lax.scan over
    prim chunks.

    On a TPU, lockstep dense tests of a few thousand prims against the
    whole ray batch outperform divergent tree traversal: the work is
    pure VPU math with zero gathers and zero control flow.  Groups
    above ACCEL_MIN_SIZE use the tile-packet BVH instead.  The scan
    only *selects* (best t, prim); the winner is re-evaluated
    differentiably in _finalize_winner.
    """
    import jax

    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    seed_t = jax.lax.stop_gradient(seed_t)
    garrs = jax.tree.map(jax.lax.stop_gradient, garrs)

    g = sc.groups[gi]
    ga = garrs[gi]
    P = g.size
    if g.constraints:
        chunk = min(chunk, 64)
    chunk = min(chunk, P)
    C = (P + chunk - 1) // chunk
    padP = C * chunk - P
    transformed = g.m_inv is not None

    def stack(v, fill=0.0):
        if padP:
            v = jnp.concatenate(
                [v, jnp.full((padP,) + v.shape[1:], fill, v.dtype)])
        return v.reshape((C, chunk) + v.shape[1:])

    params_s = {k: stack(v) for k, v in ga.items()
                if k not in ("m_inv", "m_fwd")}
    xs = {"params": params_s,
          "local": stack(jnp.arange(P, dtype=jnp.int32), fill=0)}
    vis_np = (~g.noshadow) if shadow else (~g.onlyshadow)
    if padP:
        vis_np = np.concatenate([vis_np, np.zeros(padP, bool)])
    xs["vis"] = jnp.asarray(vis_np.reshape(C, chunk))
    if transformed:
        xs["m_inv"] = stack(ga["m_inv"])

    N = o.shape[0]
    o1 = o[:, None, :]
    d1 = d[:, None, :]

    def step(carry, x):
        bt, bl = carry
        prow = x["params"]
        if transformed:
            minv = x["m_inv"][None]                      # (1, chunk, 3, 4)
            oo = apply_point(minv, o1)                   # (N, chunk, 3)
            dd = apply_vector(minv, d1)
            ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
            du = dd * ils[..., None]
            t0c, _, t1c, _ = _kernel_hits2(g.ptype, prow, oo, du)
            t0c = jnp.where(t0c >= INFINITY, INFINITY, t0c * ils)
            t1c = jnp.where(t1c >= INFINITY, INFINITY, t1c * ils)
        else:
            t0c, _, t1c, _ = _kernel_hits2(g.ptype, prow, o1, d1)
        test = x["vis"][None, :]
        v0 = test & (t0c > 0.0) & (t0c < bt[:, None])
        v1 = test & (t1c > 0.0) & (t1c < bt[:, None])
        if g.constraints:
            x0 = vscaleadd(o1, d1, t0c)
            x1 = vscaleadd(o1, d1, t1c)
            pts = jnp.stack([x0, x1], axis=2)            # (N, chunk, 2, 3)
            okc = _inline_valid(sc, garrs, g.constraints, pts)
            v0 = v0 & okc[..., 0]
            v1 = v1 & okc[..., 1]
        tc = jnp.where(v0, t0c, jnp.where(v1, t1c, INFINITY))
        arg = jnp.argmin(tc, axis=-1)
        tbest = jnp.take_along_axis(tc, arg[:, None], axis=-1)[:, 0]
        lbest = x["local"][arg]
        better = tbest < bt
        bt = jnp.where(better, tbest, bt)
        bl = jnp.where(better, lbest, bl)
        return (bt, bl), None

    # init carries derived from the (possibly sharding-varying) ray
    # arrays so scan's manual-axes check passes under shard_map
    init = (seed_t + 0.0 * o[:, 0],
            (o[:, 0] * 0.0).astype(jnp.int32) - 1)
    (bt, bl), _ = jax.lax.scan(step, init, xs)
    return bt, bl


def dense_pass(sc, garrs, gi, o, d, seed_t, shadow: bool):
    """Dense group intersection: the Pallas VMEM-tiled kernel on TPU,
    the lax.scan fallback elsewhere (identical semantics)."""
    import jax

    if jax.default_backend() != "tpu":
        return brute_scan(sc, garrs, gi, o, d, seed_t, shadow)

    from . import pallas_kernels as PK
    g = sc.groups[gi]
    sg = jax.lax.stop_gradient
    ga = jax.tree.map(sg, garrs[gi])
    pm = PK.pack_params_T(g.ptype, {k: v for k, v in ga.items()
                                    if k not in ("m_inv", "m_fwd")})
    minv = ga.get("m_inv")
    vis_np = ((~g.noshadow) if shadow else (~g.onlyshadow)).astype(np.float32)
    cons = PK.pack_constraints(sc, garrs, g)
    bbox = PK.block_aabbs(g.ptype,
                          {k: v for k, v in ga.items()
                           if k not in ("m_inv", "m_fwd")},
                          ga.get("m_fwd"), g.size, PK.BP)
    return PK.dense_intersect(g.ptype, pm, minv, jnp.asarray(vis_np), cons,
                              sg(o), sg(d), sg(seed_t),
                              block_bbox=bbox, shadow=shadow)


def bvh_dispatch(sc, garrs, gi, o, d, seed_t, shadow: bool):
    """Route an accelerated group to the per-tile Pallas traversal
    kernel on TPU (untransformed groups; the whole node table and prim
    params live in SMEM), else the lockstep jnp traversal."""
    import jax

    g = sc.groups[gi]
    if jax.default_backend() != "tpu" or g.m_inv is not None:
        return bvh_pass(sc, garrs, gi, o, d, seed_t, shadow)
    from . import pallas_kernels as PK
    sg = jax.lax.stop_gradient
    ga = jax.tree.map(sg, garrs[gi])
    order = np.asarray(g.accel.order)
    params_lo = {k: ga[k][order] for k in ga
                 if k not in ("m_inv", "m_fwd")}
    rows = PK.pack_params_rows(g.ptype, params_lo)
    vis_np = (((~g.noshadow) if shadow else (~g.onlyshadow))[order]
              .astype(np.float32))
    cons = PK.pack_constraints(sc, garrs, g)
    bt, bl_leaf = PK.bvh_intersect(g.ptype, g.accel, rows,
                                   jnp.asarray(vis_np), cons,
                                   sg(o), sg(d), sg(seed_t), shadow=shadow)
    local = jnp.asarray(order)[jnp.maximum(bl_leaf, 0)]
    return bt, jnp.where(bl_leaf >= 0, local.astype(jnp.int32), -1)


def bvh_pass(sc, garrs, gi, o, d, seed_t, shadow: bool, tile: int = TILE):
    """Tile-packet skip-link BVH traversal over one accelerated group.

    TPU-native traversal design: per-ray node pointers would need a
    gather of node data per ray per step, and random gathers are the
    slowest primitive on a TPU.  Instead rays are grouped into tiles of
    `tile` coherent rays sharing ONE node pointer (the reference's
    4-wide ray packets, Bih.hs:428-508, scaled to hundreds): each step
    gathers one node row per *tile* (tiny), slab-tests it against the
    whole tile densely on the VPU, and the tile advances into the
    subtree iff any live ray hit the node box.  Leaf prims are tested
    tile-wide.  Per-ray early termination happens through the running
    best-t in the slab test mask.

    Returns (t, local_idx, slot) flattened back to N rays, t == seed
    where nothing better was found.
    """
    import jax

    # The traversal loop only *selects* the winning (prim, slot); its
    # numeric outputs are recomputed differentiably in
    # _finalize_bvh_winner, so the whole loop runs under stop_gradient
    # (reverse-mode AD cannot cross lax.while_loop).
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    seed_t = jax.lax.stop_gradient(seed_t)
    garrs = jax.tree.map(jax.lax.stop_gradient, garrs)

    g = sc.groups[gi]
    ga = garrs[gi]
    bvh = g.accel
    N = o.shape[0]
    M = bvh.n_nodes
    K = min(tile, max(N, 1))
    T = (N + K - 1) // K
    pad = T * K - N

    def tl(x, fill=0.0):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x.reshape((T, K) + x.shape[1:])

    ot = tl(o)
    dt_ = tl(d, fill=1.0)
    bt0 = tl(seed_t, fill=0.0)  # padded rays: best 0 -> never hit

    nb_min = jnp.asarray(bvh.bmin)
    nb_max = jnp.asarray(bvh.bmax)
    leaf_start = jnp.asarray(bvh.leaf_start)
    leaf_count = jnp.asarray(bvh.leaf_count)
    skip = jnp.asarray(bvh.skip)
    order = jnp.asarray(bvh.order)
    n_order = int(bvh.order.shape[0])
    transformed = g.m_inv is not None
    vis_np = (~g.noshadow) if shadow else (~g.onlyshadow)
    vis = jnp.asarray(vis_np)

    safe_d = jnp.where(dt_ == 0.0, 1e-20, dt_)
    inv_d = 1.0 / safe_d

    from .accel import LEAF_MAX

    def expand(prow):
        """Broadcast per-tile prim rows (T, ...) against tile rays (T, K)."""
        return {k: v[:, None] for k, v in prow.items()}

    def leaf_tests(args):
        is_leaf, hitr, lc, ls, bt, bl = args
        for k in range(LEAF_MAX):
            pid = jnp.clip(ls + k, 0, max(n_order - 1, 0))
            local = order[pid]                                # (T,)
            test = (is_leaf & (k < lc) & vis[local])[:, None] & hitr
            prow = expand(_gather_params(ga, local))
            if transformed:
                minv = ga["m_inv"][local][:, None]            # (T, 1, 3, 4)
                oo = apply_point(minv, ot)
                dd = apply_vector(minv, dt_)
                ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
                du = dd * ils[..., None]
                t0c, _, t1c, _ = _kernel_hits2(g.ptype, prow, oo, du)
                t0c = jnp.where(t0c >= INFINITY, INFINITY, t0c * ils)
                t1c = jnp.where(t1c >= INFINITY, INFINITY, t1c * ils)
            else:
                t0c, _, t1c, _ = _kernel_hits2(g.ptype, prow, ot, dt_)
            v0 = test & (t0c > 0.0) & (t0c < bt)
            v1 = test & (t1c > 0.0) & (t1c < bt)
            if g.constraints:
                x0 = vscaleadd(ot, dt_, t0c)
                x1 = vscaleadd(ot, dt_, t1c)
                pts = jnp.stack([x0, x1], axis=2)             # (T, K, 2, 3)
                okc = _inline_valid(sc, garrs, g.constraints, pts)
                v0 = v0 & okc[..., 0]
                v1 = v1 & okc[..., 1]
            tc = jnp.where(v0, t0c, jnp.where(v1, t1c, INFINITY))
            better = tc < bt
            bt = jnp.where(better, tc, bt)
            bl = jnp.where(better, local[:, None], bl)
        return bt, bl

    def body(state):
        idx, bt, bl = state
        nidx = jnp.clip(idx, 0, M - 1)                       # (T,)
        bmin = nb_min[nidx][:, None, :]                      # (T, 1, 3)
        bmax = nb_max[nidx][:, None, :]
        t1 = (bmin - ot) * inv_d                             # (T, K, 3)
        t2 = (bmax - ot) * inv_d
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)         # (T, K)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        live = idx < M                                       # (T,)
        hitr = (near <= far) & (far > 0.0) & (near < bt)     # (T, K)
        hitb = live & jnp.any(hitr, axis=-1)                 # (T,)
        lc = leaf_count[nidx]
        ls = leaf_start[nidx]
        is_leaf = hitb & (lc > 0)
        # most steps touch inner nodes only; skip the (expensive) leaf
        # primitive tests entirely on those steps
        bt, bl = jax.lax.cond(
            jnp.any(is_leaf),
            leaf_tests,
            lambda args: (args[4], args[5]),
            (is_leaf, hitr, lc, ls, bt, bl))
        nxt = jnp.where(hitb, idx + 1, skip[nidx])
        if shadow:
            # any-hit: a tile whose every ray found a blocker can stop
            nxt = jnp.where(jnp.all(bt < bt0, axis=-1), M, nxt)
        idx = jnp.where(live, nxt, idx)
        return idx, bt, bl

    def cond(state):
        return jnp.any(state[0] < M)

    # node-index / best-local inits derived from the ray tiles so their
    # manual-axes varying status matches the loop body under shard_map
    state0 = ((ot[:, 0, 0] * 0.0).astype(jnp.int32), bt0,
              (ot[:, :, 0] * 0.0).astype(jnp.int32) - 1)
    _, bt, bl = jax.lax.while_loop(cond, body, state0)
    bt = bt.reshape(-1)[:N]
    bl = bl.reshape(-1)[:N]
    return bt, bl


def _finalize_winner(sc, garrs, gi, o, d, t, local):
    """Recompute the winning candidate's normal / object ray / metadata
    for rays whose global best came from BVH group gi."""
    from .vec import finite_grad
    g = sc.groups[gi]
    ga = garrs[gi]
    local = jnp.maximum(local, 0)
    # per-lane non-finite-cotangent filter at the gather boundary:
    # singular lanes (tangency, dead rays) must not poison the
    # cross-lane gradient accumulation into the parameter rows
    prow = {k: finite_grad(v) for k, v in
            _gather_params(ga, local).items()}
    transformed = g.m_inv is not None
    if transformed:
        minv = finite_grad(ga["m_inv"][local])
        oo = apply_point(minv, o)
        dd = apply_vector(minv, d)
        ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
        du = dd * ils[..., None]
        t0c, n0, t1c, n1 = _kernel_hits2(g.ptype, prow, oo, du)
        t0c = t0c * ils
        t1c = t1c * ils
    else:
        oo, du = o, d
        t0c, n0, t1c, n1 = _kernel_hits2(g.ptype, prow, o, d)
    # which crossing won: re-derive by distance, then re-evaluate it
    # differentiably
    slot = jnp.where(jnp.abs(t0c - t) <= jnp.abs(t1c - t), 0, 1)
    tsel = jnp.where(slot == 0, t0c, t1c)
    tsel = jnp.where(jnp.abs(tsel - t) < 1e-2 * (1.0 + jnp.abs(t)), tsel, t)
    n = jnp.where((slot == 0)[:, None], n0, n1)
    if transformed:
        n = vnorm(apply_normal_T(minv, n))
    tex = jnp.asarray(g.tex_stack)[local]
    tag = jnp.asarray(g.tag_stack)[local]
    ser = jnp.asarray(g.prim_serial)[local]
    return tsel, n, oo, du, tex, tag, ser


def _deferred_group(sc, garrs, gi, o, d, tmax, shadow: bool,
                    prim_chunk: int = PRIM_CHUNK):
    """Full advance-and-retest CSG candidate logic for one deferred
    group over the given rays.  Returns per-ray group-local best
    (t, norm, obj_o, obj_d, tex, tag, serial, csg, neg); t == INFINITY
    where no valid candidate.  Heavy (membership scans per candidate);
    intersect() runs it on a compacted ray subset."""
    g = sc.groups[gi]
    ga = garrs[gi]
    N = o.shape[0]
    dt = o.dtype
    best_t = jnp.full((N,), INFINITY, dtype=dt) + 0.0 * o[:, 0]
    best_norm = jnp.zeros((N, 3), dtype=dt)
    best_obj_o = o
    best_obj_d = d
    best_tex = jnp.full((N, TEX_DEPTH), -1, dtype=jnp.int32)
    best_tag = jnp.full((N, TAG_DEPTH), -1, dtype=jnp.int32)
    best_serial = jnp.full((N,), -1, dtype=jnp.int32)
    best_csg = jnp.full((N,), -1, dtype=jnp.int32)
    best_neg = jnp.zeros((N,), dtype=bool)

    if True:
        for start in range(0, g.size, prim_chunk):
            sl = slice(start, min(start + prim_chunk, g.size))
            P = sl.stop - sl.start
            params = _slice_params(ga, g, sl)
            transformed = g.m_inv is not None
            if transformed:
                minv = ga["m_inv"][sl]            # (P, 3, 4)
                oo = apply_point(minv[None], o[:, None, :])   # (N, P, 3)
                dd = apply_vector(minv[None], d[:, None, :])
                lenscale = jnp.sqrt(jnp.sum(dd * dd, axis=-1))
                inv_ls = 1.0 / lenscale
                du = dd * inv_ls[..., None]
                t0, n0, t1, n1 = _kernel_hits2(g.ptype, params, oo, du)
                # preserve the miss sentinel through distance rescaling
                t0 = jnp.where(t0 >= INFINITY, INFINITY, t0 * inv_ls)
                t1 = jnp.where(t1 >= INFINITY, INFINITY, t1 * inv_ls)
            else:
                oo = o[:, None, :]
                du = jnp.broadcast_to(d[:, None, :], (N, P, 3))
                t0, n0, t1, n1 = _kernel_hits2(
                    g.ptype, params, oo, du)

            csg_ids = g.csg_id[sl]
            is_csg = csg_ids >= 0
            neg_np = np.zeros((P,), dtype=bool)
            # Candidate validity.  For plain prims keeping both candidates
            # reproduces reference nearest-hit semantics: a valid entry is
            # always nearer than the exit, so argmin picks the entry when
            # it is ahead of the origin and the exit otherwise.
            v0 = (t0 > 0.0) & (t0 < tmax[:, None]) & (t0 < INFINITY)
            v1 = (t1 > 0.0) & (t1 < tmax[:, None]) & (t1 < INFINITY)

            if is_csg.any():
                # CSG validity per csg object present in this chunk
                for cid in sorted(set(int(c) for c in csg_ids[is_csg])):
                    rows = np.where(csg_ids == cid)[0]
                    csg = sc.csgs[cid]
                    clauses_of_rows = g.csg_clause[sl][rows]
                    # candidate points for these rows
                    tr0 = t0[:, rows]
                    tr1 = t1[:, rows]
                    x0 = vscaleadd(o[:, None, :], d[:, None, :], tr0)
                    x1 = vscaleadd(o[:, None, :], d[:, None, :], tr1)
                    okay0 = jnp.ones(x0.shape[:-1], dtype=bool)
                    okay1 = jnp.ones(x1.shape[:-1], dtype=bool)
                    for ci, clause in enumerate(csg.clauses):
                        need = np.where(clauses_of_rows != ci)[0]
                        if len(need) == 0:
                            continue
                        pts = jnp.stack([x0[:, need], x1[:, need]], axis=2)
                        inn = clause_in(sc, garrs, clause, pts)
                        ok = inn == clause.positive
                        okay0 = okay0.at[:, need].set(okay0[:, need] & ok[:, :, 0])
                        okay1 = okay1.at[:, need].set(okay1[:, need] & ok[:, :, 1])
                    # sibling DNF regions (non-conjunctive CSG): a
                    # candidate is a UNION boundary iff union
                    # membership flips across it -- evaluated at
                    # delta-nudged points, because exact surface points
                    # of a member duplicated across disjuncts make
                    # strict inside tests coin flips (the reference's
                    # own delta-advance style, Csg.hs:38-54)
                    if csg.excl:
                        dx = d[:, None, :] * DELTA
                        pts = jnp.stack([x0 - dx, x0 + dx,
                                         x1 - dx, x1 + dx], axis=2)
                        u = None
                        for conj in [csg.clauses] + list(csg.excl):
                            rin = None
                            for clause in conj:
                                inn = (clause_in(sc, garrs, clause, pts)
                                       == clause.positive)
                                rin = inn if rin is None else rin & inn
                            u = rin if u is None else u | rin
                        okay0 = okay0 & (u[:, :, 0] != u[:, :, 1])
                        okay1 = okay1 & (u[:, :, 2] != u[:, :, 3])
                    # negative-clause rows: only exit candidates, and the
                    # ray must actually leave the clause set
                    for ci, clause in enumerate(csg.clauses):
                        if clause.positive:
                            continue
                        nrows = np.where(clauses_of_rows == ci)[0]
                        if len(nrows) == 0:
                            continue
                        neg_np[rows[nrows]] = True
                        okay0 = okay0.at[:, nrows].set(False)
                        xa = vscaleadd(x1[:, nrows], d[:, None, :], DELTA)
                        still_in = clause_in(sc, garrs, clause, xa)
                        okay1 = okay1.at[:, nrows].set(okay1[:, nrows] & ~still_in)
                    v0 = v0.at[:, rows].set(v0[:, rows] & okay0)
                    v1 = v1.at[:, rows].set(v1[:, rows] & okay1)

            cand_t = jnp.stack([jnp.where(v0, t0, INFINITY),
                                jnp.where(v1, t1, INFINITY)], axis=-1)

            # shadow / primary visibility flags (static per prim)
            if shadow:
                vis = ~g.noshadow[sl]
            else:
                vis = ~g.onlyshadow[sl]
            cand_t = jnp.where(jnp.asarray(vis)[None, :, None], cand_t, INFINITY)

            # reduce chunk -> per-ray best candidate
            flat = cand_t.reshape(N, P * 2)
            arg = jnp.argmin(flat, axis=-1)
            tbest = jnp.take_along_axis(flat, arg[:, None], axis=-1)[:, 0]
            upd = tbest < best_t
            if shadow:
                best_t = jnp.where(upd, tbest, best_t)
                continue

            pidx = (arg // 2).astype(jnp.int32)
            slot = (arg % 2).astype(jnp.int32)
            nsel = jnp.where((slot == 0)[:, None],
                             jnp.take_along_axis(
                                 n0, pidx[:, None, None], axis=1)[:, 0],
                             jnp.take_along_axis(
                                 n1, pidx[:, None, None], axis=1)[:, 0])
            if transformed:
                minv_sel = ga["m_inv"][sl][pidx]          # (N, 3, 4)
                nsel = vnorm(apply_normal_T(minv_sel, nsel))
                oo_sel = jnp.take_along_axis(oo, pidx[:, None, None], axis=1)[:, 0]
                du_sel = jnp.take_along_axis(du, pidx[:, None, None], axis=1)[:, 0]
            else:
                oo_sel = o
                du_sel = d
            flip = jnp.asarray(neg_np)[pidx]
            nsel = jnp.where(flip[:, None], -nsel, nsel)

            off = start
            tex_sel = jnp.asarray(g.tex_stack)[off + pidx]
            tag_sel = jnp.asarray(g.tag_stack)[off + pidx]
            ser_sel = jnp.asarray(g.prim_serial)[off + pidx]
            csg_sel = jnp.asarray(g.csg_id)[off + pidx]

            best_norm = jnp.where(upd[:, None], nsel, best_norm)
            best_obj_o = jnp.where(upd[:, None], oo_sel, best_obj_o)
            best_obj_d = jnp.where(upd[:, None], du_sel, best_obj_d)
            best_tex = jnp.where(upd[:, None], tex_sel, best_tex)
            best_tag = jnp.where(upd[:, None], tag_sel, best_tag)
            best_serial = jnp.where(upd, ser_sel, best_serial)
            best_csg = jnp.where(upd, csg_sel, best_csg)
            best_neg = jnp.where(upd, flip, best_neg)
            best_t = jnp.where(upd, tbest, best_t)

    return (best_t, best_norm, best_obj_o, best_obj_d, best_tex,
            best_tag, best_serial, best_csg, best_neg)


def _deferred_eligible(sc, garrs, gi, o, d, seed,
                       prim_chunk: int = PRIM_CHUNK):
    """Cheap prefilter: rays with any 0 < t < seed candidate on the
    deferred group (validity NOT checked -- superset of real hits)."""
    g = sc.groups[gi]
    ga = garrs[gi]
    N = o.shape[0]
    elig = jnp.zeros((N,), dtype=bool)
    for start in range(0, g.size, prim_chunk):
        sl = slice(start, min(start + prim_chunk, g.size))
        params = _slice_params(ga, g, sl)
        if g.m_inv is not None:
            minv = ga["m_inv"][sl]
            oo = apply_point(minv[None], o[:, None, :])
            dd = apply_vector(minv[None], d[:, None, :])
            ils = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=-1),
                                         1e-30))
            du = dd * ils[..., None]
            t0, _, t1, _ = _kernel_hits2(g.ptype, params, oo, du)
            t0 = jnp.where(t0 >= INFINITY, INFINITY, t0 * ils)
            t1 = jnp.where(t1 >= INFINITY, INFINITY, t1 * ils)
        else:
            t0, _, t1, _ = _kernel_hits2(g.ptype, params, o[:, None, :],
                                         d[:, None, :])
        ok = ((t0 > 0.0) & (t0 < seed[:, None])) \
            | ((t1 > 0.0) & (t1 < seed[:, None]))
        elig = elig | jnp.any(ok, axis=-1)
    return elig


# fraction of the ray batch that may produce deferred-CSG candidates.
# 1.0 = exact (no compaction): this jnp pipeline is now the CPU oracle
# path -- the TPU perf path is the megakernel, which has no cap -- and
# the old 0.25 cap silently dropped valid hits on TestScene (its
# subtracted lattice sphere marks every primary ray eligible).
DEFERRED_CAP_FRAC = 1.0


def intersect(compiled: CompiledScene, arrays, scene_id: int,
              o, d, tmax=None, shadow: bool = False,
              prim_chunk: int = PRIM_CHUNK) -> Hit:
    """Nearest valid hit of N rays against a packed scene.

    o, d: (N, 3); d unit length.  tmax: (N,) or None (= INFINITY).
    shadow=True applies shadow-pass semantics: prims flagged noshadow are
    skipped, onlyshadow prims participate (Tex.hs:81-96).

    Pass order (each seeded with the running best so later passes cull):
    convex CSG objects, dense/BVH groups, then deferred CSG groups last
    on a COMPACTED eligible-ray subset -- their validity checks scan
    whole clause member sets, so they run only on the few rays whose
    candidates could still win.
    """
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_intersect(compiled, arrays, o, d, sid=None,
                                 tmax=tmax, shadow=shadow,
                                 scene_id=scene_id)

    sc = compiled.scenes[scene_id]
    from .compile import materialize_scene_params
    garrs = materialize_scene_params(sc, arrays["scenes"][scene_id])
    N = o.shape[0]
    dt = o.dtype
    if tmax is None:
        tmax = jnp.full((N,), INFINITY, dtype=dt)

    best_t = jnp.full((N,), INFINITY, dtype=dt)
    best_norm = jnp.zeros((N, 3), dtype=dt)
    best_obj_o = o
    best_obj_d = d
    best_tex = jnp.full((N, TEX_DEPTH), -1, dtype=jnp.int32)
    best_tag = jnp.full((N, TAG_DEPTH), -1, dtype=jnp.int32)
    best_serial = jnp.full((N,), -1, dtype=jnp.int32)
    best_csg = jnp.full((N,), -1, dtype=jnp.int32)
    best_neg = jnp.zeros((N,), dtype=bool)

    # convex CSG objects: one interval candidate per object
    for cid, csg in enumerate(sc.csgs):
        if not csg.convex:
            continue
        seed = jnp.minimum(best_t, tmax)
        bt, ordn, is_exit = convex_pass(sc, garrs, csg, o, d, seed, shadow)
        upd = bt < seed
        if shadow:
            best_t = jnp.where(upd, bt, best_t)
            continue
        tsel, n, oo_sel, du_sel, tex_sel, tag_sel, ser_sel = \
            _finalize_convex(sc, garrs, csg, o, d, bt, ordn, is_exit)
        best_t = jnp.where(upd, tsel, best_t)
        best_norm = jnp.where(upd[:, None], n, best_norm)
        best_obj_o = jnp.where(upd[:, None], oo_sel, best_obj_o)
        best_obj_d = jnp.where(upd[:, None], du_sel, best_obj_d)
        best_tex = jnp.where(upd[:, None], tex_sel, best_tex)
        best_tag = jnp.where(upd[:, None], tag_sel, best_tag)
        best_serial = jnp.where(upd, ser_sel, best_serial)
        best_csg = jnp.where(upd, -1, best_csg)
        best_neg = jnp.where(upd, False, best_neg)

    for gi, g in enumerate(sc.groups):
        if g.vclass in ("deferred", "convex") or g.size == 0:
            continue
        seed = jnp.minimum(best_t, tmax)
        if g.accel is not None:
            bt, bl = bvh_dispatch(sc, garrs, gi, o, d, seed, shadow)
        else:
            bt, bl = dense_pass(sc, garrs, gi, o, d, seed, shadow)
        upd = bt < seed
        if shadow:
            best_t = jnp.where(upd, bt, best_t)
            continue
        tsel, n, oo_sel, du_sel, tex_sel, tag_sel, ser_sel = \
            _finalize_winner(sc, garrs, gi, o, d, bt, bl)
        best_t = jnp.where(upd, tsel, best_t)
        best_norm = jnp.where(upd[:, None], n, best_norm)
        best_obj_o = jnp.where(upd[:, None], oo_sel, best_obj_o)
        best_obj_d = jnp.where(upd[:, None], du_sel, best_obj_d)
        best_tex = jnp.where(upd[:, None], tex_sel, best_tex)
        best_tag = jnp.where(upd[:, None], tag_sel, best_tag)
        best_serial = jnp.where(upd, ser_sel, best_serial)
        csg_sel = jnp.asarray(g.csg_id)[jnp.maximum(bl, 0)]
        best_csg = jnp.where(upd, csg_sel, best_csg)
        best_neg = jnp.where(upd, False, best_neg)

    # deferred CSG groups, compacted: prefilter rays with any candidate
    # nearer than the running best, gather them, run the full
    # advance-and-retest logic (whole-clause membership scans) on that
    # small subset only, scatter winners back
    for gi, g in enumerate(sc.groups):
        if g.vclass != "deferred" or g.size == 0:
            continue
        seed = jnp.minimum(best_t, tmax)
        elig = _deferred_eligible(sc, garrs, gi, o, d, seed)
        cap = max(256, int(N * DEFERRED_CAP_FRAC))
        if cap >= N:
            (dt_, dnorm, doo, ddu, dtex, dtag, dser, dcsg, dneg) = \
                _deferred_group(sc, garrs, gi, o, d, seed, shadow,
                                prim_chunk)
            upd = dt_ < seed
        else:
            (ridx,) = jnp.nonzero(elig, size=cap, fill_value=N)
            take = lambda x: jnp.take(x, ridx, axis=0, mode='fill',
                                      fill_value=0)
            oS, dS = take(o), take(d)
            dS = jnp.where((ridx < N)[:, None], dS,
                           jnp.zeros_like(dS).at[:, 2].set(1.0))
            seedS = jnp.where(ridx < N, jnp.take(seed, ridx, axis=0,
                                                 mode='fill',
                                                 fill_value=0.0), 0.0)
            (ct, cnorm, coo, cdu, ctex, ctag, cser, ccsg, cneg) = \
                _deferred_group(sc, garrs, gi, oS, dS, seedS, shadow,
                                prim_chunk)

            def scat(init, vals):
                return init.at[ridx].set(vals, mode='drop')
            dt_ = scat(jnp.full((N,), INFINITY, dtype=dt), ct)
            upd = dt_ < seed
            if not shadow:
                dnorm = scat(jnp.zeros((N, 3), dt), cnorm)
                doo = scat(jnp.zeros((N, 3), dt), coo)
                ddu = scat(jnp.zeros((N, 3), dt), cdu)
                dtex = scat(jnp.full((N, TEX_DEPTH), -1, jnp.int32), ctex)
                dtag = scat(jnp.full((N, TAG_DEPTH), -1, jnp.int32), ctag)
                dser = scat(jnp.full((N,), -1, jnp.int32), cser)
                dcsg = scat(jnp.full((N,), -1, jnp.int32), ccsg)
                dneg = scat(jnp.zeros((N,), bool), cneg)
        best_t = jnp.where(upd, dt_, best_t)
        if shadow:
            continue
        best_norm = jnp.where(upd[:, None], dnorm, best_norm)
        best_obj_o = jnp.where(upd[:, None], doo, best_obj_o)
        best_obj_d = jnp.where(upd[:, None], ddu, best_obj_d)
        best_tex = jnp.where(upd[:, None], dtex, best_tex)
        best_tag = jnp.where(upd[:, None], dtag, best_tag)
        best_serial = jnp.where(upd, dser, best_serial)
        best_csg = jnp.where(upd, dcsg, best_csg)
        best_neg = jnp.where(upd, dneg, best_neg)

    hit = best_t < INFINITY
    pos = vscaleadd(o, d, jnp.where(hit, best_t, 0.0))

    if not shadow:
        # retexture difference-B winners with useatex from the first
        # containing A member's local stacks (Csg.hs:38-41).  Affected
        # rays are rare, so the (possibly large) A-member scan runs on a
        # compacted subset only.
        for cid_all, csg in _all_useatex(sc):
            mask = hit & best_neg & (best_csg == cid_all)
            clause0 = csg.clauses[0]
            if not clause0.members:
                continue  # A side entirely simplified away
            cap = max(64, N // 8)
            (ridx,) = jnp.nonzero(mask, size=cap, fill_value=N)
            cpos = jnp.take(pos, ridx, axis=0, mode='fill', fill_value=0.0)
            found_c, ordn_c = clause_first_inside(sc, garrs, clause0, cpos)
            found = jnp.zeros((N,), bool).at[ridx].set(found_c, mode='drop')
            ordn = jnp.zeros((N,), jnp.int32).at[ridx].set(ordn_c,
                                                           mode='drop')
            ltex, ltag = _clause_local_stacks(sc, clause0)
            new_tex = jnp.asarray(ltex)[ordn]
            new_tag = jnp.asarray(ltag)[ordn]
            use = (mask & found)[:, None]
            best_tex = jnp.where(use, new_tex, best_tex)
            best_tag = jnp.where(use, new_tag, best_tag)

    return Hit(t=jnp.where(hit, best_t, INFINITY), hit=hit, pos=pos,
               norm=best_norm, obj_o=best_obj_o, obj_d=best_obj_d,
               tex_stack=best_tex, tag_stack=best_tag,
               prim_serial=best_serial)


def _all_useatex(sc: PackedScene):
    out = []
    for cid, csg in enumerate(sc.csgs):
        if csg.kind == "difference" and csg.useatex:
            out.append((cid, csg))
    return out


def _clause_local_stacks(sc: PackedScene, clause):
    """Concatenated (local_tex_stack, local_tag_stack) over the clause's
    members, in member-ordinal order (host-side static arrays)."""
    texs, tags = [], []
    for gi, idx in clause.members:
        g = sc.groups[gi]
        texs.append(g.local_tex_stack[idx])
        tags.append(g.local_tag_stack[idx])
    return np.concatenate(texs, axis=0), np.concatenate(tags, axis=0)


def shadow_query(compiled, arrays, scene_id, o, d, tmax,
                 prim_chunk: int = PRIM_CHUNK):
    """True where something valid blocks the segment (0, tmax)."""
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_shadow(compiled, arrays, o, d, sid=None, tmax=tmax,
                              scene_id=scene_id)
    h = intersect(compiled, arrays, scene_id, o, d, tmax=tmax, shadow=True,
                  prim_chunk=prim_chunk)
    return h.hit


def intersect_multi(compiled, arrays, o, d, sid, tmax=None,
                    shadow: bool = False) -> Hit:
    """Nearest hit where each ray selects its scene via `sid` (N,) int32
    (-1 = no scene; always a miss).  Implemented by running each packed
    scene with tmax zeroed for out-of-scene rays -- every candidate then
    fails t > 0, so no kernel changes are needed -- and merging."""
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_intersect(compiled, arrays, o, d, sid=sid,
                                 tmax=tmax, shadow=shadow)

    N = o.shape[0]
    if tmax is None:
        tmax = jnp.full((N,), INFINITY, dtype=o.dtype)
    best: Optional[Hit] = None
    for si in range(len(compiled.scenes)):
        tm = jnp.where(sid == si, tmax, 0.0)
        h = intersect(compiled, arrays, si, o, d, tmax=tm, shadow=shadow)
        if best is None:
            best = h
        else:
            upd = h.t < best.t
            best = Hit(
                t=jnp.where(upd, h.t, best.t),
                hit=jnp.where(upd, h.hit, best.hit),
                pos=jnp.where(upd[:, None], h.pos, best.pos),
                norm=jnp.where(upd[:, None], h.norm, best.norm),
                obj_o=jnp.where(upd[:, None], h.obj_o, best.obj_o),
                obj_d=jnp.where(upd[:, None], h.obj_d, best.obj_d),
                tex_stack=jnp.where(upd[:, None], h.tex_stack, best.tex_stack),
                tag_stack=jnp.where(upd[:, None], h.tag_stack, best.tag_stack),
                prim_serial=jnp.where(upd, h.prim_serial, best.prim_serial),
            )
    return best


def shadow_query_multi(compiled, arrays, o, d, sid, tmax):
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_shadow(compiled, arrays, o, d, sid=sid, tmax=tmax)
    h = intersect_multi(compiled, arrays, o, d, sid, tmax=tmax, shadow=True)
    return h.hit


def intersect_multi_table(compiled, arrays, table) -> Hit:
    """Tile-major table variant of intersect_multi: `table` is
    (T, 8, 8, 128) with channels [ox,oy,oz,dx,dy,dz,tmax,sid] (dead
    lanes tmax 0, sid -1).  On TPU this feeds the megakernel with no
    layout conversion at all; the jnp fallback (CPU oracle) unpacks to
    columns."""
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_intersect_table(compiled, arrays, table)
    T = table.shape[0]
    N = T * 1024
    o = jnp.stack([table[:, c].reshape(N) for c in range(3)], axis=-1)
    d = jnp.stack([table[:, c].reshape(N) for c in range(3, 6)], axis=-1)
    # dead/fill lanes can carry d = 0 (whole-row gather fill): give
    # them a unit direction.  Their results are discarded (tmax 0),
    # but an unguarded zero direction meets inf-scaled cotangents in
    # the backward pass (0 x inf = NaN), and ONE such lane poisons
    # every accumulated scene-parameter gradient.
    dead = jnp.sum(d * d, axis=-1) == 0.0
    d = jnp.where(dead[:, None], jnp.asarray([0.0, 0.0, 1.0], d.dtype), d)
    tmax = table[:, 6].reshape(N)
    sid = table[:, 7].reshape(N).astype(jnp.int32)
    return intersect_multi(compiled, arrays, o, d, sid, tmax=tmax)


def shadow_query_table(compiled, arrays, table):
    """Tile-major any-hit occlusion; returns (T, 8, 128) bool."""
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_shadow_table(compiled, arrays, table)
    T = table.shape[0]
    N = T * 1024
    o = jnp.stack([table[:, c].reshape(N) for c in range(3)], axis=-1)
    d = jnp.stack([table[:, c].reshape(N) for c in range(3, 6)], axis=-1)
    # dead/fill lanes can carry d = 0 (whole-row gather fill): give
    # them a unit direction.  Their results are discarded (tmax 0),
    # but an unguarded zero direction meets inf-scaled cotangents in
    # the backward pass (0 x inf = NaN), and ONE such lane poisons
    # every accumulated scene-parameter gradient.
    dead = jnp.sum(d * d, axis=-1) == 0.0
    d = jnp.where(dead[:, None], jnp.asarray([0.0, 0.0, 1.0], d.dtype), d)
    tmax = table[:, 6].reshape(N)
    sid = table[:, 7].reshape(N).astype(jnp.int32)
    return shadow_query_multi(compiled, arrays, o, d, sid,
                              tmax).reshape(T, 8, 128)


def shadow_query_multi_rays(compiled, arrays, rays):
    """Plane-table variant: rays is (8, W) [o*3, d*3, tmax, sid] with W
    a multiple of 1024, dead lanes tmax 0 / sid -1.  Layout-friendly:
    the TPU path passes rows straight into the kernels with no
    (N,3)-column transposes."""
    if _mega_enabled():
        from . import megakernel as MK
        return MK.mega_shadow(compiled, arrays, rays=rays)
    o = jnp.stack([rays[0], rays[1], rays[2]], axis=-1)
    d = jnp.stack([rays[3], rays[4], rays[5]], axis=-1)
    return shadow_query_multi(compiled, arrays, o, d,
                              rays[7].astype(jnp.int32), rays[6])

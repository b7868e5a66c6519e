"""Pallas TPU kernels: dense ray x prim intersection.

The jnp dense path (intersect.brute_scan) is memory-bound: XLA
materializes (N, chunk) candidate arrays in HBM every scan step.  This
kernel blocks the work onto VMEM tiles and -- crucially -- lays data
out the way the VPU wants it: rays down the sublane axis, prims across
the 128-lane axis, and every xyz component as its own (BN, BP) plane.
(Trailing-3 "vector" axes would land xyz in the lane dimension and
idle 125 of 128 lanes.)  Params are stored transposed (F, P) so a
field slice is a natural (1, BP) lane row.

The per-ray best (t, prim) accumulates in the output block across the
inner grid axis like a matmul K loop.  Inline CSG constraint prims
(compile.py) arrive as small SMEM tables of scalars.

Like the traversal passes, this kernel only SELECTS; the winner is
re-evaluated differentiably by intersect._finalize_winner, keeping the
renderer differentiable end to end.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import INFINITY

BN = 256   # rays per tile (sublanes x 32); see _pick_bn
BP = 128   # prims per tile (one lane row)


def _pick_bn(n_cons_members: int) -> int:
    """Bigger ray tiles amortize per-grid-step overhead (~5us each);
    constraint-heavy kernels keep smaller tiles to fit VMEM."""
    if n_cons_members == 0:
        return 1024
    if n_cons_members <= 4:
        return 512
    return 256

INF = INFINITY

# per-ptype parameter field order for the packed (F, P) matrix
FIELDS = {
    "sphere": [("center", 3), ("radius", 1)],
    "plane": [("norm", 3), ("offset", 1)],
    "box": [("bmin", 3), ("bmax", 3)],
    "triangle": [("p1", 3), ("p2", 3), ("p3", 3)],
    "trianglenorm": [("p1", 3), ("p2", 3), ("p3", 3),
                     ("n1", 3), ("n2", 3), ("n3", 3)],
    "disc": [("pos", 3), ("norm", 3), ("rsqr", 1)],
    "cylinder": [("radius", 1), ("h1", 1), ("h2", 1)],
    "cone": [("radius", 1), ("clip1", 1), ("clip2", 1), ("height", 1)],
}


def field_count(ptype):
    return sum(w for _, w in FIELDS[ptype])


def pack_params_T(ptype: str, params: dict) -> jnp.ndarray:
    """Pack a group's param dict into a transposed (F, P) matrix."""
    rows = []
    for name, width in FIELDS[ptype]:
        v = params[name]
        v2 = v.reshape(v.shape[0], -1) if v.ndim > 1 else v[:, None]
        rows.append(v2.T)
    return jnp.concatenate(rows, axis=0)


def pack_params_rows(ptype: str, params: dict) -> jnp.ndarray:
    """Row-major (M, F) packing (for small SMEM constraint tables)."""
    cols = []
    for name, width in FIELDS[ptype]:
        v = params[name]
        cols.append(v.reshape(v.shape[0], -1) if v.ndim > 1 else v[:, None])
    return jnp.concatenate(cols, axis=-1)


# --- component-wise primitive candidate kernels ---------------------------
# Each takes a field accessor p(k) -> (1, BP) row (or (BN, BP) in object
# space) plus ray components, returns the two boundary-crossing
# distances (BN, BP) with +INF for absent crossings.  Mirrors geom.py
# (which mirrors the reference rayint_* kernels) without normals.

def _safe(x, default=1.0):
    return jnp.where(x == 0.0, default, x)


def _sphere_t(p, ox, oy, oz, dx, dy, dz):
    cx, cy, cz, r = p(0), p(1), p(2), p(3)
    ex, ey, ez = cx - ox, cy - oy, cz - oz
    v = ex * dx + ey * dy + ez * dz
    disc = r * r - (ex * ex + ey * ey + ez * ez - v * v)
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    return jnp.where(ok, v - sq, INF), jnp.where(ok, v + sq, INF)


def _plane_t(p, ox, oy, oz, dx, dy, dz):
    nx, ny, nz, off = p(0), p(1), p(2), p(3)
    dn = nx * dx + ny * dy + nz * dz
    t = -(nx * ox + ny * oy + nz * oz - off) / _safe(dn)
    t = jnp.where(dn == 0.0, INF, t)
    entering = dn < 0.0
    return jnp.where(entering, t, INF), jnp.where(entering, INF, t)


def _slab1(lo, hi, o, d):
    inv = 1.0 / _safe(d)
    ta = (lo - o) * inv
    tb = (hi - o) * inv
    tin = jnp.minimum(ta, tb)
    tout = jnp.maximum(ta, tb)
    para = d == 0.0
    ins = (o > lo) & (o < hi)
    BIG = 1e18
    tin = jnp.where(para, jnp.where(ins, -BIG, BIG), tin)
    tout = jnp.where(para, jnp.where(ins, BIG, -BIG), tout)
    return tin, tout


def _box_t(p, ox, oy, oz, dx, dy, dz):
    ix, axo = _slab1(p(0), p(3), ox, dx)
    iy, ayo = _slab1(p(1), p(4), oy, dy)
    iz, azo = _slab1(p(2), p(5), oz, dz)
    lastin = jnp.maximum(jnp.maximum(ix, iy), iz)
    firstout = jnp.minimum(jnp.minimum(axo, ayo), azo)
    ok = lastin <= firstout
    return (jnp.where(ok, lastin, INF), jnp.where(ok, firstout, INF))


def _triangle_t(p, ox, oy, oz, dx, dy, dz):
    p1x, p1y, p1z = p(0), p(1), p(2)
    e1x, e1y, e1z = p(3) - p1x, p(4) - p1y, p(5) - p1z
    e2x, e2y, e2z = p(6) - p1x, p(7) - p1y, p(8) - p1z
    s1x = dy * e2z - dz * e2y
    s1y = dz * e2x - dx * e2z
    s1z = dx * e2y - dy * e2x
    div = s1x * e1x + s1y * e1y + s1z * e1z
    ok = div != 0.0
    inv = 1.0 / _safe(div)
    ddx, ddy, ddz = ox - p1x, oy - p1y, oz - p1z
    b1 = (ddx * s1x + ddy * s1y + ddz * s1z) * inv
    ok = ok & (b1 >= 0.0) & (b1 <= 1.0)
    s2x = ddy * e1z - ddz * e1y
    s2y = ddz * e1x - ddx * e1z
    s2z = ddx * e1y - ddy * e1x
    b2 = (dx * s2x + dy * s2y + dz * s2z) * inv
    ok = ok & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
    t = jnp.where(ok, t, INF)
    return t, jnp.full_like(t, INF)


def _disc_t(p, ox, oy, oz, dx, dy, dz):
    px, py, pz = p(0), p(1), p(2)
    nx, ny, nz, rsqr = p(3), p(4), p(5), p(6)
    dn = nx * dx + ny * dy + nz * dz
    t = -(nx * (ox - px) + ny * (oy - py) + nz * (oz - pz)) / _safe(dn)
    hx = ox + dx * t - px
    hy = oy + dy * t - py
    hz = oz + dz * t - pz
    ok = (dn != 0.0) & (hx * hx + hy * hy + hz * hz <= rsqr)
    t = jnp.where(ok, t, INF)
    return t, jnp.full_like(t, INF)


def _roots(a, b, c):
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    q = jnp.where(b < 0.0, (b - sq) * -0.5, (b + sq) * -0.5)
    t0 = q / _safe(a)
    t1 = c / _safe(q)
    return jnp.minimum(t0, t1), jnp.maximum(t0, t1), ok


def _cylinder_t(p, ox, oy, oz, dx, dy, dz):
    r, h1, h2 = p(0), p(1), p(2)
    a = dx * dx + dy * dy
    b = 2.0 * (dx * ox + dy * oy)
    c = ox * ox + oy * oy - r * r
    lo, hi, ok = _roots(a, b, c)
    vert = a == 0.0
    inc = c < 0.0
    lo = jnp.where(vert, jnp.where(inc, -INF, INF), jnp.where(ok, lo, INF))
    hi = jnp.where(vert, jnp.where(inc, INF, -INF), jnp.where(ok, hi, -INF))
    zlo, zhi = _slab1(h1, h2, oz, dz)
    t0 = jnp.maximum(lo, zlo)
    t1 = jnp.minimum(hi, zhi)
    empty = t0 > t1
    return (jnp.where(empty, INF, t0), jnp.where(empty, INF, t1))


def _cone_t(p, ox, oy, oz, dx, dy, dz):
    r, clip1, clip2, height = p(0), p(1), p(2), p(3)
    kp = r / height
    k = kp * kp
    a = dx * dx + dy * dy - k * dz * dz
    b = 2.0 * (dx * ox + dy * oy - k * dz * (oz - height))
    c = ox * ox + oy * oy - k * (oz - height) * (oz - height)
    lo, hi, ok = _roots(a, b, c)
    neg_lo = jnp.where(dz > 0.0, -INF, hi)
    neg_hi = jnp.where(dz > 0.0, lo, INF)
    lin_t = -c / _safe(b)
    lin_lo = jnp.where(b < 0.0, lin_t, -INF)
    lin_hi = jnp.where(b < 0.0, INF, lin_t)
    lin_lo = jnp.where(b == 0.0, jnp.where(c < 0.0, -INF, INF), lin_lo)
    lin_hi = jnp.where(b == 0.0, jnp.where(c < 0.0, INF, -INF), lin_hi)
    flo = jnp.where(a > 0.0, jnp.where(ok, lo, INF),
                    jnp.where(a < 0.0, jnp.where(ok, neg_lo, -INF), lin_lo))
    fhi = jnp.where(a > 0.0, jnp.where(ok, hi, -INF),
                    jnp.where(a < 0.0, jnp.where(ok, neg_hi, INF), lin_hi))
    zlo, zhi = _slab1(clip1, clip2, oz, dz)
    t0 = jnp.maximum(flo, zlo)
    t1 = jnp.minimum(fhi, zhi)
    empty = t0 > t1
    return (jnp.where(empty, INF, t0), jnp.where(empty, INF, t1))


_T_KERNELS = {
    "sphere": _sphere_t,
    "plane": _plane_t,
    "box": _box_t,
    "triangle": _triangle_t,
    "trianglenorm": _triangle_t,   # same distances, fan fields first
    "disc": _disc_t,
    "cylinder": _cylinder_t,
    "cone": _cone_t,
}


# component-wise strict inside tests for constraint prims (scalars
# broadcast over (BN, BP) candidate-point components)

def _inside_comp(ptype, c, x, y, z):
    if ptype == "sphere":
        ex, ey, ez = c(0) - x, c(1) - y, c(2) - z
        return ex * ex + ey * ey + ez * ez < c(3) * c(3)
    if ptype == "plane":
        return c(0) * x + c(1) * y + c(2) * z < c(3)
    if ptype == "box":
        return ((x > c(0)) & (x < c(3)) & (y > c(1)) & (y < c(4))
                & (z > c(2)) & (z < c(5)))
    if ptype == "cylinder":
        return ((z > c(1)) & (z < c(2)) & (x * x + y * y < c(0) * c(0)))
    if ptype == "cone":
        rz = c(0) * (1.0 - (z - c(1)) / c(3))
        return (z > c(1)) & (z < c(2)) & (x * x + y * y < rz * rz)
    # surface prims have no volume
    return jnp.zeros_like(x, dtype=bool)


def prim_aabb(ptype: str, params: dict, m_fwd=None):
    """(bmin, bmax) world AABBs (P, 3) of a dense group's prims, from
    the device param arrays; None for unbounded types (plane)."""
    if ptype == "sphere":
        r = params["radius"][:, None]
        bmin, bmax = params["center"] - r, params["center"] + r
    elif ptype == "box":
        bmin, bmax = params["bmin"], params["bmax"]
    elif ptype in ("triangle", "trianglenorm"):
        pts = jnp.stack([params["p1"], params["p2"], params["p3"]])
        bmin, bmax = pts.min(0), pts.max(0)
    elif ptype == "disc":
        r = jnp.sqrt(params["rsqr"])[:, None]
        bmin, bmax = params["pos"] - r, params["pos"] + r
    elif ptype == "cylinder":
        r = params["radius"]
        bmin = jnp.stack([-r, -r, params["h1"]], axis=-1)
        bmax = jnp.stack([r, r, params["h2"]], axis=-1)
    elif ptype == "cone":
        r = params["radius"]
        bmin = jnp.stack([-r, -r, params["clip1"]], axis=-1)
        bmax = jnp.stack([r, r, params["clip2"]], axis=-1)
    else:
        return None
    if m_fwd is not None:
        corners = jnp.stack(
            [jnp.stack([bmin[:, 0] if i & 1 else bmax[:, 0],
                        bmin[:, 1] if i & 2 else bmax[:, 1],
                        bmin[:, 2] if i & 4 else bmax[:, 2]], axis=-1)
             for i in range(8)], axis=1)                      # (P, 8, 3)
        w = jnp.einsum('pkj,pij->pki', corners, m_fwd[:, :, :3]) \
            + m_fwd[:, None, :, 3]
        return w.min(axis=1), w.max(axis=1)
    return bmin, bmax


def block_aabbs(ptype: str, params: dict, m_fwd, P: int, bp: int):
    """Per-128-lane-block AABB table (n_j, 8) for the culling test, or
    None when the type is unbounded."""
    ab = prim_aabb(ptype, params, m_fwd)
    if ab is None:
        return None
    bmin, bmax = ab
    n_j = (P + bp - 1) // bp
    pad = n_j * bp - P
    if pad:
        bmin = jnp.concatenate(
            [bmin, jnp.full((pad, 3), jnp.inf, bmin.dtype)])
        bmax = jnp.concatenate(
            [bmax, jnp.full((pad, 3), -jnp.inf, bmax.dtype)])
    blo = bmin.reshape(n_j, bp, 3).min(axis=1)
    bhi = bmax.reshape(n_j, bp, 3).max(axis=1)
    return jnp.concatenate(
        [blo, bhi, jnp.zeros((n_j, 2), blo.dtype)], axis=-1)


def _eval_constraints(cons_layout, cons_refs, px_, py_, pz_, like):
    """Inline CSG clause check at candidate points (shared by the dense
    and BVH kernels).  cons_layout rows: (positive, [(ptype, table_idx,
    has_inv, M)]); tables are SMEM scalars."""
    allok = jnp.ones_like(like)
    for positive, ml in cons_layout:
        inn = jnp.zeros_like(like)
        for cptype, ci, has_inv, M in ml:
            tab = cons_refs[ci]
            for mrow in range(M):
                if has_inv:
                    itab = cons_refs[ci + 1]
                    def mi(q):
                        return itab[mrow, q]
                    cx = mi(0) * px_ + mi(1) * py_ + mi(2) * pz_ + mi(3)
                    cy = mi(4) * px_ + mi(5) * py_ + mi(6) * pz_ + mi(7)
                    cz = mi(8) * px_ + mi(9) * py_ + mi(10) * pz_ + mi(11)
                else:
                    cx, cy, cz = px_, py_, pz_
                def c(q, tab=tab, mrow=mrow):
                    return tab[mrow, q]
                inn = inn | _inside_comp(cptype, c, cx, cy, cz)
        allok = allok & (inn == positive)
    return allok


def pack_constraints(sc, garrs, g, stop_grad=True):
    """(cons_layout-ready list, SMEM tables) for a group's inline CSG
    constraints, shared prep for dense_intersect / bvh_intersect."""
    import jax as _jax
    sg = (_jax.lax.stop_gradient if stop_grad else (lambda x: x))
    cons = []
    for positive, members in (g.constraints or []):
        ms = []
        for gi2, idx in members:
            g2 = sc.groups[gi2]
            ga2 = _jax.tree.map(sg, garrs[gi2])
            cmat = pack_params_rows(g2.ptype,
                                    {k: ga2[k][idx] for k in ga2
                                     if k not in ("m_inv", "m_fwd")})
            cmi = (ga2["m_inv"][idx].reshape(len(idx), 12)
                   if g2.m_inv is not None else None)
            ms.append((g2.ptype, cmat, cmi))
        cons.append((positive, ms))
    return cons


def dense_intersect(ptype: str, params_T, m_inv, vis, constraints,
                    o, d, seed_t, interpret: Optional[bool] = None,
                    block_bbox=None, shadow: bool = False):
    """Nearest valid candidate of every ray against a dense prim group.

    params_T: (F, P) transposed packed params.  m_inv: (P, 12) or None.
    vis: (P,) float 0/1.  constraints: list of
    (positive, [(ptype2, cparams (M, F2), cminv (M, 12) or None)]).
    block_bbox: optional (n_j, 8) per-prim-block AABB table; when given,
    each grid step slab-tests the whole ray tile against the block's box
    (vs the running best-t) and skips the prim tests on a miss -- with
    Morton-ordered prims this culls most (ray tile, prim block) pairs.
    shadow adds any-hit early-out: a tile whose rays all found blockers
    skips remaining blocks.
    Returns (best_t, best_local); best_t == seed_t where nothing nearer.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = o.shape[0]
    F, P = params_T.shape
    n_cons = sum(cm.shape[0] for _, ms in constraints for _, cm, _ in ms)
    BN = _pick_bn(n_cons)
    n_i = pl.cdiv(N, BN)
    n_j = pl.cdiv(P, BP)
    cull = block_bbox is not None and n_j > 1
    transformed = m_inv is not None
    tker = _T_KERNELS[ptype]

    # constraint tables -> one flat (rows, cols) SMEM f32 table per member
    cons_tables = []
    cons_layout = []
    for positive, members in constraints:
        ml = []
        for cptype, cmat, cminv in members:
            ml.append((cptype, len(cons_tables), cminv is not None,
                       int(cmat.shape[0])))
            cons_tables.append(jnp.asarray(cmat, jnp.float32))
            if cminv is not None:
                cons_tables.append(jnp.asarray(cminv, jnp.float32))
        cons_layout.append((positive, ml))

    def kernel(rays_ref, pm_ref, vis_ref, *rest):
        k = 0
        bbox_ref = None
        if cull:
            bbox_ref = rest[k]
            k += 1
        minv_ref = None
        if transformed:
            minv_ref = rest[k]
            k += 1
        cons_refs = rest[k:k + len(cons_tables)]
        out_t = rest[k + len(cons_tables)]
        out_l = rest[k + len(cons_tables) + 1]

        j = pl.program_id(1)

        # rays arrive as (8, BN) component planes (a lane-major layout
        # with zero tile padding; (BN, 3) operands would be padded 42x
        # in HBM by the (8,128) tiling); rotate each component to a
        # (BN, 1) column for the rays-down-sublanes candidate layout.
        def rrow(idx):
            return rays_ref[idx:idx + 1, :].reshape(BN, 1)

        ox, oy, oz = rrow(0), rrow(1), rrow(2)
        dx, dy, dz = rrow(3), rrow(4), rrow(5)
        seed_col = rrow(6)

        @pl.when(j == 0)
        def _():
            out_t[:] = seed_col.reshape(1, BN)
            out_l[:] = jnp.full((1, BN), -1, jnp.int32)

        if cull:
            # tile-vs-block AABB rejection against the running best
            bt0 = out_t[:].reshape(BN, 1)
            def slab(lo, hi, oc, dc):
                inv = 1.0 / jnp.where(dc == 0.0, 1e-20, dc)
                ta = (lo - oc) * inv
                tb = (hi - oc) * inv
                return jnp.minimum(ta, tb), jnp.maximum(ta, tb)
            nx, fx = slab(bbox_ref[j, 0], bbox_ref[j, 3], ox, dx)
            ny, fy = slab(bbox_ref[j, 1], bbox_ref[j, 4], oy, dy)
            nz, fz = slab(bbox_ref[j, 2], bbox_ref[j, 5], oz, dz)
            near = jnp.maximum(jnp.maximum(nx, ny), nz)
            far = jnp.minimum(jnp.minimum(fx, fy), fz)
            live = (near <= far) & (far > 0.0) & (near < bt0)
            if shadow:
                live = live & (bt0 >= seed_col)
            do_block = jnp.any(live)
        else:
            do_block = None

        def p(idx):
            return pm_ref[idx:idx + 1, :]                 # (1, BP)

        def block_body():
            if transformed:
                def m(idx):
                    return minv_ref[idx:idx + 1, :]       # (1, BP)
                # object-space ray per (ray, prim) pair
                pox = m(0) * ox + m(1) * oy + m(2) * oz + m(3)
                poy = m(4) * ox + m(5) * oy + m(6) * oz + m(7)
                poz = m(8) * ox + m(9) * oy + m(10) * oz + m(11)
                pdx = m(0) * dx + m(1) * dy + m(2) * dz
                pdy = m(4) * dx + m(5) * dy + m(6) * dz
                pdz = m(8) * dx + m(9) * dy + m(10) * dz
                ils = jax.lax.rsqrt(pdx * pdx + pdy * pdy + pdz * pdz)
                t0, t1 = tker(p, pox, poy, poz,
                              pdx * ils, pdy * ils, pdz * ils)
                t0 = jnp.where(t0 >= INF, INF, t0 * ils)
                t1 = jnp.where(t1 >= INF, INF, t1 * ils)
            else:
                t0, t1 = tker(p, ox, oy, oz, dx, dy, dz)

            bt = out_t[:].reshape(BN, 1)
            visrow = vis_ref[0:1, :] > 0.5                # (1, BP)
            pid = jax.lax.broadcasted_iota(jnp.int32, (1, BP), 1) + j * BP
            ok = visrow & (pid < P)
            v0 = ok & (t0 > 0.0) & (t0 < bt)
            v1 = ok & (t1 > 0.0) & (t1 < bt)

            if cons_layout:
                for which, (tv, vm) in enumerate(((t0, v0), (t1, v1))):
                    px_ = ox + dx * tv
                    py_ = oy + dy * tv
                    pz_ = oz + dz * tv
                    allok = _eval_constraints(cons_layout, cons_refs,
                                              px_, py_, pz_, vm)
                    if which == 0:
                        v0 = v0 & allok
                    else:
                        v1 = v1 & allok

            tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
            tbest = jnp.min(tc, axis=-1, keepdims=True)   # (BN, 1)
            arg = jnp.argmin(tc, axis=-1).astype(jnp.int32)[:, None]
            lbest = arg + j * BP
            better = tbest < bt
            out_t[:] = jnp.where(better, tbest, bt).reshape(1, BN)
            out_l[:] = jnp.where(better, lbest,
                                 out_l[:].reshape(BN, 1)).reshape(1, BN)

        if cull:
            pl.when(do_block)(block_body)
        else:
            block_body()

    # one (8, N) component-plane ray array: zero padding under the TPU
    # (8, 128) tiling, where (N, 3)/(N, 1) operands would blow up 42/128x
    rays8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                       d[:, 0], d[:, 1], d[:, 2],
                       seed_t, jnp.zeros_like(seed_t)])
    in_specs = [
        pl.BlockSpec((8, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, BP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [rays8, params_T, jnp.asarray(vis)[None, :]]
    if cull:
        # whole table in SMEM, indexed by the grid step (blocked SMEM
        # specs need 8-divisible blocks; the table is tiny)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(block_bbox)
    if transformed:
        in_specs.append(pl.BlockSpec((12, BP), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(m_inv.reshape(P, 12).T)
    for tab in cons_tables:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(tab))

    out_shape = (jax.ShapeDtypeStruct((1, N), o.dtype),
                 jax.ShapeDtypeStruct((1, N), jnp.int32))
    out_specs = (pl.BlockSpec((1, BN), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, BN), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM))

    bt, bl = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return bt[0], bl[0]


# --- per-tile BVH traversal ------------------------------------------------

RT = 1024  # rays per traversal tile, laid out as one (8, 128) vreg block


def bvh_intersect(ptype: str, bvh, params_leaf_rows, vis_leaf, constraints,
                  o, d, seed_t, shadow: bool = False,
                  interpret: Optional[bool] = None):
    """Skip-link BVH traversal, one (8,128)-ray tile per grid step.

    TPU-native traversal design: the whole node table and the
    leaf-ordered prim parameters are SCALARS in SMEM (tens of KB), so a
    tile's node pointer is one scalar and a traversal step is pure
    (8,128) vector math against scalar bounds -- no gathers at all.
    Grid steps are sequential, so total work adapts per tile (a tile
    that misses the root exits after one step), unlike a lockstep
    whole-batch while_loop.  Rays must arrive in coherent (screen-tile)
    order for tight tiles; see render.tile_order.

    bvh: accel.BvhFlat.  params_leaf_rows: (P, F) prim params already
    permuted into leaf order (bvh.order applied).  vis_leaf: (P,) 0/1.
    Returns (t, leaf_local) where leaf_local indexes the LEAF ORDER
    (caller maps back through bvh.order).
    """
    import numpy as _np

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = o.shape[0]
    P, F = params_leaf_rows.shape
    M = bvh.n_nodes
    tker = _T_KERNELS[ptype]
    from .accel import LEAF_MAX

    T = pl.cdiv(N, RT)
    pad = T * RT - N
    rays8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                       d[:, 0], d[:, 1], d[:, 2],
                       seed_t, jnp.zeros_like(seed_t)])
    if pad:
        # padded rays get seed 0 -> never produce hits
        fill = jnp.zeros((8, pad), rays8.dtype).at[3].set(1.0)
        rays8 = jnp.concatenate([rays8, fill], axis=1)
    rays_t = rays8.reshape(8, T, 8, 128)

    # SMEM windows pad every row to 128 lanes, so all scalar tables go
    # in FLAT 1D: a 2D (M, 6) table would cost M*512 bytes of the 1 MB
    # SMEM budget instead of M*24.
    nf = jnp.concatenate([jnp.asarray(bvh.bmin, jnp.float32),
                          jnp.asarray(bvh.bmax, jnp.float32)],
                         axis=1).reshape(-1)
    ni = jnp.stack([jnp.asarray(bvh.skip, jnp.int32),
                    jnp.asarray(bvh.leaf_start, jnp.int32),
                    jnp.asarray(bvh.leaf_count, jnp.int32)],
                   axis=1).reshape(-1)

    cons_tables = []
    cons_layout = []
    for positive, members in constraints:
        ml = []
        for cptype, cmat, cminv in members:
            ml.append((cptype, len(cons_tables), cminv is not None,
                       int(cmat.shape[0])))
            cons_tables.append(jnp.asarray(cmat, jnp.float32))
            if cminv is not None:
                cons_tables.append(jnp.asarray(cminv, jnp.float32))
        cons_layout.append((positive, ml))

    def kernel(rays_ref, nf_ref, ni_ref, pf_ref, vis_ref, *rest):
        cons_refs = rest[:len(cons_tables)]
        out_t = rest[len(cons_tables)]
        out_l = rest[len(cons_tables) + 1]

        def rc(c):
            return rays_ref[c, 0]                    # (8, 128)

        ox, oy, oz = rc(0), rc(1), rc(2)
        dx, dy, dz = rc(3), rc(4), rc(5)
        seed = rc(6)
        ivx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)

        def leaf_tests(args):
            bt, bl, hit, ls, lc = args
            for k in range(LEAF_MAX):
                p = jnp.minimum(ls + k, P - 1)
                valid = (k < lc) & (vis_ref[p] > 0.5)

                def f(q, p=p):
                    return pf_ref[p * F + q]

                t0, t1 = tker(f, ox, oy, oz, dx, dy, dz)
                v0 = valid & hit & (t0 > 0.0) & (t0 < bt)
                v1 = valid & hit & (t1 > 0.0) & (t1 < bt)
                if cons_layout:
                    for which, (tv, vm) in enumerate(((t0, v0), (t1, v1))):
                        px_ = ox + dx * tv
                        py_ = oy + dy * tv
                        pz_ = oz + dz * tv
                        ok = _eval_constraints(cons_layout, cons_refs,
                                               px_, py_, pz_, vm)
                        if which == 0:
                            v0 = v0 & ok
                        else:
                            v1 = v1 & ok
                tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
                better = tc < bt
                bt = jnp.where(better, tc, bt)
                bl = jnp.where(better, p, bl)
            return bt, bl

        def body(st):
            node, bt, bl = st
            nb = node * 6
            t1x = (nf_ref[nb + 0] - ox) * ivx
            t2x = (nf_ref[nb + 3] - ox) * ivx
            t1y = (nf_ref[nb + 1] - oy) * ivy
            t2y = (nf_ref[nb + 4] - oy) * ivy
            t1z = (nf_ref[nb + 2] - oz) * ivz
            t2z = (nf_ref[nb + 5] - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                          jnp.maximum(t1y, t2y)),
                              jnp.maximum(t1z, t2z))
            hit = (near <= far) & (far > 0.0) & (near < bt)
            anyhit = jnp.any(hit)
            lc = ni_ref[node * 3 + 2]
            ls = ni_ref[node * 3 + 1]
            bt, bl = jax.lax.cond(
                anyhit & (lc > 0),
                leaf_tests,
                lambda args: (args[0], args[1]),
                (bt, bl, hit, ls, lc))
            nxt = jnp.where(anyhit, node + 1, ni_ref[node * 3])
            if shadow:
                nxt = jnp.where(jnp.all(bt < seed), M, nxt)
            return nxt, bt, bl

        def cond(st):
            return st[0] < M

        bl0 = jnp.full((8, 128), -1, jnp.int32)
        _, bt, bl = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), seed, bl0))
        out_t[0] = bt
        out_l[0] = bl

    in_specs = [
        pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [rays_t, nf, ni,
              jnp.asarray(params_leaf_rows, jnp.float32).reshape(-1),
              jnp.asarray(vis_leaf, jnp.float32)]
    for tab in cons_tables:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(tab)

    out_shape = (jax.ShapeDtypeStruct((T, 8, 128), o.dtype),
                 jax.ShapeDtypeStruct((T, 8, 128), jnp.int32))
    out_specs = (pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM))

    bt, bl = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return bt.reshape(-1)[:N], bl.reshape(-1)[:N]

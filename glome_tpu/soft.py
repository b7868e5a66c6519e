"""Soft-edge visibility relaxation: pixel gradients through silhouettes.

The hard tracer's visibility is a select: gradients flow through the
winning hit's parameters within a smooth region, but the *coverage*
step at a silhouette or occlusion boundary has zero derivative, so an
optimization can never MOVE an edge (VERDICT r1, missing #1; the
BASELINE north star demands soft-edge relaxation).

This module implements the standard soft-coverage relaxation (in the
spirit of SoftRas / differentiable rasterization): every ray gets a
smooth signed edge field `e` for its winning primitive (positive inside
the silhouette, negative outside, zero exactly on it) and a coverage

    alpha = sigmoid(e / tau)

The rendered color is  alpha * hit_color + (1 - alpha) * miss_color.
Rays that MISS also get a two-sided contribution: the nearest-to-
silhouette primitive (largest e < 0) is shaded at its closest-approach
surface point and blended in with its (small) alpha, so gradients pull
coverage outward as well as pushing it inward -- a translated object
can be recovered, not just shrunk.

tau -> 0 recovers the hard image exactly: for any actual hit e > 0 so
alpha -> 1, for any miss e < 0 on every prim so alpha -> 0 (verified
bit-for-bit in tests/test_soft.py).

Edge fields per primitive type (object space for transformed groups):
  sphere    r^2 - |perp|^2           (quadratic discriminant; smooth)
  box       min over axes of slab overlap (far - near; piecewise linear)
  triangle  min barycentric margin * 2 * area-scale (signed, linear)
  disc      r^2 - |p - pos|^2 at the plane crossing (smooth)
  cylinder  quadratic discriminant vs the z-slab interval overlap
  cone      same scheme with the cone quadratic (Cone.hs:155-204 form)
  plane     +INF on hit, -INF on miss (hard fallback; no soft edge)

CSG winners (csg_id >= 0) additionally take the min of their own prim
edge field and the *clause-validity margin*: for every other clause of
the winner's CSG object, a smooth inside-margin over the clause's
members (positive inside), signed by the clause polarity
(Csg.hs:92-101 semantics: IN(set) == positive).  The margin is exactly
positive where the hard kernel accepted the candidate, so tau -> 0
exactness is preserved, and it moves when CSG member parameters move --
optimization can translate a subtracted cavity, not just the host
surface.  Near-miss candidates from CSG groups get the same margin at
their synthetic surface point (applied after candidate selection; the
argmax runs on the raw prim field).  DNF sibling-exclusion regions
(non-conjunctive CSG) are not relaxed: their winners keep the own-field
+ margin treatment only.

Scope: the soft pass sweeps the prim groups of scene 0 with a dense
O(N*P) jnp pass -- it targets optimization workloads (BASELINE config
5), which render small batches; the production forward path stays the
hard megakernel.  Miss-side synthetic shading is depth-1 surface
shading (no child rays, no shadow query): its weight vanishes as
tau -> 0 so exactness is unaffected.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import color as C
from .config import DELTA, INFINITY
from .trace import Tracer, TraceResult, _light_arrays
from .vec import vdot, vnorm, vscaleadd

BIG = 1e9


def _edge_and_point(ptype, params, o, d):
    """(e, q, n): smooth signed edge field, closest-approach surface
    point and its outward normal for one prim batch against rays.
    o, d: (N, 3); params broadcast (P, ...) vs (N, 1, 3) handled by the
    caller (inputs arrive already broadcast to a common (N, P, 3))."""
    if ptype == "sphere":
        c, r = params["center"], params["radius"]
        oc = c - o
        tca = vdot(oc, d)                       # along-ray closest approach
        perp = oc - d * tca[..., None]
        e = r * r - vdot(perp, perp)            # discriminant: smooth
        n = vnorm(-perp + jnp.asarray([0.0, 0.0, 1e-12], o.dtype))
        q = c + n * r[..., None]
        inside = vdot(oc, oc) < r * r
        e = jnp.where((tca <= 0.0) & ~inside, -BIG, e)
        return e, q, n
    if ptype == "box":
        bmin, bmax = params["bmin"], params["bmax"]
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ta = (bmin - o) * inv
        tb = (bmax - o) * inv
        near = jnp.max(jnp.minimum(ta, tb), axis=-1)
        far = jnp.min(jnp.maximum(ta, tb), axis=-1)
        e = jnp.where(far > 0.0, far - near, -BIG)
        tmid = jnp.maximum(0.5 * (near + far), 0.0)
        q = o + d * tmid[..., None]
        qc = jnp.clip(q, bmin, bmax)
        n = vnorm(q - qc + 1e-12)
        return e, qc, n
    if ptype in ("triangle", "trianglenorm"):
        p1, p2, p3 = params["p1"], params["p2"], params["p3"]
        e1 = p2 - p1
        e2 = p3 - p1
        pv = jnp.cross(d, e2)
        det = vdot(e1, pv)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tv = o - p1
        b1 = vdot(tv, pv) * inv_det
        qv = jnp.cross(tv, e1)
        b2 = vdot(d, qv) * inv_det
        t = vdot(e2, qv) * inv_det
        margin = jnp.minimum(jnp.minimum(b1, b2), 1.0 - b1 - b2)
        e = jnp.where((t > 0.0) & (jnp.abs(det) > 1e-12), margin, -BIG)
        q = p1 + e1 * b1[..., None] + e2 * b2[..., None]
        n = vnorm(jnp.cross(e1, e2))
        n = jnp.where(vdot(n, d)[..., None] > 0.0, -n, n)
        return e, q, n
    if ptype == "disc":
        pos, norm, rsqr = params["pos"], params["norm"], params["rsqr"]
        dn = vdot(norm, d)
        dn_s = jnp.where(jnp.abs(dn) < 1e-12, 1e-12, dn)
        t = -vdot(norm, o - pos) / dn_s
        p = o + d * t[..., None]
        off = p - pos
        e = rsqr - vdot(off, off)
        e = jnp.where((t > 0.0) & (jnp.abs(dn) > 1e-12), e, -BIG)
        # closest point on the disc: clamp the radial offset to r
        olen = jnp.sqrt(jnp.maximum(vdot(off, off), 1e-24))
        scale = jnp.minimum(1.0, jnp.sqrt(jnp.maximum(rsqr, 0.0)) / olen)
        q = pos + off * scale[..., None]
        n = jnp.where(dn[..., None] > 0.0, -norm, norm)
        n = jnp.broadcast_to(n, q.shape)
        return e, q, n
    if ptype == "cylinder":
        # canonical z-axis cylinder (geom.cylinder_hits2 conventions):
        # edge = quadratic discriminant when the xy-ray misses the
        # infinite cylinder (smooth), else the [quadratic] x [z-slab]
        # interval overlap (piecewise linear, > 0 exactly on hits)
        r, h1, h2 = params["radius"], params["h1"], params["h2"]
        ox, oy = o[..., 0], o[..., 1]
        dx, dy = d[..., 0], d[..., 1]
        a = dx * dx + dy * dy
        a_s = jnp.maximum(a, 1e-12)
        b = 2.0 * (dx * ox + dy * oy)
        c = ox * ox + oy * oy - r * r
        disc = b * b - 4.0 * a * c
        has_roots = disc > 0.0
        # sqrt of a clamped-positive guard value: where() does not stop
        # NaN cotangents from sqrt(0) leaking into the other branch
        sq = jnp.sqrt(jnp.where(has_roots, disc, 1.0))
        lo = jnp.where(has_roots, (-b - sq) / (2.0 * a_s), BIG)
        hi = jnp.where(has_roots, (-b + sq) / (2.0 * a_s), -BIG)
        vert = a < 1e-10
        lo = jnp.where(vert, jnp.where(c < 0.0, -BIG, BIG), lo)
        hi = jnp.where(vert, jnp.where(c < 0.0, BIG, -BIG), hi)
        zlo, zhi = _slab1(o[..., 2], d[..., 2], h1, h2)
        t0 = jnp.maximum(lo, zlo)
        t1 = jnp.minimum(hi, zhi)
        ov = jnp.clip(t1 - t0, -BIG, BIG)
        # gate: candidate interval entirely behind the origin (and the
        # origin outside) can never become a hit by growing the prim
        inside_o = (c < 0.0) & (o[..., 2] > h1) & (o[..., 2] < h2)
        ov = jnp.where((t1 <= 0.0) & ~inside_o, -BIG, ov)
        tstar = -b / (2.0 * a_s)
        smooth_miss = ~vert & ~has_roots
        e = jnp.where(smooth_miss,
                      jnp.where((tstar <= 0.0) & ~inside_o, -BIG,
                                disc / (4.0 * a_s)),
                      ov)
        pstar = o + d * jnp.maximum(tstar, 0.0)[..., None]
        q, n = _cyl_surface(r, h1, h2, pstar)
        return e, q, n
    if ptype == "cone":
        # canonical clipped cone (geom.cone_hits2 conventions): same
        # scheme with the cone quadratic; a <= 0 tail intervals follow
        # the exact kernel so hits keep e > 0
        r, c1, c2, height = (params["radius"], params["clip1"],
                             params["clip2"], params["height"])
        ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        kp = r / height
        k = kp * kp
        a = dx * dx + dy * dy - k * dz * dz
        b = 2.0 * (dx * ox + dy * oy - k * dz * (oz - height))
        c = ox * ox + oy * oy - k * (oz - height) * (oz - height)
        disc = b * b - 4.0 * a * c
        a_abs = jnp.maximum(jnp.abs(a), 1e-12)
        has_roots = disc > 0.0
        sq = jnp.sqrt(jnp.where(has_roots, disc, 1.0))
        sq = jnp.where(has_roots, sq, 0.0)
        lo = (-b - sq * jnp.sign(a)) / (2.0 * jnp.where(a == 0.0, 1e-12, a))
        hi = (-b + sq * jnp.sign(a)) / (2.0 * jnp.where(a == 0.0, 1e-12, a))
        # a > 0: inside between roots.  a < 0: tails; within z < height
        # only one tail applies, picked by sign(dz) (geom.cone_hits2)
        pos_lo, pos_hi = lo, hi
        neg_lo = jnp.where(dz > 0.0, -BIG, hi)
        neg_hi = jnp.where(dz > 0.0, lo, BIG)
        b_s = jnp.where(jnp.abs(b) < 1e-12, 1e-12, b)
        lin_t = -c / b_s
        lin_lo = jnp.where(b < 0.0, lin_t, -BIG)
        lin_hi = jnp.where(b < 0.0, BIG, lin_t)
        flo = jnp.where(a > 0.0, pos_lo, jnp.where(a < 0.0, neg_lo, lin_lo))
        fhi = jnp.where(a > 0.0, pos_hi, jnp.where(a < 0.0, neg_hi, lin_hi))
        no_roots = (a != 0.0) & (disc < 0.0)
        flo = jnp.where(no_roots, jnp.where(a > 0.0, BIG, -BIG), flo)
        fhi = jnp.where(no_roots, jnp.where(a > 0.0, -BIG, BIG), fhi)
        zlo, zhi = _slab1(oz, dz, c1, c2)
        t0 = jnp.maximum(flo, zlo)
        t1 = jnp.minimum(fhi, zhi)
        ov = jnp.clip(t1 - t0, -BIG, BIG)
        miss_smooth = (a > 0.0) & (disc < 0.0)
        e = jnp.where(miss_smooth, disc / (4.0 * a_abs), ov)
        rz_o = kp * (height - oz)
        inside_o = (oz > c1) & (oz < c2) & (c < 0.0) & (rz_o > 0.0)
        e = jnp.where((t1 <= 0.0) & ~inside_o & ~miss_smooth, -BIG, e)
        tstar = -b / (2.0 * jnp.where(a == 0.0, 1e-12, a))
        e = jnp.where(miss_smooth & (tstar <= 0.0) & ~inside_o, -BIG, e)
        pstar = o + d * jnp.maximum(jnp.where(a > 0.0, tstar, 0.0),
                                    0.0)[..., None]
        q, n = _cone_surface(r, c1, c2, height, pstar)
        return e, q, n
    return None


def _slab1(oz, dz, h1, h2):
    """Smooth parameter interval where h1 < z < h2 (soft variant of
    geom._zslab: parallel rays resolved by origin containment)."""
    dz_s = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    ta = (h1 - oz) / dz_s
    tb = (h2 - oz) / dz_s
    lo = jnp.minimum(ta, tb)
    hi = jnp.maximum(ta, tb)
    para = jnp.abs(dz) < 1e-12
    in_slab = (oz > h1) & (oz < h2)
    lo = jnp.where(para, jnp.where(in_slab, -BIG, BIG), lo)
    hi = jnp.where(para, jnp.where(in_slab, BIG, -BIG), hi)
    return lo, hi


def _cyl_surface(r, h1, h2, pstar):
    """Nearest side-surface point/normal to a probe point (canonical)."""
    xy = pstar[..., :2]
    xylen = jnp.sqrt(jnp.maximum(vdot(xy, xy), 1e-24))
    ux = xy[..., 0] / xylen
    uy = xy[..., 1] / xylen
    zc = jnp.clip(pstar[..., 2], h1, h2)
    q = jnp.stack([ux * r, uy * r, zc], axis=-1)
    n = jnp.stack([ux, uy, jnp.zeros_like(ux)], axis=-1)
    return q, n


def _cone_surface(r, c1, c2, height, pstar):
    """Nearest cone-side point/normal to a probe point (canonical)."""
    kp = r / height
    xy = pstar[..., :2]
    xylen = jnp.sqrt(jnp.maximum(vdot(xy, xy), 1e-24))
    ux = xy[..., 0] / xylen
    uy = xy[..., 1] / xylen
    zc = jnp.clip(pstar[..., 2], c1, jnp.minimum(c2, height - 1e-6))
    rz = jnp.maximum(kp * (height - zc), 1e-6)
    q = jnp.stack([ux * rz, uy * rz, zc], axis=-1)
    invhyp = 1.0 / jnp.sqrt(height * height + r * r)
    up = r * invhyp
    out = height * invhyp
    n = jnp.stack([ux * out, uy * out,
                   jnp.broadcast_to(up, ux.shape)], axis=-1)
    return q, n


def _inside_margin(ptype, params, p):
    """Smooth signed inside-margin of prims at points: positive exactly
    where _inside_comp / the geom *_inside tests are True (strictly),
    negative outside, zero on the boundary.  p: (N, P, 3) object-space
    points broadcast against (1, P, ...) params.  Zero-volume prims
    (triangle/disc) are never inside (-BIG)."""
    if ptype == "sphere":
        off = params["center"] - p
        return params["radius"] ** 2 - vdot(off, off)
    if ptype == "plane":
        return params["offset"] - vdot(params["norm"], p)
    if ptype == "box":
        lo = p - params["bmin"]
        hi = params["bmax"] - p
        return jnp.min(jnp.minimum(lo, hi), axis=-1)
    if ptype == "cylinder":
        r, h1, h2 = params["radius"], params["h1"], params["h2"]
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        return jnp.minimum(r * r - x * x - y * y,
                           jnp.minimum(z - h1, h2 - z))
    if ptype == "cone":
        r, c1, c2, height = (params["radius"], params["clip1"],
                             params["clip2"], params["height"])
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        rz = r * (1.0 - (z - c1) / height)
        return jnp.minimum(rz * jnp.abs(rz) - x * x - y * y,
                           jnp.minimum(z - c1, c2 - z))
    return jnp.full(p.shape[:-1], -BIG, p.dtype)


class SoftTracer:
    """Wraps a (hard) Tracer with soft-coverage blending.

    render(arrays, o, d) -> (N, 4) premultiplied-style ColorA where
    visibility at silhouettes is a sigmoid of the edge field with
    temperature `tau`.  tau <= 0 returns the hard color unchanged."""

    SOFT_TYPES = ("sphere", "box", "triangle", "trianglenorm",
                  "disc", "cylinder", "cone")

    def __init__(self, tracer: Tracer, tau: float = 1e-2):
        self.tracer = tracer
        self.tau = float(tau)
        cc = tracer.compiled
        # scene-0 groups with a soft edge field (CSG members included:
        # their winners/candidates take the min with the clause margin)
        self.soft_groups = [
            (gi, g) for gi, g in enumerate(cc.scenes[0].groups)
            if g.size > 0 and not bool(g.onlyshadow.any())
            and g.ptype in self.SOFT_TYPES]
        self.has_csg = any(np.any(g.csg_id >= 0)
                           for _gi, g in self.soft_groups)

    # -- edge field of the winner + best near-miss candidate ---------------

    def _soft_pass(self, arrays, o, d, hit_serial):
        """Per-ray: edge field of the winning prim (+BIG when the winner
        has no soft field), and the best near-miss soft candidate
        (largest e among prims that are NOT the winner) with its
        synthetic surface point/normal/texture stack.  Also returns the
        winner's and the candidate's (csg_id, clause) for the clause
        margin, -1 for plain prims."""
        N = o.shape[0]
        dt = o.dtype
        cc = self.tracer.compiled
        e_win = jnp.full((N,), BIG, dt)
        e_best = jnp.full((N,), -BIG, dt)
        q_best = jnp.zeros((N, 3), dt)
        n_best = jnp.zeros((N, 3), dt)
        win_cid = jnp.full((N,), -1, jnp.int32)
        win_cl = jnp.full((N,), -1, jnp.int32)
        cand_cid = jnp.full((N,), -1, jnp.int32)
        cand_cl = jnp.full((N,), -1, jnp.int32)
        from .compile import TEX_DEPTH
        tex_best = jnp.full((N, TEX_DEPTH), -1, jnp.int32)
        from .compile import group_device_params
        for gi, g in self.soft_groups:
            garr = group_device_params(g, arrays["scenes"][0][gi])
            params = {}
            for k, v in garr.items():
                if k in ("m_inv", "m_fwd"):
                    continue
                v = jnp.asarray(v, dt)
                params[k] = v[None]             # (1, P, ...)
            oo = o[:, None]
            dd = d[:, None]
            if g.m_inv is not None:
                mi = jnp.asarray(garr["m_inv"], dt)[None]      # (1,P,3,4)
                oo = jnp.einsum('npij,nj->npi', mi[..., :3], o) \
                    + mi[..., 3]
                dd = jnp.einsum('npij,nj->npi', mi[..., :3], d)
                dd = vnorm(dd)
            out = _edge_and_point(g.ptype, params, oo, dd)
            e, q, n = out                          # (N, P[, 3])
            if g.m_inv is not None:
                mf = jnp.asarray(garr["m_fwd"], dt)[None]
                q = jnp.einsum('npij,npj->npi', mf[..., :3], q) + mf[..., 3]
                # normals transform by the inverse transpose
                n = vnorm(jnp.einsum('npji,npj->npi', mi[..., :3], n))
            serials = jnp.asarray(g.prim_serial)[None]         # (1, P)
            is_win = serials == hit_serial[:, None]
            any_win = jnp.any(is_win, axis=1)
            e_win = jnp.where(any_win,
                              jnp.max(jnp.where(is_win, e, -BIG), axis=1),
                              e_win)
            jw = jnp.argmax(jnp.where(is_win, e, -BIG), axis=1)
            win_cid = jnp.where(any_win,
                                jnp.asarray(g.csg_id)[jw], win_cid)
            win_cl = jnp.where(any_win,
                               jnp.asarray(g.csg_clause)[jw], win_cl)
            # best near-miss candidate (exclude the winner itself)
            e_m = jnp.where(is_win, -BIG, e)
            j = jnp.argmax(e_m, axis=1)
            ej = jnp.take_along_axis(e_m, j[:, None], axis=1)[:, 0]
            upd = ej > e_best
            take = lambda a: jnp.take_along_axis(
                a, j[:, None, None], axis=1)[:, 0]
            q_best = jnp.where(upd[:, None], take(q), q_best)
            n_best = jnp.where(upd[:, None], take(n), n_best)
            tex_g = jnp.asarray(g.tex_stack)[j]
            tex_best = jnp.where(upd[:, None], tex_g, tex_best)
            cand_cid = jnp.where(upd, jnp.asarray(g.csg_id)[j], cand_cid)
            cand_cl = jnp.where(upd, jnp.asarray(g.csg_clause)[j], cand_cl)
            e_best = jnp.where(upd, ej, e_best)
        return (e_win, e_best, q_best, n_best, tex_best,
                (win_cid, win_cl), (cand_cid, cand_cl))

    # -- CSG clause-validity margin ---------------------------------------

    def _csg_margin(self, arrays, p, cid_arr, cl_arr):
        """Smooth clause-validity margin at points p (N, 3) for rays
        whose prim belongs to CSG object `cid_arr` via clause `cl_arr`:
        min over the OTHER clauses of (positive ? m : -m) where m is
        the clause's smooth inside-margin (max over members).  Exactly
        positive where the kernel's eval_cons accepted the candidate
        (Csg.hs:92-101), so tau -> 0 keeps the hard image.  +BIG for
        plain prims (cid -1)."""
        from .compile import group_device_params
        cc = self.tracer.compiled
        sc = cc.scenes[0]
        N = p.shape[0]
        dt = p.dtype
        out = jnp.full((N,), BIG, dt)
        if not self.has_csg:
            return out
        for cid, csg in enumerate(sc.csgs):
            sel = cid_arr == cid
            m_total = jnp.full((N,), BIG, dt)
            for ci, clause in enumerate(csg.clauses):
                m_cl = jnp.full((N,), -BIG, dt)
                for gi, idx in clause.members:
                    g = sc.groups[gi]
                    garr = group_device_params(
                        g, arrays["scenes"][0][gi])
                    params = {}
                    for k, v in garr.items():
                        if k in ("m_inv", "m_fwd"):
                            continue
                        v = jnp.asarray(v, dt)[np.asarray(idx)]
                        params[k] = v[None]
                    pp = p[:, None]
                    if g.m_inv is not None:
                        mi = jnp.asarray(garr["m_inv"],
                                         dt)[np.asarray(idx)][None]
                        pp = jnp.einsum('npij,nj->npi',
                                        mi[..., :3], p) + mi[..., 3]
                    m = _inside_margin(g.ptype, params, pp)  # (N, M)
                    m_cl = jnp.maximum(m_cl, m.max(axis=1))
                sgn = 1.0 if clause.positive else -1.0
                m_signed = sgn * m_cl
                # the candidate's own clause is not re-validated
                m_signed = jnp.where(cl_arr == ci, BIG, m_signed)
                m_total = jnp.minimum(m_total, m_signed)
            out = jnp.where(sel, m_total, out)
        return out

    def _shade_point(self, arrays, d, q, n, tex_stack):
        """Depth-1 surface shading of a synthetic hit (no child rays, no
        shadow query -- the soft sliver's weight vanishes with tau)."""
        from .intersect import Hit
        from .compile import TAG_DEPTH
        N = q.shape[0]
        dt = q.dtype
        cc = self.tracer.compiled
        lights = cc.lights
        lpos, lcol, lrad = _light_arrays(cc, arrays, lights)
        light_contribs = []
        for li, l in enumerate(lights):
            lvec = lpos[li] - q
            llen = jnp.sqrt(vdot(lvec, lvec))
            ldir = lvec / jnp.maximum(llen, 1e-20)[..., None]
            active = (vdot(lvec, n) >= 0.0) & (llen <= lrad[li])
            contrib = jnp.where(active[:, None],
                                lcol[li] * l.falloff_at(llen)[:, None], 0.0)
            light_contribs.append((contrib, ldir, active))
        hit = Hit(t=jnp.ones((N,), dt), hit=jnp.ones((N,), bool),
                  pos=q, norm=n, obj_o=q, obj_d=d,
                  tex_stack=tex_stack,
                  tag_stack=jnp.full((N, TAG_DEPTH), -1, jnp.int32),
                  prim_serial=jnp.full((N,), -1, jnp.int32))
        ctx = dict(hit=hit, d=d, eyedir=-d, lights=light_contribs,
                   children={}, recurs=1)
        return self.tracer._fold_textures(ctx, hit, (N,), dt)

    # -- entry ---------------------------------------------------------------

    def render(self, arrays, o, d) -> jnp.ndarray:
        """(N, 4) soft-coverage color."""
        res = self.tracer.trace(arrays, o, d)
        if self.tau <= 0.0:
            return res.color
        dt = o.dtype
        N = o.shape[0]
        bg = (jnp.asarray(tuple(self.tracer.config.background) + (1.0,), dt)
              if self.tracer.config.background is not None
              else jnp.zeros((4,), dt))
        bg = jnp.broadcast_to(bg, (N, 4))
        hitm = res.t < INFINITY
        (e_win, e_best, q_best, n_best, tex_best,
         (win_cid, win_cl), (cand_cid, cand_cl)) = self._soft_pass(
            arrays, o, d, res.prim_serial)
        if self.has_csg:
            # CSG winners/candidates: edge = min(own field, clause
            # margin) so member motion moves the boolean silhouette
            p_hit = vscaleadd(o, d, jnp.where(hitm, res.t, 0.0))
            e_win = jnp.minimum(
                e_win, self._csg_margin(arrays, p_hit, win_cid, win_cl))
            e_best = jnp.minimum(
                e_best, self._csg_margin(arrays, q_best,
                                         cand_cid, cand_cl))
        # hit side: coverage of the winner
        a_hit = jax.nn.sigmoid(e_win / self.tau)
        hard = res.color
        c_hit = a_hit[:, None] * hard + (1.0 - a_hit)[:, None] * bg
        # miss side: nearest silhouette pulls coverage outward
        c_near = self._shade_point(arrays, d, q_best, n_best, tex_best)
        a_miss = jax.nn.sigmoid(e_best / self.tau)
        has_cand = e_best > -BIG * 0.5
        a_miss = jnp.where(has_cand, a_miss, 0.0)
        c_miss = a_miss[:, None] * c_near + (1.0 - a_miss)[:, None] * bg
        return jnp.where(hitm[:, None], c_hit, c_miss)


def soft_pixel_loss_fn(soft: SoftTracer):
    def loss(arrays, o, d, target_rgb):
        col = soft.render(arrays, o, d)
        rgb = col[..., :3] * col[..., 3:4]
        return jnp.mean((rgb - target_rgb) ** 2)
    return loss

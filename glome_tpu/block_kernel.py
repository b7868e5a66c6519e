"""Block-dense intersection for big primitive groups of ANY type.

Round-3 profiling (tools/PERF_BUDGET.md) attributed 25 of the 28 ms
L0-shadow launch to the megakernel's 'bvh' phases: a skip-link walk
over per-PRIM nodes whose leaves test ONE prim per step against the
(8,128) tile.  Secondary/shadow rays are tile-incoherent, so tiles
visit most of the tree and the per-node overhead dominates.

Layout facts this kernel is built on (micro-measured on the v5e):
  - an op on a (1024,1) value costs ~42x an op on (8,128) -- Mosaic
    keeps one lane per vreg -- so the mesh_kernel-style (BN,1) ray
    column layout must never touch per-node math;
  - dense (N,128) ops run at full VPU rate (~4.6 ns/vreg), and the
    per-candidate test cost is layout-invariant (~115 ns per prim per
    1024-ray tile) -- so CULLING granularity, not layout, decides the
    total.

Shape of this kernel:
  - prims are Morton-ordered into BP-wide blocks (BP=32: fine enough
    to cull, wide enough to amortize merges); a strictly binary BVH
    (accel.build_bvh2) is built over the BLOCK AABBs;
  - each (8,128)-ray tile traverses with a per-tile SMEM node stack,
    slab-testing both children at native (8,128) layout and visiting
    the NEARER child first (one scalar vote across live lanes) -- the
    TPU analog of the reference's interval-narrowed recursion
    (Bih.hs:332-368, Mesh.hs:172-196); near-first order lets the
    running best-t prune far subtrees, which a skip-link DFS cannot;
  - a visited leaf block is tested DENSE against one ray lane-row at a
    time: prim fields as (BP,1) sublane columns against the (1,128)
    ray row -> (BP,128) candidates, reduced over sublanes back to
    (1,128) -- no (1024,1) value anywhere;
  - per-prim inverse transforms (Instance groups, Solid.hs:388-403)
    ride the block rows; simple CSG clause constraints (e.g. the
    lattice-minus-sphere "not inside B" test, Csg.hs:33-54) are
    evaluated per candidate in the same dense layout from SMEM scalars;
  - winners carry an entry/exit slot bit, so the differentiable
    finalize (megakernel.finalize) re-evaluates them exactly like any
    other megakernel winner.

Like every select kernel in this engine, this only SELECTS (t, winner);
gradients flow through the finalize re-evaluation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import INFINITY
from .pallas_kernels import FIELDS, _T_KERNELS, _inside_comp
from . import accel as A

INF = INFINITY

RT = 1024          # rays per tile: one (8, 128) vreg block
# prims per block (sublane columns in the dense test): the bp sweep
# (tools/profile_bp_sweep.py) measured 8 beating 32 ~2x and 128 ~5x on
# both coherent and shadow batches -- culling granularity dominates
BP = 8


# the select table only carries the fields the t-kernel reads:
# trianglenorm's n1..n3 are finalize's job (_T_KERNELS["trianglenorm"]
# is _triangle_t, distances from p1..p3 only), and dropping them halves
# a 100k-tri mesh's VMEM-resident table (7.2 -> 3.6 MB)
SELECT_FIELDS = dict(FIELDS)
SELECT_FIELDS["trianglenorm"] = FIELDS["triangle"]


def _field_width(ptype):
    return sum(w for _, w in SELECT_FIELDS[ptype])


def morton_order(centers: np.ndarray) -> np.ndarray:
    """Sort order by 30-bit Morton code of quantized centers."""
    c = np.asarray(centers, np.float64)
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.clip(((c - lo) / span * 1023.0).astype(np.int64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))
    return np.argsort(code, kind="stable").astype(np.int32)


class BlockPlan:
    """Host-side static plan for one group: Morton blocks + binary
    block BVH + constraint member tables."""

    def __init__(self, g, sc=None, bp: int = BP):
        P = g.size
        self.ptype = g.ptype
        self.bp = bp
        self.transformed = g.m_inv is not None
        F = _field_width(g.ptype) + (12 if self.transformed else 0)
        self.F = F
        bmin, bmax = A.group_bounds(g)
        # packed group rows are already Morton-ordered (compile
        # _morton_sort / mesh packing), so consecutive bp-runs of
        # PACKED rows are spatially compact blocks and the table needs
        # no permutation: the kernel's winner row IS the group-local
        # prim index (mod padding), and block_pass skips a (N,)-wide
        # remap gather (measured 15 ms/frame at 1080p)
        self.n_blocks = (P + bp - 1) // bp
        padP = self.n_blocks * bp - P
        # pad by replicating the last prim: real geometry, so padded
        # lanes can win only with a result identical to the prim they
        # duplicate (never a phantom hit, unlike zero rows)
        if padP:
            bmin = np.concatenate([bmin, np.repeat(bmin[-1:], padP, 0)])
            bmax = np.concatenate([bmax, np.repeat(bmax[-1:], padP, 0)])
        blk_min = bmin.reshape(self.n_blocks, bp, 3).min(axis=1)
        blk_max = bmax.reshape(self.n_blocks, bp, 3).max(axis=1)
        bvh = A.build_bvh2(blk_min, blk_max, leaf_max=1)
        # leaf nodes point at ORIGINAL block ids (table unpermuted)
        ordb = np.asarray(bvh.order, np.int32)
        self.nf = np.concatenate(
            [np.asarray(bvh.bmin, np.float32),
             np.asarray(bvh.bmax, np.float32)], axis=1).reshape(-1)
        # per node: [left, right, leaf_block]; leaf_block = -1 for inner
        leaf_blk = np.where(
            bvh.leaf_count > 0,
            ordb[np.clip(bvh.leaf_start, 0, self.n_blocks - 1)], -1)
        self.ni = np.stack(
            [np.asarray(bvh.left, np.int32),
             np.asarray(bvh.right, np.int32),
             leaf_blk.astype(np.int32)], axis=1).reshape(-1)
        self.n_nodes = bvh.n_nodes
        self.depth = bvh.depth
        # constraints: [(positive, [(ptype, cf_off, M, Fm, has_inv)])]
        self.cons = []
        self.cons_spec = []   # [(gi2, idx, Fm)] pack spec
        self.cf_size = 1
        if getattr(g, "constraints", None) and sc is not None:
            off = 0
            for positive, members in g.constraints:
                ms = []
                for gi2, idx in members:
                    g2 = sc.groups[gi2]
                    has_inv = g2.m_inv is not None
                    Fm = _field_width(g2.ptype) + (12 if has_inv else 0)
                    M = len(idx)
                    if M == 0:
                        continue
                    ms.append((g2.ptype, off, M, Fm, has_inv))
                    self.cons_spec.append(
                        (gi2, np.asarray(idx, np.int32), Fm))
                    off += M * Fm
                self.cons.append((positive, ms))
            self.cf_size = max(off, 1)


# node tables live in SMEM: cap the block count so a 100k-prim group's
# BVH stays ~100 KB of SMEM (bp doubles from BP until it fits)
MAX_BLOCKS = 2048


def get_block_plan(g, sc=None, interpret: bool = False) -> BlockPlan:
    """Cached plan.  Interpret mode (CPU tests) uses ONE whole-group
    block: the traversal loop is python-speed there, but a single dense
    (P, 128) leaf test is ordinary vectorized XLA -- identical
    candidate math, no walk."""
    attr = "_gblock_plan_interp" if interpret else "_gblock_plan"
    plan = getattr(g, attr, None)
    if plan is None:
        if interpret:
            bp = (g.size + 7) // 8 * 8
        else:
            bp = BP
            while (g.size + bp - 1) // bp > MAX_BLOCKS:
                bp *= 2
        plan = BlockPlan(g, sc, bp=bp)
        setattr(g, attr, plan)
    return plan


def pack_blocks(plan: BlockPlan, params) -> jnp.ndarray:
    """(n_blocks, bp, F) f32 table in BVH leaf order -- prim fields
    read as (bp, 1) sublane columns (caller wraps in stop_gradient)."""
    cols = []
    for name, _w in SELECT_FIELDS[plan.ptype]:
        v = jnp.asarray(params[name])
        cols.append(v.reshape(v.shape[0], -1) if v.ndim > 1 else v[:, None])
    if plan.transformed:
        cols.append(jnp.asarray(params["m_inv"]).reshape(-1, 12))
    rows = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
    padP = plan.n_blocks * plan.bp - rows.shape[0]
    if padP:
        rows = jnp.concatenate([rows, jnp.repeat(rows[-1:], padP, 0)])
    return rows.reshape(plan.n_blocks, plan.bp, plan.F)


def pack_cons(plan: BlockPlan, sc, garrs) -> jnp.ndarray:
    """Flat SMEM f32 table of constraint member rows."""
    if not plan.cons_spec:
        return jnp.zeros((1,), jnp.float32)
    parts = []
    for gi2, idx, Fm in plan.cons_spec:
        g2 = sc.groups[gi2]
        ga = garrs[gi2]
        cols = []
        for name, _w in FIELDS[g2.ptype]:
            v = jnp.asarray(ga[name])
            cols.append(v.reshape(v.shape[0], -1) if v.ndim > 1
                        else v[:, None])
        if g2.m_inv is not None:
            cols.append(jnp.asarray(ga["m_inv"]).reshape(-1, 12))
        rows = jnp.concatenate(cols, axis=-1).astype(jnp.float32)[idx]
        parts.append(rows.reshape(-1))
    return jnp.concatenate(parts)


def block_select(plan: BlockPlan, tab, cf, o, d, seed_t,
                 shadow: bool = False,
                 interpret: Optional[bool] = None, rays6=None):
    """(t, sel2) nearest valid candidate of this group per ray.

    sel2 = row * 2 + slot (slot 0 entry / 1 exit), -1 where nothing
    beat seed_t.  Rows are group-local prim indices (padded rows
    duplicate the last prim; clamp)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bp = plan.bp
    if rays6 is not None:
        # plane-table path: rows [o*3, d*3] pass through, only the
        # seed row is (re)built -- no (N,3)-column transpose
        N = rays6.shape[1]
        assert N % RT == 0
        T = N // RT
        rays8 = jnp.concatenate(
            [rays6, seed_t[None], jnp.zeros_like(seed_t)[None]])
    else:
        N = o.shape[0]
        T = pl.cdiv(N, RT)
        pad = T * RT - N
        rays8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2],
                           seed_t, jnp.zeros_like(seed_t)])
        if pad:
            fill = jnp.zeros((8, pad), rays8.dtype).at[5].set(1.0)
            rays8 = jnp.concatenate([rays8, fill], axis=1)
    rays_t = rays8.reshape(8, T, 8, 128)

    tker = _T_KERNELS[plan.ptype]
    nfld = _field_width(plan.ptype)
    STACK = max(plan.depth + 2, 8)

    def kernel(rays_ref, nf_ref, ni_ref, tab_ref, cf_ref, out_t, out_s,
               stack_ref):
        def rc(c):
            return rays_ref[c, 0]                       # (8, 128)

        ox, oy, oz = rc(0), rc(1), rc(2)
        dx, dy, dz = rc(3), rc(4), rc(5)
        seed = rc(6)
        live = seed > 0.0
        ivx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        subp = jax.lax.broadcasted_iota(jnp.int32, (bp, 128), 0)

        def eval_cons(px, py, pz, valid):
            """Clause validity at dense candidate points (Csg.hs:92-101
            semantics), SMEM member scalars broadcast over (bp, 128)."""
            ok = valid
            for positive, ms in plan.cons:
                inn = jnp.zeros_like(valid)
                for (ptype2, off, M, Fm, has_inv) in ms:
                    for r in range(M):
                        base = off + r * Fm
                        nf2 = Fm - (12 if has_inv else 0)

                        def c(q, base=base):
                            return cf_ref[base + q]
                        if has_inv:
                            def mi(q, base=base, nf2=nf2):
                                return cf_ref[base + nf2 + q]
                            cx = mi(0)*px + mi(1)*py + mi(2)*pz + mi(3)
                            cy = mi(4)*px + mi(5)*py + mi(6)*pz + mi(7)
                            cz = mi(8)*px + mi(9)*py + mi(10)*pz + mi(11)
                        else:
                            cx, cy, cz = px, py, pz
                        inn = inn | _inside_comp(ptype2, c, cx, cy, cz)
                ok = ok & (inn == positive)
            return ok

        def slab(node):
            """(near, far) (8, 128) of a node's box."""
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
            return near, far

        def leaf_test(b, bt, bs):
            """Dense (bp, 128) test of table block b against each of
            the tile's 8 ray lane-rows."""
            blk = tab_ref[b]                      # (bp, F)

            def p(q):
                return blk[:, q:q + 1]            # (bp, 1)

            for r in range(8):
                oxr, oyr, ozr = ox[r:r+1], oy[r:r+1], oz[r:r+1]  # (1,128)
                dxr, dyr, dzr = dx[r:r+1], dy[r:r+1], dz[r:r+1]
                if plan.transformed:
                    def m(q):
                        return blk[:, nfld + q:nfld + q + 1]
                    pox = m(0)*oxr + m(1)*oyr + m(2)*ozr + m(3)
                    poy = m(4)*oxr + m(5)*oyr + m(6)*ozr + m(7)
                    poz = m(8)*oxr + m(9)*oyr + m(10)*ozr + m(11)
                    pdx = m(0)*dxr + m(1)*dyr + m(2)*dzr
                    pdy = m(4)*dxr + m(5)*dyr + m(6)*dzr
                    pdz = m(8)*dxr + m(9)*dyr + m(10)*dzr
                    ils = jax.lax.rsqrt(pdx*pdx + pdy*pdy + pdz*pdz)
                    t0, t1 = tker(p, pox, poy, poz,
                                  pdx * ils, pdy * ils, pdz * ils)
                    t0 = jnp.where(jnp.abs(t0) >= INF, t0, t0 * ils)
                    t1 = jnp.where(jnp.abs(t1) >= INF, t1, t1 * ils)
                else:
                    t0, t1 = tker(p, oxr, oyr, ozr, dxr, dyr, dzr)
                btr = bt[r:r+1]                               # (1,128)
                okr = live[r:r+1]
                if shadow:
                    okr = okr & (btr >= seed[r:r+1])
                v0 = okr & (t0 > 0.0) & (t0 < btr)
                v1 = okr & (t1 > 0.0) & (t1 < btr)
                if plan.cons:
                    for which in (0, 1):
                        tv = t0 if which == 0 else t1
                        vm = v0 if which == 0 else v1
                        okc = eval_cons(oxr + dxr * tv, oyr + dyr * tv,
                                        ozr + dzr * tv, vm)
                        if which == 0:
                            v0 = v0 & okc
                        else:
                            v1 = v1 & okc
                tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
                tmin = jnp.min(tc, axis=0, keepdims=True)     # (1,128)
                arg = jnp.argmin(tc, axis=0)[None].astype(jnp.int32)
                win = subp == arg
                slot = jnp.sum(jnp.where(win & v1 & ~v0, 1, 0),
                               axis=0, keepdims=True)
                better = tmin < btr
                selr = jnp.where(better, (arg + b * bp) * 2 + slot,
                                 bs[r:r+1])
                row = sub8 == r
                bt = jnp.where(row & better, tmin, bt)
                bs = jnp.where(row, selr, bs)
            return bt, bs

        def body(st):
            node, sp, bt, bs = st
            nib = node * 3
            leaf_blk = ni_ref[nib + 2]

            def do_leaf(args):
                bt, bs, sp = args
                bt, bs = leaf_test(leaf_blk, bt, bs)
                return jnp.int32(-1), sp, bt, bs

            def do_inner(args):
                bt, bs, sp = args
                left = ni_ref[nib]
                right = ni_ref[nib + 1]
                nL, fL = slab(left)
                nR, fR = slab(right)
                gate = live
                if shadow:
                    # any-hit: a blocked lane must stop pulling the
                    # tile through geometry nearer than its blocker
                    gate = gate & (bt >= seed)
                hL = (nL <= fL) & (fL > 0.0) & (nL < bt) & gate
                hR = (nR <= fR) & (fR > 0.0) & (nR < bt) & gate
                anyL = jnp.any(hL)
                anyR = jnp.any(hR)
                both = anyL & anyR
                l_first = jnp.sum(jnp.where(hL & hR, nR - nL, 0.0)) >= 0.0
                first = jnp.where(
                    both, jnp.where(l_first, left, right),
                    jnp.where(anyL, left, jnp.where(anyR, right, -1)))
                second = jnp.where(
                    both, jnp.where(l_first, right, left), jnp.int32(-1))

                @pl.when(second >= 0)
                def _():
                    stack_ref[sp] = second
                sp = jnp.where(second >= 0, sp + 1, sp)
                return first, sp, bt, bs

            node, sp, bt, bs = jax.lax.cond(
                leaf_blk >= 0, do_leaf, do_inner, (bt, bs, sp))

            if shadow:
                # any-hit early exit: drain once every live lane is
                # blocked (bt < seed)
                done = ~jnp.any(live & (bt >= seed))
                node = jnp.where(done, -1, node)
                sp = jnp.where(done, 0, sp)

            # pop on dead end
            do_pop = (node < 0) & (sp > 0)
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            node = jnp.where(do_pop, popped, node)
            sp = jnp.where(do_pop, sp - 1, sp)
            return node, sp, bt, bs

        bt = seed
        bs = jnp.full((8, 128), -1, jnp.int32)
        root = jnp.where(jnp.any(live), 0, -1).astype(jnp.int32)
        _, _, bt, bs = jax.lax.while_loop(
            lambda st: st[0] >= 0, body,
            (root, jnp.int32(0), bt, bs))
        out_t[0] = bt
        out_s[0] = jnp.where(bt < seed, bs, -1)

    in_specs = [
        pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    rdt = rays6.dtype if rays6 is not None else o.dtype
    out_shape = (jax.ShapeDtypeStruct((T, 8, 128), rdt),
                 jax.ShapeDtypeStruct((T, 8, 128), jnp.int32))
    blk = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out_specs = (blk, blk)
    # the resident table + streaming buffers can exceed the 16 MB
    # default scoped-vmem budget on big groups; raise the cap (the
    # compiler still errors if physical VMEM is exceeded)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20)
    bt, bs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
        **params,
    )(rays_t, jnp.asarray(plan.nf), jnp.asarray(plan.ni), tab, cf)
    return bt.reshape(-1)[:N], bs.reshape(-1)[:N]


def block_pass(sc, garrs, gi, o, d, seed_t, shadow: bool,
               interpret: Optional[bool] = None, rays6=None):
    """(t, local2): local2 = group-local prim * 2 + slot, -1 = none."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = sc.groups[gi]
    plan = get_block_plan(g, sc, interpret=interpret)
    sg = jax.lax.stop_gradient
    ga = {k: sg(jnp.asarray(v)) for k, v in garrs[gi].items()
          if k != "m_fwd"}
    tab = pack_blocks(plan, ga)
    cf = pack_cons(plan, sc, garrs)
    t, sel2 = block_select(plan, tab, sg(cf),
                           None if rays6 is not None else sg(o),
                           None if rays6 is not None else sg(d),
                           sg(seed_t), shadow=shadow,
                           interpret=interpret,
                           rays6=None if rays6 is None else sg(rays6))
    # table rows are group-local prim order (padded rows duplicate the
    # last prim): arithmetic map, no gather
    row = sel2 // 2
    local = jnp.minimum(jnp.maximum(row, 0), g.size - 1)
    local2 = local * 2 + sel2 % 2
    return t, jnp.where(sel2 >= 0, local2, -1)

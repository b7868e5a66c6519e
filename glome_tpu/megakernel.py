"""One-launch Pallas scene-intersection megakernel.

Round-1 profiling showed the pass-per-group intersect pipeline
(intersect.py) spends most of a frame on launch overhead, HBM ray
round-trips and per-pass finalize gathers: a full TestScene intersect
was ~104 ms while the measurable kernels inside it summed to ~25 ms.
This module replaces the whole per-scene pipeline with ONE pallas_call:

  - every primitive group, convex CSG object and deferred CSG prim of
    every compiled scene becomes a *phase* inside a single kernel;
  - all scene data (prim params, inverse matrices, BVH node tables,
    constraint tables) lives in SMEM as flat scalar tables (~300 KB for
    TestScene; the chip accepts ~1 MB);
  - the grid walks (8, 128)-ray tiles; each phase tests the whole tile
    against its prims with per-tile culling (phase AABB slab test, BVH
    root test, candidate guards) so a tile pays only for the scene
    regions its beam can see;
  - the running best (t, winner) carries ACROSS phases, so every later
    phase culls against the best distance found by earlier ones --
    exactly the seeding the old serial passes did, without ever leaving
    the chip;
  - rays carry a scene id, so portal-frame / portal-target rays ride
    the same launch (the old intersect_multi ran the full pipeline once
    per compiled scene for every ray of every bounce level);
  - shadow mode is a static variant with any-hit semantics and
    early-exit guards on every phase.

Like the round-1 kernels, the megakernel only SELECTS a winner: it
returns (t, wid) where wid = global_prim_index * 2 + slot (slot 0 =
entry crossing, 1 = exit).  `finalize` then re-evaluates the winning
candidate differentiably (normals, object-space rays, texture/tag
stacks, CSG retexture), keeping the renderer differentiable end to end.

Deferred CSG validity scans (e.g. "is this lattice-minus-sphere exit
point inside any lattice sphere", Csg.hs:33-54) are restricted at plan
time to the clause members whose solids can contain points on the
candidate prim's surface -- exact for sphere-shell-vs-sphere -- which
shrinks TestScene's 2786-member scans ~10x and makes them
per-tile-skippable.

Reference semantics mirrored: nearest-hit per prim (each rayint_* in
GlomeTrace), CSG clause validity (Csg.hs:33-101), instance transforms
(Solid.hs:388-403), shadow flags (Tex.hs:81-96), BIH-style traversal
(Bih.hs:332-368) as per-tile skip-link loops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import DELTA, INFINITY
from .pallas_kernels import FIELDS, _T_KERNELS, _inside_comp, prim_aabb
from . import accel as A

INF = INFINITY

# groups larger than this get an in-kernel skip-link BVH (transformed
# groups included: leaf tests read the inverse matrix from SMEM
# scalars, so there is no per-prim gather penalty like the jnp path)
DENSE_MAX = 96

# plain flat-prim groups larger than this (e.g. 100k-triangle meshes)
# can't live in the megakernel's SMEM scalar tables (100k tris x 9
# floats = 3.6 MB vs ~1 MB SMEM); they route to the block-dense kernel
# (whole table VMEM-resident, ordered block-BVH walk) while the table
# fits BLOCK_VMEM_MAX, else to the HBM-DMA mesh kernel
# (mesh_kernel.py).  Flat prims only: their exit slot is always a
# miss, so the merged winner id needs no slot bit from the kernel.
MEGA_EXT_MIN = 16384

# param-table budget for keeping a big group VMEM-resident in the
# block kernel (chip VMEM ~16 MB; rays + outputs + double buffers need
# the rest)
BLOCK_VMEM_MAX = 8 * 2**20

# groups larger than this route to the block-dense kernel
# (block_kernel.py) as a separate seeded launch.  A/B on the real L0
# batches (tools/profile_shadow_ab.py) measured the in-kernel per-prim
# 'bvh' phases FASTER than block-dense at every block size tried
# (culling granularity beats dense VPU utilization on this scene), so
# the threshold sits at the SMEM ceiling: groups whose scalar tables
# cannot live in the megakernel's SMEM must stream as blocks.
BLOCK_MIN = MEGA_EXT_MIN

# block-eligible constraint sets: every clause member inlined as SMEM
# scalars, evaluated per dense candidate -- cheap only when tiny
BLOCK_CONS_MAX = 8

RT = 1024  # rays per tile: one (8, 128) vreg block

# In-kernel BVH phases traverse near-child-first with a per-tile SMEM
# stack over a strictly binary tree (accel.build_bvh2) instead of the
# fixed-order skip-link DFS.  The host traversal simulator
# (tools/sim_traversal.py) measured the ordered walk visiting ~2x
# fewer nodes per tile on real L0 shadow batches, and the per-node
# cost is dominated by the scalar/vector sync of the any()-reductions
# (~0.3 us/step measured vs ~30 ns of vector math), so halving steps
# halves the dominant launches.  The ordered walk also tests BOTH
# children per sync.  GLOME_ORDERED=0 falls back to skip-link.
import os as _os
ORDERED_BVH = _os.environ.get("GLOME_ORDERED", "1") != "0"

# bvh2 leaf width: the per-node scalar sync (~0.28 us) dwarfs a prim
# test's vector work (~0.12 us), so wider leaves trade cheap vector
# tests for fewer syncs
BVH2_LEAF = int(_os.environ.get("GLOME_BVH2_LEAF", "16"))

# K-wide frontier walk (round 4): the ordered per-node walk pays one
# scalar/vector drain PER NODE (~150-180 ns measured,
# tools/micro_kwide.py) while the slab math is ~30 ns.  Popping K
# frontier nodes per iteration, issuing all K slab tests + K
# any-reductions back-to-back and reading the K votes after ONE drain
# amortizes the sync: measured 180 -> 30 ns/node at K=8 on the same
# walk.  Near-first ordering is given up (pops are frontier-order),
# but per-lane best-t culling still applies at pop time, and for
# shadow (any-hit, half the frame) ordering never mattered.
# GLOME_KWIDE=0 falls back to the ordered bvh2 walk.
KWIDE = _os.environ.get("GLOME_KWIDE", "1") != "0"
KWIDE_K = int(_os.environ.get("GLOME_KWIDE_K", "8"))
# A/B instrumentation knobs (dev only; wrong images when set)
_KW_NOLEAF = _os.environ.get("GLOME_KWIDE_NOLEAF", "0") == "1"
# Negative result (round 5): dynamic-trip leaf loops (fori_loop(0, lc))
# measured 40.8 vs 34.3 ms/frame -- the scalar bound check serializes
# against the vector pipeline, costing far more than the ~31% padded
# leaf tests it avoids.  Keep the fixed-width unroll.
_KW_DYNLEAF = _os.environ.get("GLOME_KWIDE_DYNLEAF", "0") == "1"
_KW_NOEXIT = _os.environ.get("GLOME_KWIDE_NOEXIT", "0") == "1"
_KW_NOPUSH = _os.environ.get("GLOME_KWIDE_NOPUSH", "0") == "1"


def _field_width(ptype):
    return sum(w for _, w in FIELDS[ptype])


# --- static plan ------------------------------------------------------------

@dataclasses.dataclass
class ConsMember:
    ptype: str
    pf_base: int
    F: int          # floats per row (fields [+ 12 inverse])
    M: int
    has_inv: bool
    pi_base: int = -1   # PI rows: [global prim id, clause ordinal]
    # big member sets get their own skip-link BVH for point queries
    # (rows stored in leaf order); n_nodes == 0 -> linear scan
    nf_base: int = 0
    ni_base: int = 0
    n_nodes: int = 0


# constraint member sets above this size get a point-query BVH
CONS_BVH_MIN = 48


@dataclasses.dataclass
class Phase:
    kind: str          # 'dense' | 'bvh' | 'bvh2' | 'convex' | 'deferred'
    si: int
    gi: int = -1
    ptype: str = ""
    transformed: bool = False
    P: int = 0
    pf_base: int = 0
    F: int = 0
    pi_base: int = 0
    cons: Optional[list] = None    # [(positive, [ConsMember])]
    vis: Tuple[bool, bool] = (True, True)   # static (primary, shadow)
    vis_mixed: bool = False        # per-prim flags live in PI when True
    bb_idx: int = -1               # dense-phase AABB row in BB
    # bvh / bvh2
    nf_base: int = 0
    ni_base: int = 0
    n_nodes: int = 0
    depth: int = 0                 # bvh2 stack bound
    # convex csg: [(ptype, pf_off, F, has_inv, gprim)]
    members: Optional[list] = None
    # deferred prim
    gprim: int = -1
    neg: bool = False
    own: Optional[List[ConsMember]] = None
    # sibling DNF regions (non-conjunctive CSG): candidates strictly
    # inside any region are union-interior, not boundary.  Each region
    # is a clause list in eval_cons form: [(sign, [ConsMember])]
    regions: Optional[list] = None
    # index into `cons` of the difference's A clause when this prim is
    # a difference-B surface with useatex (retexture, Csg.hs:39-41):
    # the kernel tracks the first containing A member during the
    # validity scan and returns it as the aux output
    atex_clause: int = -1


@dataclasses.dataclass
class MegaPlan:
    phases: List[Phase]
    pf_spec: List[tuple]           # instructions to assemble PF from arrays
    pf_size: int
    pi: np.ndarray                 # flat int32 [gprim, flags] per prim row
    nf: np.ndarray                 # flat node floats (bmin, bmax)
    ni: np.ndarray                 # flat node ints (skip, leaf_start, count)
    bb_spec: List[tuple]           # [(si, gi)] rows of the BB table
    prim_base: Dict[Tuple[int, int], Tuple[int, int]]  # (si,gi)->(base,size)
    n_prims: int
    n_scenes: int
    tex_all: np.ndarray            # (Ptot, TEX_DEPTH) int32
    tag_all: np.ndarray
    serial_all: np.ndarray         # (Ptot,) int32
    neg_all: np.ndarray            # (Ptot,) bool
    csg_all: np.ndarray            # (Ptot,) int32 csg id within its scene
    scene_of: np.ndarray           # (Ptot,) int32
    # per-prim LOCAL texture/tag stacks (below the enclosing CSG node)
    # and the useatex flag, for difference-B retexture via kernel aux
    ltex_all: np.ndarray
    ltag_all: np.ndarray
    atex_all: np.ndarray           # (Ptot,) bool
    # (si, gi) groups whose winners need differentiable object-space
    # rays (their prims carry Warp-reachable textures)
    warp_groups: frozenset
    # finalize combos: all groups of one (ptype, transformed) pair are
    # re-evaluated in ONE gather+eval pass over concatenated params
    combos: List[tuple] = dataclasses.field(default_factory=list)
    # per-global-prim combo id / row within the combo's concat tables
    cid_all: np.ndarray = None
    row_all: np.ndarray = None
    # oversized flat-prim groups served by a separate VMEM-streamed
    # dense launch instead of SMEM phases (see MEGA_EXT_MIN)
    external: List[Tuple[int, int]] = dataclasses.field(
        default_factory=list)
    # big groups served by the block-dense kernel (see BLOCK_MIN)
    blocks: List[Tuple[int, int]] = dataclasses.field(
        default_factory=list)


def _aabb_overlap(a, b, eps=1e-6):
    return bool(np.all(a[0] - eps <= b[1]) and np.all(b[0] - eps <= a[1]))


def _restrict_members(sc, bounds_cache, members, prim_bb, prim_group,
                      prim_li):
    """Clause members whose solids can contain a point on the candidate
    prim's surface: AABB overlap, refined exactly for sphere-vs-sphere
    (a member sphere can touch the shell of the candidate sphere iff
    | |c-C| - R | <= r)."""
    g_p = sc.groups[prim_group]
    sphere_prim = (g_p.ptype == "sphere" and g_p.m_inv is None)
    if sphere_prim:
        C = np.asarray(g_p.params["center"][prim_li], np.float64)
        R = float(np.asarray(g_p.params["radius"][prim_li]))
    out = []
    for gi, idx in members:
        g = sc.groups[gi]
        if gi not in bounds_cache:
            bounds_cache[gi] = A.group_bounds(g)
        bmin, bmax = bounds_cache[gi]
        idx = np.asarray(idx)
        sel = np.array([_aabb_overlap((bmin[li], bmax[li]), prim_bb)
                        for li in idx], dtype=bool)
        if sphere_prim and g.ptype == "sphere" and g.m_inv is None:
            c = np.asarray(g.params["center"], np.float64)[idx]
            r = np.asarray(g.params["radius"], np.float64)[idx]
            # slack covers the delta-nudged sample points (exit checks
            # and DNF region flip tests probe p +- DELTA*d)
            shell = (np.abs(np.linalg.norm(c - C, axis=-1) - R)
                     <= r + 2 * DELTA + 1e-6)
            sel = sel & shell
        keep = idx[sel].astype(np.int32)
        if len(keep):
            out.append((gi, keep))
    return out


def build_plan(compiled) -> MegaPlan:
    """Flatten a CompiledScene into the megakernel's static plan."""
    from .compile import TEX_DEPTH, TAG_DEPTH

    pf_spec: List[tuple] = []
    pf_off = 0
    pi_rows: List[np.ndarray] = []
    pi_off = 0
    nf_parts: List[np.ndarray] = []
    ni_parts: List[np.ndarray] = []
    nf_off = ni_off = 0
    bb_spec: List[tuple] = []
    phases: List[Phase] = []
    external: List[Tuple[int, int]] = []
    blocks: List[Tuple[int, int]] = []
    prim_base: Dict[Tuple[int, int], Tuple[int, int]] = {}
    tex_all, tag_all, ser_all, neg_all, csg_all, sc_of = [], [], [], [], [], []
    ltex_all, ltag_all, atex_all = [], [], []
    warp_groups = set()
    group_meta: Dict[Tuple[int, int], Tuple[int, int, int]] = {}

    warp_tids = {tid for tid, ws in enumerate(compiled.tex_warps) if ws}

    # ---- global static per-prim tables ------------------------------------
    nbase = 0
    for si, sc in enumerate(compiled.scenes):
        for gi, g in enumerate(sc.groups):
            prim_base[(si, gi)] = (nbase, g.size)
            tex_all.append(g.tex_stack)
            tag_all.append(g.tag_stack)
            ser_all.append(g.prim_serial)
            csg_all.append(g.csg_id)
            sc_of.append(np.full(g.size, si, np.int32))
            ltex_all.append(g.local_tex_stack)
            ltag_all.append(g.local_tag_stack)
            neg = np.zeros(g.size, bool)
            atex = np.zeros(g.size, bool)
            for li in range(g.size):
                cid = int(g.csg_id[li])
                if cid >= 0:
                    csg = sc.csgs[cid]
                    neg[li] = not csg.clauses[int(g.csg_clause[li])].positive
                    atex[li] = neg[li] and csg.useatex
            neg_all.append(neg)
            atex_all.append(atex)
            if any(int(t) in warp_tids for t in np.unique(g.tex_stack)
                   if int(t) >= 0):
                warp_groups.add((si, gi))
            nbase += g.size

    def add_group_pf(si, gi, g, perm):
        """Emit a group's params (in `perm` order) into PF and its
        [gprim, visflags] rows into PI; returns (pf_base, F, pi_base)."""
        nonlocal pf_off, pi_off
        F = _field_width(g.ptype) + (12 if g.m_inv is not None else 0)
        base = pf_off
        pf_spec.append((si, gi,
                        None if perm is None else np.asarray(perm, np.int32),
                        F))
        pf_off += g.size * F
        flags = ((~g.onlyshadow).astype(np.int32)
                 + 2 * (~g.noshadow).astype(np.int32))
        order = (np.arange(g.size, dtype=np.int32) if perm is None
                 else np.asarray(perm, np.int32))
        gprim = prim_base[(si, gi)][0] + order
        pi_rows.append(np.stack([gprim, flags[order]], axis=1)
                       .reshape(-1).astype(np.int32))
        pib = pi_off
        pi_off += 2 * g.size
        group_meta[(si, gi)] = (base, F, pib)
        return base, F, pib

    def add_rows_pf(si, gi, g, idx, ords, bounds) -> ConsMember:
        """Copy selected prim rows (constraint member sets) into PF,
        their [global prim id, clause ordinal] into PI, and -- for big
        sets -- a point-query BVH into NF/NI (rows in leaf order)."""
        nonlocal pf_off, pi_off, nf_off, ni_off
        idx = np.asarray(idx, np.int32)
        ords = np.asarray(ords, np.int32)
        nfb = nib = nnodes = 0
        if (len(idx) > CONS_BVH_MIN and g.ptype != "plane"
                and bounds is not None):
            bvh = A.build_bvh(bounds[0][idx], bounds[1][idx])
            idx = idx[bvh.order]
            ords = ords[bvh.order]
            nfb, nib = nf_off, ni_off
            nf_parts.append(np.concatenate(
                [np.asarray(bvh.bmin, np.float32),
                 np.asarray(bvh.bmax, np.float32)], axis=1).reshape(-1))
            ni_parts.append(np.stack(
                [np.asarray(bvh.skip, np.int32),
                 np.asarray(bvh.leaf_start, np.int32),
                 np.asarray(bvh.leaf_count, np.int32)],
                axis=1).reshape(-1))
            nf_off += nf_parts[-1].shape[0]
            ni_off += ni_parts[-1].shape[0]
            nnodes = bvh.n_nodes
        F = _field_width(g.ptype) + (12 if g.m_inv is not None else 0)
        base = pf_off
        pf_spec.append((si, gi, idx, F))
        pf_off += len(idx) * F
        gprim = prim_base[(si, gi)][0] + idx
        pi_rows.append(np.stack([gprim, ords], axis=1)
                       .reshape(-1).astype(np.int32))
        pib = pi_off
        pi_off += 2 * len(idx)
        return ConsMember(g.ptype, base, F, len(idx), g.m_inv is not None,
                          pi_base=pib, nf_base=nfb, ni_base=nib,
                          n_nodes=nnodes)

    # ---- phases ------------------------------------------------------------
    for si, sc in enumerate(compiled.scenes):
        bounds_cache: Dict[int, tuple] = {}

        def cons_members(members):
            out = []
            ord0 = 0
            for gi2, idx in members:
                if not len(idx):
                    continue
                if gi2 not in bounds_cache:
                    bounds_cache[gi2] = A.group_bounds(sc.groups[gi2])
                out.append(add_rows_pf(
                    si, gi2, sc.groups[gi2], idx,
                    ord0 + np.arange(len(idx)), bounds_cache[gi2]))
                ord0 += len(idx)
            return out

        deferred_phases: List[Phase] = []
        for gi, g in enumerate(sc.groups):
            if g.size == 0 or g.vclass == "convex":
                continue
            vis = (not bool(g.onlyshadow.all()), not bool(g.noshadow.all()))
            vis_mixed = (bool(g.onlyshadow.any()) != bool(g.onlyshadow.all())
                         or bool(g.noshadow.any()) != bool(g.noshadow.all()))
            if g.vclass == "deferred":
                base, F, _ = add_group_pf(si, gi, g, None)
                if gi not in bounds_cache:
                    bounds_cache[gi] = A.group_bounds(g)
                bmin, bmax = bounds_cache[gi]
                for li in range(g.size):
                    cid = int(g.csg_id[li])
                    own_ci = int(g.csg_clause[li])
                    csg = sc.csgs[cid]
                    neg = not csg.clauses[own_ci].positive
                    cons = []
                    atex_clause = -1
                    for ci, clause in enumerate(csg.clauses):
                        if ci == own_ci or not clause.members:
                            continue
                        mm = _restrict_members(sc, bounds_cache,
                                               clause.members,
                                               (bmin[li], bmax[li]), gi, li)
                        if (neg and csg.useatex and clause.positive
                                and ci == 0):
                            atex_clause = len(cons)
                        cons.append((clause.positive, cons_members(mm)))
                    own = (cons_members(csg.clauses[own_ci].members)
                           if neg else None)
                    regions = None
                    if csg.excl:
                        # region list = [own conjunction] + siblings,
                        # restricted against the prim's delta-inflated
                        # bbox (the flip test samples p +- DELTA*d)
                        infl = (bmin[li] - 2 * DELTA, bmax[li] + 2 * DELTA)
                        regions = []
                        for reg in [csg.clauses] + list(csg.excl):
                            entries = []
                            for clause in reg:
                                mm = _restrict_members(
                                    sc, bounds_cache, clause.members,
                                    infl, gi, li)
                                entries.append((clause.positive,
                                                cons_members(mm)))
                            regions.append(entries)
                    deferred_phases.append(Phase(
                        "deferred", si, gi=gi, ptype=g.ptype,
                        transformed=g.m_inv is not None,
                        pf_base=base + li * F, F=F,
                        gprim=prim_base[(si, gi)][0] + li,
                        neg=neg, cons=cons, own=own, regions=regions,
                        atex_clause=atex_clause,
                        vis=(not bool(g.onlyshadow[li]),
                             not bool(g.noshadow[li]))))
                continue
            if (g.vclass == "plain" and not g.constraints
                    and g.m_inv is None
                    and g.ptype in ("triangle", "trianglenorm")
                    and g.size > MEGA_EXT_MIN):
                # block kernel packs the select-only field set (9
                # floats for flat tris, normals are finalize's job)
                from .block_kernel import _field_width as _sel_width
                if g.size * _sel_width(g.ptype) * 4 > BLOCK_VMEM_MAX:
                    external.append((si, gi))
                    continue
            cons_rows = sum(len(idx) for _pos, members in
                            (g.constraints or []) for _gi2, idx in members)
            if (g.size > BLOCK_MIN and g.ptype != "plane"
                    and not vis_mixed and cons_rows <= BLOCK_CONS_MAX):
                blocks.append((si, gi))
                continue
            # plain / inline groups: dense or in-kernel BVH
            use_bvh = g.size > DENSE_MAX and g.ptype != "plane"
            perm = None
            bvh = None
            if use_bvh:
                if ORDERED_BVH:
                    if gi not in bounds_cache:
                        bounds_cache[gi] = A.group_bounds(g)
                    bvh = A.build_bvh2(*bounds_cache[gi],
                                      leaf_max=BVH2_LEAF)
                else:
                    bvh = g.accel
                    if bvh is None:
                        if gi not in bounds_cache:
                            bounds_cache[gi] = A.group_bounds(g)
                        bvh = A.build_bvh(*bounds_cache[gi])
                perm = np.asarray(bvh.order, np.int32)
            base, F, pib = add_group_pf(si, gi, g, perm)
            cons = None
            if g.constraints:
                cons = [(pos, cons_members(members))
                        for pos, members in g.constraints]
            if use_bvh:
                nfb, nib = nf_off, ni_off
                nf_parts.append(np.concatenate(
                    [np.asarray(bvh.bmin, np.float32),
                     np.asarray(bvh.bmax, np.float32)], axis=1).reshape(-1))
                if ORDERED_BVH:
                    ni_parts.append(np.stack(
                        [np.asarray(bvh.left, np.int32),
                         np.asarray(bvh.right, np.int32),
                         np.asarray(bvh.leaf_start, np.int32),
                         np.asarray(bvh.leaf_count, np.int32)],
                        axis=1).reshape(-1))
                else:
                    ni_parts.append(np.stack(
                        [np.asarray(bvh.skip, np.int32),
                         np.asarray(bvh.leaf_start, np.int32),
                         np.asarray(bvh.leaf_count, np.int32)],
                        axis=1).reshape(-1))
                nf_off += nf_parts[-1].shape[0]
                ni_off += ni_parts[-1].shape[0]
                phases.append(Phase(
                    "bvh2" if ORDERED_BVH else "bvh", si, gi=gi,
                    ptype=g.ptype,
                    transformed=g.m_inv is not None, P=g.size,
                    pf_base=base, F=F, pi_base=pib, cons=cons,
                    vis=vis, vis_mixed=vis_mixed,
                    nf_base=nfb, ni_base=nib, n_nodes=bvh.n_nodes,
                    depth=getattr(bvh, "depth", 0)))
            else:
                bb_idx = -1
                if g.ptype != "plane":
                    bb_idx = len(bb_spec)
                    bb_spec.append((si, gi))
                phases.append(Phase(
                    "dense", si, gi=gi, ptype=g.ptype,
                    transformed=g.m_inv is not None, P=g.size,
                    pf_base=base, F=F, pi_base=pib, cons=cons,
                    vis=vis, vis_mixed=vis_mixed, bb_idx=bb_idx))

        # convex CSG objects: direct interval intersection
        for cid, csg in enumerate(sc.csgs):
            if not csg.convex:
                continue
            members = []
            vis = (True, True)
            for clause in csg.clauses:
                for gi, idx in clause.members:
                    g = sc.groups[gi]
                    if (si, gi) not in group_meta:
                        add_group_pf(si, gi, g, None)
                    base, F, _ = group_meta[(si, gi)]
                    for li in np.asarray(idx):
                        li = int(li)
                        members.append((g.ptype, base + li * F, F,
                                        g.m_inv is not None,
                                        prim_base[(si, gi)][0] + li))
                        vis = (vis[0] and not bool(g.onlyshadow[li]),
                               vis[1] and not bool(g.noshadow[li]))
            phases.append(Phase("convex", si, members=members, vis=vis))

        phases.extend(deferred_phases)

    # finalize combos: groups keyed by (ptype, transformed); all their
    # params live in ONE padded (Ptot, F_max) table so finalize pays a
    # single row gather (TPU gathers cost ~2 ms per (345k,) lookup --
    # the round-1 pipeline's ~25 of them were most of its finalize cost)
    combo_ix: Dict[Tuple[str, bool], int] = {}
    combos: List[tuple] = []  # (ptype, transformed, [(si, gi)], warp_any)
    cid_all = np.full(nbase, -1, np.int32)
    row_all = np.zeros(nbase, np.int32)
    for si, sc in enumerate(compiled.scenes):
        for gi, g in enumerate(sc.groups):
            if g.size == 0:
                continue
            key = (g.ptype, g.m_inv is not None)
            if key not in combo_ix:
                combo_ix[key] = len(combos)
                combos.append((key[0], key[1], [], False))
            k = combo_ix[key]
            ptype, tr, glist, warp_any = combos[k]
            base = prim_base[(si, gi)][0]
            row0 = sum(prim_base[(s2, g2)][1] for (s2, g2) in glist)
            cid_all[base:base + g.size] = k
            row_all[base:base + g.size] = row0 + np.arange(g.size)
            glist.append((si, gi))
            combos[k] = (ptype, tr, glist,
                         warp_any or ((si, gi) in warp_groups))
    # rebase rows into the single concatenated finalize table
    combo_base = {}
    acc = 0
    for k, (_pt, _tr, glist, _w) in enumerate(combos):
        combo_base[k] = acc
        acc += sum(prim_base[sg_][1] for sg_ in glist)
    for si, sc in enumerate(compiled.scenes):
        for gi, g in enumerate(sc.groups):
            if g.size == 0:
                continue
            base = prim_base[(si, gi)][0]
            row_all[base:base + g.size] += combo_base[
                int(cid_all[base])]

    return MegaPlan(
        phases=phases, pf_spec=pf_spec, pf_size=max(pf_off, 1),
        pi=(np.concatenate(pi_rows) if pi_rows else np.zeros(2, np.int32)),
        nf=(np.concatenate(nf_parts) if nf_parts
            else np.zeros(1, np.float32)),
        ni=(np.concatenate(ni_parts) if ni_parts
            else np.zeros(1, np.int32)),
        bb_spec=bb_spec, prim_base=prim_base, n_prims=nbase,
        n_scenes=len(compiled.scenes),
        tex_all=(np.concatenate(tex_all) if tex_all
                 else np.zeros((0, TEX_DEPTH), np.int32)),
        tag_all=(np.concatenate(tag_all) if tag_all
                 else np.zeros((0, TAG_DEPTH), np.int32)),
        serial_all=(np.concatenate(ser_all) if ser_all
                    else np.zeros(0, np.int32)),
        neg_all=(np.concatenate(neg_all) if neg_all
                 else np.zeros(0, bool)),
        csg_all=(np.concatenate(csg_all) if csg_all
                 else np.zeros(0, np.int32)),
        scene_of=(np.concatenate(sc_of) if sc_of
                  else np.zeros(0, np.int32)),
        ltex_all=(np.concatenate(ltex_all) if ltex_all
                  else np.zeros((0, TEX_DEPTH), np.int32)),
        ltag_all=(np.concatenate(ltag_all) if ltag_all
                  else np.zeros((0, TAG_DEPTH), np.int32)),
        atex_all=(np.concatenate(atex_all) if atex_all
                  else np.zeros(0, bool)),
        warp_groups=frozenset(warp_groups),
        combos=combos, cid_all=cid_all, row_all=row_all,
        external=external, blocks=blocks)


def get_plan(compiled) -> MegaPlan:
    plan = getattr(compiled, "_mega_plan", None)
    if plan is None:
        plan = build_plan(compiled)
        compiled._mega_plan = plan
    return plan


# --- table packing (inside jit; params flow from the arrays pytree) --------

def pack_tables(plan: MegaPlan, compiled, arrays):
    """(PF, BB) device tables.  The kernel only selects (winners are
    re-evaluated differentiably by finalize), so tables are built under
    stop_gradient."""
    from .compile import group_device_params
    sg = jax.lax.stop_gradient
    parts = []
    for si, gi, idx, F in plan.pf_spec:
        g = compiled.scenes[si].groups[gi]
        ga = {k: sg(jnp.asarray(v)) for k, v in
              group_device_params(g, arrays["scenes"][si][gi]).items()}
        cols = []
        for name, _w in FIELDS[g.ptype]:
            v = ga[name]
            cols.append(v.reshape(v.shape[0], -1) if v.ndim > 1
                        else v[:, None])
        if g.m_inv is not None:
            cols.append(ga["m_inv"].reshape(-1, 12))
        rows = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
        if idx is not None:
            rows = rows[idx]
        parts.append(rows.reshape(-1))
    pf = (jnp.concatenate(parts) if parts else jnp.zeros(1, jnp.float32))

    bb_rows = []
    for si, gi in plan.bb_spec:
        g = compiled.scenes[si].groups[gi]
        ga = {k: sg(jnp.asarray(v)) for k, v in
              group_device_params(g, arrays["scenes"][si][gi]).items()}
        ab = prim_aabb(g.ptype,
                       {k: v for k, v in ga.items()
                        if k not in ("m_inv", "m_fwd")}, ga.get("m_fwd"))
        bb_rows.append(jnp.concatenate(
            [ab[0].min(axis=0), ab[1].max(axis=0),
             jnp.zeros(2, jnp.float32)]))
    bb = (jnp.stack(bb_rows) if bb_rows else jnp.zeros((1, 8), jnp.float32))
    return pf, bb


# --- the kernel -------------------------------------------------------------

def mega_select(plan: MegaPlan, pf, bb, o=None, d=None, seed_t=None,
                sid=None, shadow: bool = False,
                interpret: Optional[bool] = None, scene_id: int = 0,
                rays=None, multi: Optional[bool] = None):
    """Single-launch nearest-valid-candidate selection.

    o, d: (N, 3); seed_t: (N,) start best (min(tmax, INFINITY)); sid:
    (N,) int32 per-ray scene id or None (all rays in `scene_id`).
    Alternatively `rays` is a prebuilt (8, N) component-plane table
    [ox,oy,oz,dx,dy,dz,seed,sid] (N a multiple of 1024; dead lanes
    seed 0) -- the layout-friendly path: callers that already hold
    component planes skip the (N,3)-column transpose here.  With
    `rays`, pass multi=True when row 7 carries per-ray scene ids.
    Returns (t, wid) with t == seed where nothing nearer and wid == -1
    on miss, else wid = global_prim * 2 + slot.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    vi = 1 if shadow else 0
    if rays is not None and rays.ndim == 4:
        # tile-major native table (T, 8, 8, 128): channel c of tile t
        # at rays[t, c] -- what the wavefront queue builder produces
        # with one whole-tile gather per segment (the (8, N) row form
        # cost ~16 per-component gathers + a relayout per launch)
        T = rays.shape[0]
        N = T * RT
        rays_t = rays
        tile_major = True
    elif rays is not None:
        N = rays.shape[1]
        assert N % RT == 0
        T = N // RT
        rays_t = rays.reshape(8, T, 8, 128)
        tile_major = False
    else:
        multi = sid is not None
        N = o.shape[0]
        T = pl.cdiv(N, RT)
        pad = T * RT - N
        sid_f = (jnp.zeros((N,), jnp.float32) if sid is None
                 else sid.astype(jnp.float32))
        rays8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2],
                           seed_t, sid_f])
        if pad:
            fill = jnp.zeros((8, pad), rays8.dtype).at[5].set(1.0)
            if multi:
                fill = fill.at[7].set(-1.0)
            rays8 = jnp.concatenate([rays8, fill], axis=1)
        rays_t = rays8.reshape(8, T, 8, 128)
        tile_major = False

    phases = [ph for ph in plan.phases if ph.vis[vi]
              and (multi or ph.si == scene_id)]

    def kernel(rays_ref, pf_ref, pi_ref, nf_ref, ni_ref, bb_ref,
               out_t, out_w, out_a, stack_ref, leafq_ref):
        def rc(c):
            if tile_major:
                return rays_ref[0, c]                   # (8, 128)
            return rays_ref[c, 0]                       # (8, 128)

        ox, oy, oz = rc(0), rc(1), rc(2)
        dx, dy, dz = rc(3), rc(4), rc(5)
        seed = rc(6)
        ivx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)
        if multi:
            sidr = rc(7)
            scene_ok = {s: sidr == float(s) for s in range(plan.n_scenes)}

        def sh_undone(bt):
            """Shadow mode: lanes still needing occlusion tests.  A lane
            is done when occluded (bt < seed) OR dead (seed <= 0, the
            masked-inactive tmax=0 rays) -- dead lanes must not block
            the tile's early exit (0 < 0 is never true)."""
            return (seed > 0.0) & (bt >= seed)

        def phase_ray_ok(ph):
            """Per-ray static validity (scene match) for a phase."""
            if multi:
                return scene_ok[ph.si]
            return None  # all rays (single-scene call => scene 0 only)

        def member_inside_fn(cm, px, py, pz):
            nfld = _field_width(cm.ptype)

            def member_inside(r):
                cbase = cm.pf_base + r * cm.F

                def c(q):
                    return pf_ref[cbase + q]
                if cm.has_inv:
                    def mi(q):
                        return pf_ref[cbase + nfld + q]
                    cx = mi(0)*px + mi(1)*py + mi(2)*pz + mi(3)
                    cy = mi(4)*px + mi(5)*py + mi(6)*pz + mi(7)
                    cz = mi(8)*px + mi(9)*py + mi(10)*pz + mi(11)
                else:
                    cx, cy, cz = px, py, pz
                return _inside_comp(cm.ptype, c, cx, cy, cz)
            return member_inside

        def point_bvh_scan(cm, px, py, pz, like, leaf_row, carry0):
            """Skip-link point query over a big constraint member set:
            visit nodes whose box contains any live candidate point,
            apply leaf_row(r, carry) to leaf rows.  Carries must be
            f32/i32 vectors (Mosaic can't loop-carry i1)."""
            M = cm.n_nodes

            def step(st):
                node = st[0]
                carry = st[1:]
                nb = cm.nf_base + node * 6
                cont = ((px >= nf_ref[nb + 0]) & (px <= nf_ref[nb + 3])
                        & (py >= nf_ref[nb + 1]) & (py <= nf_ref[nb + 4])
                        & (pz >= nf_ref[nb + 2]) & (pz <= nf_ref[nb + 5])
                        & like)
                anyc = jnp.any(cont)
                nib = cm.ni_base + node * 3
                lc = ni_ref[nib + 2]
                ls = ni_ref[nib + 1]

                def leaves(args):
                    carry = args
                    for k in range(A.LEAF_MAX):
                        r = jnp.minimum(ls + k, cm.M - 1)
                        carry = leaf_row(r, carry, (k < lc))
                    return carry

                carry = jax.lax.cond(anyc & (lc > 0), leaves,
                                     lambda a: a, carry)
                nxt = jnp.where(anyc, node + 1, ni_ref[nib])
                return (nxt,) + carry

            st = jax.lax.while_loop(lambda st: st[0] < M, step,
                                    (jnp.int32(0),) + carry0)
            return st[1:]

        def eval_cons(cons, px, py, pz, like):
            """Inline CSG clause check at candidate points (Csg.hs:92-101
            semantics: IN(set) == positive for every other clause)."""
            allok = like | True
            for positive, ms in cons:
                inn = like & False
                for cm in ms:
                    member_inside = member_inside_fn(cm, px, py, pz)
                    if cm.n_nodes > 0:
                        def leaf_row(r, carry, valid):
                            acc, = carry
                            ins = member_inside(r) & valid
                            return (jnp.maximum(
                                acc, ins.astype(jnp.float32)),)
                        (inn_f,) = point_bvh_scan(
                            cm, px, py, pz, like,
                            leaf_row, (inn.astype(jnp.float32),))
                        inn = inn_f > 0.0
                    elif cm.M <= 4:
                        for r in range(cm.M):
                            inn = inn | member_inside(r)
                    else:
                        # Mosaic can't carry i1 vectors through scf.for;
                        # accumulate as f32 0/1
                        inn_f = jax.lax.fori_loop(
                            0, cm.M,
                            lambda r, acc: jnp.maximum(
                                acc, member_inside(r).astype(jnp.float32)),
                            inn.astype(jnp.float32))
                        inn = inn_f > 0.0
                allok = allok & (inn == positive)
            return allok

        def eval_clause_first(ms, px, py, pz, like):
            """(inside_any, global prim id of the FIRST containing
            member in clause order, -1 if none) -- get_metainfo
            semantics for difference-B retexture (Csg.hs:39-41).
            Tracks the min clause ordinal, which equals first-found for
            in-order scans and stays correct for BVH-ordered rows."""
            BIGORD = 1e9
            best_ord = ox * 0.0 + BIGORD
            best_gp = ox * 0.0 - 1.0
            for cm in ms:
                member_inside = member_inside_fn(cm, px, py, pz)

                def row(r, carry, valid=None):
                    best_ord, best_gp = carry
                    ins = member_inside(r)
                    if valid is not None:
                        ins = ins & valid
                    ordf = pi_ref[cm.pi_base + r * 2 + 1].astype(
                        jnp.float32)
                    gp_f = pi_ref[cm.pi_base + r * 2].astype(jnp.float32)
                    better = ins & (ordf < best_ord)
                    return (jnp.where(better, ordf, best_ord),
                            jnp.where(better, gp_f, best_gp))

                if cm.n_nodes > 0:
                    best_ord, best_gp = point_bvh_scan(
                        cm, px, py, pz, like,
                        lambda r, c, v: row(r, c, v),
                        (best_ord, best_gp))
                elif cm.M <= 4:
                    for r in range(cm.M):
                        best_ord, best_gp = row(r, (best_ord, best_gp))
                else:
                    best_ord, best_gp = jax.lax.fori_loop(
                        0, cm.M, lambda r, c: row(r, c),
                        (best_ord, best_gp))
            return best_ord < BIGORD, best_gp

        def prim_candidates(ph, off):
            """Raw entry/exit distances of one prim (params at PF offset
            `off`) against the tile, world distances."""
            tker = _T_KERNELS[ph.ptype]
            nfld = _field_width(ph.ptype)

            def f(q):
                return pf_ref[off + q]
            if ph.transformed:
                def m(q):
                    return pf_ref[off + nfld + q]
                pox = m(0)*ox + m(1)*oy + m(2)*oz + m(3)
                poy = m(4)*ox + m(5)*oy + m(6)*oz + m(7)
                poz = m(8)*ox + m(9)*oy + m(10)*oz + m(11)
                pdx = m(0)*dx + m(1)*dy + m(2)*dz
                pdy = m(4)*dx + m(5)*dy + m(6)*dz
                pdz = m(8)*dx + m(9)*dy + m(10)*dz
                ils = jax.lax.rsqrt(pdx*pdx + pdy*pdy + pdz*pdz)
                t0, t1 = tker(f, pox, poy, poz,
                              pdx * ils, pdy * ils, pdz * ils)
                t0 = jnp.where(jnp.abs(t0) >= INF, t0, t0 * ils)
                t1 = jnp.where(jnp.abs(t1) >= INF, t1, t1 * ils)
            else:
                t0, t1 = tker(f, ox, oy, oz, dx, dy, dz)
            return t0, t1

        def prim_test(ph, off, gp, ok, bt, bw):
            """Full candidate test + merge for one prim of a dense/bvh
            phase.  gp: scalar global prim id.  ok: extra validity."""
            t0, t1 = prim_candidates(ph, off)
            v0 = ok & (t0 > 0.0) & (t0 < bt)
            v1 = ok & (t1 > 0.0) & (t1 < bt)
            if ph.cons:
                for which in (0, 1):
                    tv = t0 if which == 0 else t1
                    vm = v0 if which == 0 else v1
                    px = ox + dx * tv
                    py = oy + dy * tv
                    pz = oz + dz * tv
                    okc = eval_cons(ph.cons, px, py, pz, vm)
                    if which == 0:
                        v0 = v0 & okc
                    else:
                        v1 = v1 & okc
            tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
            better = tc < bt
            wc = gp * 2 + jnp.where(v0, 0, 1)
            return (jnp.where(better, tc, bt),
                    jnp.where(better, wc, bw))

        def prim_ok(ph, p, rok):
            """Validity from PI flags + scene mask for kernel-order
            prim p of a dense/bvh phase."""
            ok = rok if rok is not None else (seed > -1.0)  # all-true
            if ph.vis_mixed:
                flags = pi_ref[ph.pi_base + p * 2 + 1]
                bit = (flags % 2 == 1) if vi == 0 else (flags >= 2)
                ok = ok & bit
            return ok

        def bb_live(bb_idx, lim):
            """Phase-AABB slab test vs a per-lane t limit."""
            def slab(lo, hi, oc, iv):
                ta = (lo - oc) * iv
                tb = (hi - oc) * iv
                return jnp.minimum(ta, tb), jnp.maximum(ta, tb)
            nx, fx = slab(bb_ref[bb_idx, 0], bb_ref[bb_idx, 3], ox, ivx)
            ny, fy = slab(bb_ref[bb_idx, 1], bb_ref[bb_idx, 4], oy, ivy)
            nz, fz = slab(bb_ref[bb_idx, 2], bb_ref[bb_idx, 5], oz, ivz)
            near = jnp.maximum(jnp.maximum(nx, ny), nz)
            far = jnp.minimum(jnp.minimum(fx, fy), fz)
            return (near <= far) & (far > 0.0) & (near < lim)

        def emit_dense(ph, bt, bw, pre):
            rok = phase_ray_ok(ph)

            def body(args):
                bt, bw = args

                def step(p, carry):
                    bt, bw = carry
                    gp = pi_ref[ph.pi_base + p * 2]
                    ok = prim_ok(ph, p, rok)
                    if shadow:
                        ok = ok & sh_undone(bt)
                    return prim_test(ph, ph.pf_base + p * ph.F, gp,
                                     ok, bt, bw)

                if ph.P <= 8:
                    for p in range(ph.P):
                        bt, bw = step(p, (bt, bw))
                    return bt, bw
                return jax.lax.fori_loop(0, ph.P, step, (bt, bw))

            if pre is None:
                return body((bt, bw))
            return jax.lax.cond(pre, body, lambda a: a, (bt, bw))

        def emit_bvh(ph, bt, bw):
            rok = phase_ray_ok(ph)
            M = ph.n_nodes
            from .accel import LEAF_MAX

            def body(args):
                def leaf_tests(largs):
                    bt, bw, hitm, ls, lc = largs
                    for k in range(LEAF_MAX):
                        p = jnp.minimum(ls + k, ph.P - 1)
                        ok = hitm & (k < lc)
                        ok = ok & prim_ok(ph, p, None)
                        bt, bw = prim_test(ph, ph.pf_base + p * ph.F,
                                           pi_ref[ph.pi_base + p * 2],
                                           ok, bt, bw)
                    return bt, bw

                def step(st):
                    node, bt, bw = st
                    nb = ph.nf_base + node * 6
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
                    hitm = (near <= far) & (far > 0.0) & (near < bt)
                    if rok is not None:
                        hitm = hitm & rok
                    if shadow:
                        # any-hit: a blocked lane must stop pulling the
                        # tile through geometry nearer than its blocker
                        hitm = hitm & sh_undone(bt)
                    anyhit = jnp.any(hitm)
                    nib = ph.ni_base + node * 3
                    lc = ni_ref[nib + 2]
                    ls = ni_ref[nib + 1]
                    bt, bw = jax.lax.cond(
                        anyhit & (lc > 0), leaf_tests,
                        lambda la: (la[0], la[1]),
                        (bt, bw, hitm, ls, lc))
                    nxt = jnp.where(anyhit, node + 1, ni_ref[nib])
                    if shadow:
                        nxt = jnp.where(jnp.any(sh_undone(bt)), nxt, M)
                    return nxt, bt, bw

                bt, bw = args
                _, bt, bw = jax.lax.while_loop(
                    lambda st: st[0] < M, step, (jnp.int32(0), bt, bw))
                return bt, bw

            conds = []
            if rok is not None:
                conds.append(jnp.any(rok))
            if shadow:
                conds.append(jnp.any(sh_undone(bt)))
            if conds:
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                return jax.lax.cond(cond, body, lambda a: a, (bt, bw))
            return body((bt, bw))

        def emit_bvh2(ph, bt, bw, pre):
            """Near-child-first ordered walk over a strictly binary
            tree (accel.build_bvh2) with a per-tile SMEM stack: both
            children slab-tested per scalar sync, the nearer one
            descended first (one scalar vote across lanes), the far
            one pushed -- the TPU analog of the reference's
            interval-narrowed recursion (Bih.hs:332-368).  Near-first
            order lets the running best-t prune far subtrees, and the
            host simulator (tools/sim_traversal.py) measured ~2x fewer
            node visits than the skip-link DFS on real shadow batches;
            per-node cost is dominated by the scalar/vector sync, so
            fewer+fatter steps win."""
            rok = phase_ray_ok(ph)

            def leaf_tests(bt, bw, ls, lc):
                for k in range(BVH2_LEAF):
                    p = jnp.minimum(ls + k, ph.P - 1)
                    ok = (k < lc) & prim_ok(ph, p, rok)
                    if shadow:
                        ok = ok & sh_undone(bt)
                    bt, bw = prim_test(ph, ph.pf_base + p * ph.F,
                                       pi_ref[ph.pi_base + p * 2],
                                       ok, bt, bw)
                return bt, bw

            def slab2(node, bt, gate):
                nb = ph.nf_base + node * 6
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
                hit = (near <= far) & (far > 0.0) & (near < bt) & gate
                return hit, near

            def body(args):
                def step(st):
                    node, sp, bt, bw = st
                    nib = ph.ni_base + node * 4
                    lc = ni_ref[nib + 3]

                    def do_leaf(a):
                        bt, bw, sp = a
                        bt, bw = leaf_tests(bt, bw, ni_ref[nib + 2], lc)
                        return jnp.int32(-1), sp, bt, bw

                    def do_inner(a):
                        bt, bw, sp = a
                        gate = rok if rok is not None else (seed > -1.0)
                        if shadow:
                            gate = gate & sh_undone(bt)
                        left = ni_ref[nib]
                        right = ni_ref[nib + 1]
                        hL, nL = slab2(left, bt, gate)
                        hR, nR = slab2(right, bt, gate)
                        anyL = jnp.any(hL)
                        anyR = jnp.any(hR)
                        both = anyL & anyR
                        l_first = jnp.sum(
                            jnp.where(hL & hR, nR - nL, 0.0)) >= 0.0
                        first = jnp.where(
                            both, jnp.where(l_first, left, right),
                            jnp.where(anyL, left,
                                      jnp.where(anyR, right,
                                                jnp.int32(-1))))
                        second = jnp.where(
                            both, jnp.where(l_first, right, left),
                            jnp.int32(-1))

                        @pl.when(second >= 0)
                        def _():
                            stack_ref[sp] = second
                        sp = jnp.where(second >= 0, sp + 1, sp)
                        return first, sp, bt, bw

                    node, sp, bt, bw = jax.lax.cond(
                        lc > 0, do_leaf, do_inner, (bt, bw, sp))
                    if shadow:
                        # any-hit early exit: drain once every live
                        # lane is blocked
                        done = ~jnp.any(sh_undone(bt))
                        node = jnp.where(done, jnp.int32(-1), node)
                        sp = jnp.where(done, jnp.int32(0), sp)
                    do_pop = (node < 0) & (sp > 0)
                    popped = stack_ref[jnp.maximum(sp - 1, 0)]
                    node = jnp.where(do_pop, popped, node)
                    sp = jnp.where(do_pop, sp - 1, sp)
                    return node, sp, bt, bw

                bt, bw = args
                _, _, bt, bw = jax.lax.while_loop(
                    lambda st: st[0] >= 0, step,
                    (jnp.int32(0), jnp.int32(0), bt, bw))
                return bt, bw

            if pre is None:
                return body((bt, bw))
            return jax.lax.cond(pre, body, lambda a: a, (bt, bw))

        def emit_kwide(ph, bt, bw, pre):
            """K-wide frontier walk over the binary bvh2 tree: pop up
            to K nodes per iteration from the SMEM stack, issue all K
            slab tests and any-votes back-to-back, read the votes
            after ONE queue drain, then do the scalar bookkeeping
            (child pushes) and the gated leaf prim tests.  Measured
            (tools/micro_kwide.py) this cuts the per-node cost from
            ~180 ns (one drain per node) to ~30 ns at K=8.  Semantics
            match emit_bvh2 exactly -- the visit ORDER differs (no
            near-first), but the (t, wid) merge is a min-reduction and
            per-lane best-t culling still applies at pop time, so the
            result is identical up to exact-tie winner choice."""
            rok = phase_ray_ok(ph)
            K = KWIDE_K

            def leaf_tests(bt, bw, ls, lc):
                if _KW_DYNLEAF:
                    # dynamic trip count: mean leaf fill is ~11 of 16
                    # (accel histogram), so the fixed-width unroll
                    # wastes ~1/3 of all leaf prim tests on padding
                    def one(k, a):
                        bt, bw = a
                        p = ls + k
                        ok = prim_ok(ph, p, rok)
                        if shadow:
                            ok = ok & sh_undone(bt)
                        return prim_test(ph, ph.pf_base + p * ph.F,
                                         pi_ref[ph.pi_base + p * 2],
                                         ok, bt, bw)
                    return jax.lax.fori_loop(0, lc, one, (bt, bw))
                for k in range(BVH2_LEAF):
                    p = jnp.minimum(ls + k, ph.P - 1)
                    ok = (k < lc) & prim_ok(ph, p, rok)
                    if shadow:
                        ok = ok & sh_undone(bt)
                    bt, bw = prim_test(ph, ph.pf_base + p * ph.F,
                                       pi_ref[ph.pi_base + p * 2],
                                       ok, bt, bw)
                return bt, bw

            def slab(node, bt, gate):
                nb = ph.nf_base + node * 6
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
                return (near <= far) & (far > 0.0) & (near < bt)

            def body(args):
                def drain_leaves(lp, bt, bw):
                    """Unconditionally test every queued leaf: a
                    dynamic fori over SMEM (ls, lc) pairs with NO
                    per-leaf branches -- per-leaf lax.conds measured
                    ~5 ms/launch of branch overhead on this walk."""
                    def one(i, a):
                        bt, bw = a
                        return leaf_tests(bt, bw, leafq_ref[2 * i],
                                          leafq_ref[2 * i + 1])
                    return jax.lax.fori_loop(0, lp, one, (bt, bw))

                def step(st):
                    sp, bt, bw = st
                    gate = rok if rok is not None else (seed > -1.0)
                    if shadow:
                        gate = gate & sh_undone(bt)
                    kk = jnp.minimum(sp, K)
                    # phase 1: issue all K slab tests + reductions
                    info = []
                    for k in range(K):
                        nd = stack_ref[jnp.maximum(sp - 1 - k, 0)]
                        hit = slab(nd, bt, gate)
                        info.append((nd, jnp.sum(hit.astype(jnp.float32))))
                    sp = sp - kk
                    # phase 2: one drain; scalar bookkeeping only
                    lp = jnp.int32(0)
                    for k, (nd, s) in enumerate(info):
                        nib = ph.ni_base + nd * 4
                        lc = ni_ref[nib + 3]
                        hitk = (s > 0.0) & (k < kk)
                        push = hitk & (lc == 0)
                        is_leaf = hitk & (lc > 0)

                        @pl.when(push)
                        def _(nd=nd, nib=nib, sp=sp):
                            stack_ref[sp] = ni_ref[nib]
                            stack_ref[sp + 1] = ni_ref[nib + 1]
                        sp = jnp.where(push, sp + 2, sp)

                        @pl.when(is_leaf)
                        def _(nib=nib, lc=lc, lp=lp):
                            leafq_ref[2 * lp] = ni_ref[nib + 2]
                            leafq_ref[2 * lp + 1] = lc
                        lp = jnp.where(is_leaf, lp + 1, lp)
                    # phase 3: one batched leaf drain per iteration
                    if not _KW_NOLEAF:
                        bt, bw = jax.lax.cond(
                            lp > 0,
                            lambda a, lp=lp: drain_leaves(lp, *a),
                            lambda a: a, (bt, bw))
                    if shadow and not _KW_NOEXIT:
                        # any-hit early exit, one drain per iteration
                        sp = jnp.where(jnp.any(sh_undone(bt)), sp,
                                       jnp.int32(0))
                    return sp, bt, bw

                bt, bw = args
                stack_ref[0] = jnp.int32(0)
                _, bt, bw = jax.lax.while_loop(
                    lambda st: st[0] > 0, step,
                    (jnp.int32(1), bt, bw))
                return bt, bw

            if pre is None:
                return body((bt, bw))
            return jax.lax.cond(pre, body, lambda a: a, (bt, bw))

        def member_interval(ptype, off, F, has_inv):
            """Exact world [t_in, t_out] of one convex member; empty ->
            [INF, -INF]-style extremes handled by max/min."""
            nfld = _field_width(ptype)

            def f(q):
                return pf_ref[off + q]
            if has_inv:
                def m(q):
                    return pf_ref[off + nfld + q]
                pox = m(0)*ox + m(1)*oy + m(2)*oz + m(3)
                poy = m(4)*ox + m(5)*oy + m(6)*oz + m(7)
                poz = m(8)*ox + m(9)*oy + m(10)*oz + m(11)
                pdx = m(0)*dx + m(1)*dy + m(2)*dz
                pdy = m(4)*dx + m(5)*dy + m(6)*dz
                pdz = m(8)*dx + m(9)*dy + m(10)*dz
                ils = jax.lax.rsqrt(pdx*pdx + pdy*pdy + pdz*pdz)
                cox, coy, coz = pox, poy, poz
                cdx, cdy, cdz = pdx * ils, pdy * ils, pdz * ils
            else:
                ils = None
                cox, coy, coz = ox, oy, oz
                cdx, cdy, cdz = dx, dy, dz
            if ptype == "plane":
                nx_, ny_, nz_, offp = f(0), f(1), f(2), f(3)
                dn = nx_*cdx + ny_*cdy + nz_*cdz
                sdist = nx_*cox + ny_*coy + nz_*coz - offp
                t = -sdist / jnp.where(dn == 0.0, 1.0, dn)
                ins = sdist < 0.0
                t0 = jnp.where(dn < 0.0, t, -INF)
                t1 = jnp.where(dn > 0.0, t, INF)
                t0 = jnp.where(dn == 0.0, jnp.where(ins, -INF, INF), t0)
                t1 = jnp.where(dn == 0.0, jnp.where(ins, INF, -INF), t1)
            else:
                t0, t1 = _T_KERNELS[ptype](f, cox, coy, coz, cdx, cdy, cdz)
            if ils is not None:
                t0 = jnp.where(jnp.abs(t0) >= INF, t0, t0 * ils)
                t1 = jnp.where(jnp.abs(t1) >= INF, t1, t1 * ils)
            return t0, t1

        def emit_convex(ph, bt, bw, pre):
            rok = phase_ray_ok(ph)

            def body(args):
                bt, bw = args
                t_in = jnp.full_like(bt, -INF)
                t_out = jnp.full_like(bt, INF)
                w_in = jnp.zeros_like(bw)
                w_out = jnp.zeros_like(bw)
                for (ptype, off, F, has_inv, gp) in ph.members:
                    t0, t1 = member_interval(ptype, off, F, has_inv)
                    u0 = t0 > t_in
                    t_in = jnp.where(u0, t0, t_in)
                    w_in = jnp.where(u0, gp * 2, w_in)
                    u1 = t1 < t_out
                    t_out = jnp.where(u1, t1, t_out)
                    w_out = jnp.where(u1, gp * 2 + 1, w_out)
                entering = t_in > 0.0
                t_cand = jnp.where(entering, t_in, t_out)
                ok = ((t_in <= t_out) & (t_cand > 0.0) & (t_cand < bt)
                      & (t_cand < INF))
                if rok is not None:
                    ok = ok & rok
                if shadow:
                    ok = ok & sh_undone(bt)
                return (jnp.where(ok, t_cand, bt),
                        jnp.where(ok, jnp.where(entering, w_in, w_out), bw))

            if pre is None:
                return body((bt, bw))
            return jax.lax.cond(pre, body, lambda a: a, (bt, bw))

        def emit_deferred(ph, bt, bw, ba, pre):
            """One deferred CSG prim: exit-only for negative clauses
            plus leave-own-clause check (Csg.hs:33-54); other-clause
            membership scans run under the phase's precomputed
            seed-based gate (the candidate evals re-run inside the
            body against the CURRENT best t).  For useatex
            difference-B prims the A-clause scan also tracks the
            first containing member id into the aux output."""
            rok = phase_ray_ok(ph)

            def body(args):
                bt, bw, ba = args
                t0, t1 = prim_candidates(ph, ph.pf_base)
                ok = rok if rok is not None else (seed > -1.0)
                if shadow:
                    ok = ok & sh_undone(bt)
                v0 = ok & (t0 > 0.0) & (t0 < bt) & (t0 < INF) \
                    & (not ph.neg)
                v1 = ok & (t1 > 0.0) & (t1 < bt) & (t1 < INF)
                first_gp = None
                for which in (0, 1):
                    tv = t0 if which == 0 else t1
                    vm = v0 if which == 0 else v1
                    px = ox + dx * tv
                    py = oy + dy * tv
                    pz = oz + dz * tv
                    if which == 1 and ph.atex_clause >= 0:
                        others = [c for i, c in enumerate(ph.cons)
                                  if i != ph.atex_clause]
                        okc = eval_cons(others, px, py, pz, vm)
                        inn_ok, first_gp = eval_clause_first(
                            ph.cons[ph.atex_clause][1], px, py, pz, vm)
                        okc = okc & inn_ok
                    else:
                        okc = eval_cons(ph.cons, px, py, pz, vm)
                    if ph.regions:
                        # DNF boundary test: the union (own region OR
                        # siblings) must FLIP across the candidate --
                        # sampled at p +- DELTA*d, robust to members
                        # duplicated across disjuncts (Csg.hs:38-54
                        # delta-advance style)
                        um = jnp.zeros_like(vm)
                        up = jnp.zeros_like(vm)
                        for reg in ph.regions:
                            um = um | eval_cons(
                                reg, px - dx * DELTA, py - dy * DELTA,
                                pz - dz * DELTA, vm)
                            up = up | eval_cons(
                                reg, px + dx * DELTA, py + dy * DELTA,
                                pz + dz * DELTA, vm)
                        okc = okc & (um != up)
                    if which == 1 and ph.neg:
                        # ray must actually leave the clause set
                        still = eval_cons(
                            [(True, ph.own)],
                            px + dx * DELTA, py + dy * DELTA,
                            pz + dz * DELTA, vm)
                        okc = okc & ~still
                    if which == 0:
                        v0 = v0 & okc
                    else:
                        v1 = v1 & okc
                tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
                better = tc < bt
                wc = ph.gprim * 2 + jnp.where(v0, 0, 1)
                if first_gp is not None:
                    ba = jnp.where(better, first_gp, ba)
                return (jnp.where(better, tc, bt),
                        jnp.where(better, wc, bw), ba)

            if pre is None:
                return body((bt, bw, ba))
            return jax.lax.cond(pre, body,
                                lambda a: (a[0], a[1], a[2]),
                                (bt, bw, ba))

        # ---- precomputed phase gates: every gate's any-vote is a
        # scalar/vector queue drain (~150 ns measured); issuing ALL
        # gate reductions up-front against the SEED best-t and reading
        # them after one drain replaces ~14 per-phase drains per tile.
        # Seed gates are a conservative superset of the running-best-t
        # gates the phases used to compute inline, so bodies run
        # slightly more often; every body still culls against the
        # CURRENT best t per lane, so results are identical.
        pre_sums = []
        for ph in phases:
            rok = phase_ray_ok(ph)
            parts = []
            if rok is not None:
                parts.append(rok)
            if shadow:
                parts.append(seed > 0.0)
            if ph.kind == "dense" and ph.bb_idx >= 0:
                parts.append(bb_live(ph.bb_idx, seed))
            if ph.kind == "deferred":
                g = parts[0] if parts else (seed > -1.0)
                for p in parts[1:]:
                    g = g & p
                t0, t1 = prim_candidates(ph, ph.pf_base)
                v0 = g & (t0 > 0.0) & (t0 < seed) & (t0 < INF) \
                    & (not ph.neg)
                v1 = g & (t1 > 0.0) & (t1 < seed) & (t1 < INF)
                pre_sums.append(jnp.sum((v0 | v1).astype(jnp.float32)))
            elif not parts:
                pre_sums.append(None)   # gate is constant-true
            else:
                g = parts[0]
                for p in parts[1:]:
                    g = g & p
                pre_sums.append(jnp.sum(g.astype(jnp.float32)))
        pre_gates = [None if s is None else (s > 0.0) for s in pre_sums]

        bt = seed
        bw = jnp.full((8, 128), -1, jnp.int32)
        ba = jnp.full((8, 128), -1.0, jnp.float32)
        for ph, pre in zip(phases, pre_gates):
            if ph.kind == "dense":
                bt, bw = emit_dense(ph, bt, bw, pre)
            elif ph.kind == "bvh":
                bt, bw = emit_bvh(ph, bt, bw)
            elif ph.kind == "bvh2":
                if KWIDE:
                    bt, bw = emit_kwide(ph, bt, bw, pre)
                else:
                    bt, bw = emit_bvh2(ph, bt, bw, pre)
            elif ph.kind == "convex":
                bt, bw = emit_convex(ph, bt, bw, pre)
            else:
                bt, bw, ba = emit_deferred(ph, bt, bw, ba, pre)
        out_t[0] = bt
        out_w[0] = bw
        out_a[0] = ba

    in_specs = [
        pl.BlockSpec((1, 8, 8, 128), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM) if tile_major else
        pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    rdt = rays.dtype if rays is not None else o.dtype
    out_shape = (jax.ShapeDtypeStruct((T, 8, 128), rdt),
                 jax.ShapeDtypeStruct((T, 8, 128), jnp.int32),
                 jax.ShapeDtypeStruct((T, 8, 128), jnp.float32))
    blk = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out_specs = (blk, blk, blk)
    if KWIDE:
        # frontier bound: every inner node pushes its 2 children at
        # most once, so live entries never exceed n_nodes
        stack_n = max([ph.n_nodes for ph in phases if ph.kind == "bvh2"]
                      + [6]) + 2 * KWIDE_K
    else:
        stack_n = max([ph.depth for ph in phases if ph.kind == "bvh2"]
                      + [6]) + 2
    bt, bw, ba = pl.pallas_call(
        kernel,
        grid=(T,),
        scratch_shapes=[pltpu.SMEM((stack_n,), jnp.int32),
                        pltpu.SMEM((2 * KWIDE_K,), jnp.int32)],
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rays_t, pf, jnp.asarray(plan.pi), jnp.asarray(plan.nf),
      jnp.asarray(plan.ni), bb)
    return (bt.reshape(-1)[:N], bw.reshape(-1)[:N],
            ba.reshape(-1)[:N].astype(jnp.int32))


# --- differentiable finalize ------------------------------------------------

def finalize(compiled, plan: MegaPlan, arrays, o, d, t, wid, aux=None,
             want_meta: bool = True):
    """Re-evaluate the winning candidates differentiably and assemble
    the Hit record (normals via the geom kernels, instance object rays,
    texture/tag stacks, difference-B retexture via the kernel's
    first-containing-A-member aux output)."""
    from .compile import TEX_DEPTH, TAG_DEPTH
    from .intersect import Hit, _kernel_hits2
    from .vec import vnorm, vscaleadd
    from .xfm import apply_point, apply_vector, apply_normal_T

    N = o.shape[0]
    dt = o.dtype
    hit = wid >= 0
    prim = jnp.where(hit, wid // 2, 0)
    slot = jnp.where(hit, wid % 2, 0)

    best_t = jnp.where(hit, t, INFINITY)
    norm = jnp.zeros((N, 3), dt)
    obj_o, obj_d = o, d

    # static metadata: [tex*4, tag*4, serial, neg, cid, row, useatex]
    meta_tab = getattr(plan, "_meta_tab", None)
    if meta_tab is None:
        meta_tab = np.concatenate(
            [plan.tex_all, plan.tag_all, plan.serial_all[:, None],
             plan.neg_all[:, None].astype(np.int32),
             plan.cid_all[:, None], plan.row_all[:, None],
             plan.atex_all[:, None].astype(np.int32)],
            axis=1).astype(np.int32)
        plan._meta_tab = meta_tab
    MW = meta_tab.shape[1]
    TD = plan.tex_all.shape[1]
    GD = plan.tag_all.shape[1]

    # param table in GLOBAL PRIM order, one padded row per prim, with
    # the int32 metadata carried alongside AS FLOAT VALUES: per-ray TPU
    # gathers pay for the full 128-lane row regardless of width, so ONE
    # (N, f_max+MW) gather costs the same as the old 13-column metadata
    # gather alone and replaces TWO (the separate combo-row param
    # gather was ~32 ms at 1080p).  Values, NOT a bitcast: TPU float
    # paths flush denormals and canonicalize NaNs, destroying reinterpreted
    # int bits; every meta value is a small integer (< 2^24), which
    # float32 carries exactly.
    #
    # Layout (round 5): the inverse matrix lives in a FIXED 12-column
    # slot after the (padded) field columns for EVERY transformed
    # group, so ONE masked select + ONE object-space ray transform
    # serves all transformed combos -- the per-combo minv selects were
    # the largest single XLA-glue op of the frame (1.36 ms at L0,
    # slice_select_fusion in the device trace).
    FW = max((_field_width(pt) for pt, _tr, _g, _w in plan.combos),
             default=1)
    f_max = FW + 12
    from .compile import group_device_params
    tabs = []
    for si, sc in enumerate(compiled.scenes):
        for gi, g in enumerate(sc.groups):
            if g.size == 0:
                continue
            ga = group_device_params(g, arrays["scenes"][si][gi])
            cols = []
            for name, _wd in FIELDS[g.ptype]:
                v = jnp.asarray(ga[name])
                cols.append(v.reshape(v.shape[0], -1) if v.ndim > 1
                            else v[:, None])
            rows_k = jnp.concatenate(cols, axis=-1).astype(dt)
            if rows_k.shape[1] < FW:
                rows_k = jnp.concatenate(
                    [rows_k, jnp.zeros((rows_k.shape[0],
                                        FW - rows_k.shape[1]), dt)],
                    axis=-1)
            if g.m_inv is not None:
                mi = jnp.asarray(ga["m_inv"]).reshape(-1, 12).astype(dt)
            else:
                mi = jnp.zeros((rows_k.shape[0], 12), dt)
            tabs.append(jnp.concatenate([rows_k, mi], axis=-1))
    if tabs:
        metaf_np = getattr(plan, "_meta_tab_f32", None)
        if metaf_np is None:
            assert np.abs(meta_tab).max(initial=0) < 2 ** 24, \
                "meta values no longer exact in f32"
            metaf_np = meta_tab.astype(np.float32)
            plan._meta_tab_f32 = metaf_np
        ptab = tabs[0] if len(tabs) == 1 else jnp.concatenate(tabs, axis=0)
        metaf = jnp.asarray(metaf_np)
        comb = jnp.concatenate([ptab, metaf.astype(dt)], axis=1)
        from .vec import finite_grad
        # per-lane non-finite-cotangent filter at the gather boundary
        # (see vec.finite_grad): singular lanes must not poison the
        # cross-lane accumulation into parameter rows
        crow = finite_grad(comb[prim])             # (N, f_max + MW)
        prow = crow[:, :f_max]
        meta = crow[:, f_max:].astype(jnp.int32)
    else:
        meta = jnp.asarray(meta_tab)[prim]

    tex = jnp.where(hit[:, None], meta[:, :TD], -1)
    tag = jnp.where(hit[:, None], meta[:, TD:TD + GD], -1)
    ser = jnp.where(hit, meta[:, TD + GD], -1)
    neg = (meta[:, TD + GD + 1] > 0) & hit
    cid = meta[:, TD + GD + 2]
    atex = (meta[:, TD + GD + 4] > 0) & hit

    # ONE shared object-space ray for all transformed combos: the
    # fixed minv slot makes the select combo-independent, and the
    # transform runs as flat-plane FMAs (the (N, 3, 4) einsum form
    # forced {0,1} relayout copies of every operand, ~0.8 ms/level)
    xf_cids = [k for k, (_p, tr, _g, _w) in enumerate(plan.combos) if tr]
    any_xf = jnp.zeros((N,), bool)
    for k in xf_cids:
        any_xf = any_xf | (cid == k)
    any_xf = any_xf & hit
    if xf_cids:
        ident12 = jnp.asarray(
            np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32))
        m12 = jnp.where(any_xf[:, None], prow[:, FW:FW + 12], ident12)
        m = [m12[:, q] for q in range(12)]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx_, dy_, dz_ = d[:, 0], d[:, 1], d[:, 2]
        pox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        poy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        poz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        pdx = m[0] * dx_ + m[1] * dy_ + m[2] * dz_
        pdy = m[4] * dx_ + m[5] * dy_ + m[6] * dz_
        pdz = m[8] * dx_ + m[9] * dy_ + m[10] * dz_
        ils = 1.0 / jnp.sqrt(jnp.maximum(
            pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
        oo = jnp.stack([pox, poy, poz], axis=-1)
        du = jnp.stack([pdx * ils, pdy * ils, pdz * ils], axis=-1)

    for k, (ptype, transformed, glist, warp_any) in enumerate(plan.combos):
        mask = hit & (cid == k)
        params = {}
        off = 0
        for name, wdt in FIELDS[ptype]:
            # rows of other combos hold arbitrary bits for this layout;
            # replace them under the mask so no division garbage (inf /
            # nan) leaks into gradients through the selecting where
            col = jnp.where(mask[:, None], prow[:, off:off + wdt], 1.0)
            params[name] = col if wdt > 1 else col[:, 0]
            off += wdt
        if transformed:
            t0, n0, t1, n1 = _kernel_hits2(ptype, params, oo, du)
            t0 = t0 * ils
            t1 = t1 * ils
        else:
            t0, n0, t1, n1 = _kernel_hits2(ptype, params, o, d)
        tsel = jnp.where(slot == 0, t0, t1)
        # clamp the differentiable recompute to the selected value when
        # the two evaluations disagree numerically (tangency)
        tsel = jnp.where(jnp.abs(tsel - t) < 1e-2 * (1.0 + jnp.abs(t)),
                         tsel, t)
        nsel = jnp.where((slot == 0)[:, None], n0, n1)
        best_t = jnp.where(mask, tsel, best_t)
        norm = jnp.where(mask[:, None], nsel, norm)
        if transformed and warp_any:
            obj_o = jnp.where(mask[:, None], oo, obj_o)
            obj_d = jnp.where(mask[:, None], du, obj_d)

    # object-space winner normals -> world, once for every transformed
    # combo: n_world = normalize(M_inv^T n_obj) (Vec.hs:543 semantics)
    if xf_cids:
        nx_, ny_, nz_ = norm[:, 0], norm[:, 1], norm[:, 2]
        wx = m[0] * nx_ + m[4] * ny_ + m[8] * nz_
        wy = m[1] * nx_ + m[5] * ny_ + m[9] * nz_
        wz = m[2] * nx_ + m[6] * ny_ + m[10] * nz_
        il = 1.0 / jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz,
                                        1e-30))
        nw = jnp.stack([wx * il, wy * il, wz * il], axis=-1)
        norm = jnp.where(any_xf[:, None], nw, norm)

    norm = jnp.where(neg[:, None], -norm, norm)

    pos = vscaleadd(o, d, jnp.where(hit, best_t, 0.0))

    if want_meta and aux is not None and bool(plan.atex_all.any()):
        # difference-B retexture (Csg.hs:39-41): the kernel already
        # found the first containing A member during the validity scan
        ltab = getattr(plan, "_ltab", None)
        if ltab is None:
            ltab = np.concatenate([plan.ltex_all, plan.ltag_all],
                                  axis=1).astype(np.int32)
            plan._ltab = ltab
        use = atex & neg & (aux >= 0)
        lrow = jnp.asarray(ltab)[jnp.clip(aux, 0, plan.n_prims - 1)]
        tex = jnp.where(use[:, None], lrow[:, :TD], tex)
        tag = jnp.where(use[:, None], lrow[:, TD:TD + GD], tag)

    return Hit(t=best_t, hit=hit, pos=pos, norm=norm,
               obj_o=obj_o, obj_d=obj_d,
               tex_stack=tex, tag_stack=tag, prim_serial=ser)


def mega_intersect(compiled, arrays, o, d, sid=None, tmax=None,
                   shadow: bool = False, scene_id: int = 0,
                   interpret: Optional[bool] = None):
    """Full Hit via the megakernel + differentiable finalize.

    sid=None traces every ray in `scene_id`; otherwise sid is (N,)
    int32 per-ray scene ids (-1 = always miss)."""
    plan = get_plan(compiled)
    N = o.shape[0]
    if tmax is None:
        tmax = jnp.full((N,), INFINITY, dtype=o.dtype)
    seed = jnp.minimum(tmax, INFINITY)
    sg = jax.lax.stop_gradient
    pf, bb = pack_tables(plan, compiled, arrays)
    t, wid, aux = mega_select(plan, pf, bb, sg(o), sg(d), sg(seed),
                              sid=None if sid is None else sg(sid),
                              shadow=shadow, interpret=interpret,
                              scene_id=scene_id)
    t, wid = _run_blocks(compiled, plan, arrays, o, d, sid, t, wid,
                         shadow, scene_id)
    t, wid = _run_external(compiled, plan, arrays, o, d, sid, t, wid,
                           shadow, scene_id)
    return finalize(compiled, plan, arrays, o, d, t, wid, aux=aux,
                    want_meta=not shadow)


def _run_blocks(compiled, plan, arrays, o, d, sid, t, wid, shadow,
                scene_id, rays=None):
    """Merge the block-dense groups (plan.blocks): each is one seeded
    block_kernel launch; the chain keeps cross-group best-t culling.
    With `rays` (the (8,N) plane table), ray components pass through as
    rows and per-ray scene ids come from row 7."""
    if not plan.blocks:
        return t, wid
    from .compile import materialize_scene_params
    from .block_kernel import block_pass
    sg = jax.lax.stop_gradient
    for si, gi in plan.blocks:
        if rays is None and sid is None and si != scene_id:
            continue
        sc = compiled.scenes[si]
        g = sc.groups[gi]
        if (shadow and bool(g.noshadow.all())) or \
                (not shadow and bool(g.onlyshadow.all())):
            continue
        garrs = materialize_scene_params(sc, arrays["scenes"][si])
        if rays is not None:
            seed_g = jnp.where(rays[7] == float(si), t, jnp.zeros_like(t))
        else:
            seed_g = t if sid is None else jnp.where(
                sg(sid) == si, t, jnp.zeros_like(t))
        if shadow:
            # already-blocked lanes are done: zero their seed so they
            # don't drag tiles through the walk (any-hit semantics)
            seed_g = jnp.where(wid >= 0, jnp.zeros_like(seed_g), seed_g)
        if rays is not None:
            t2, l2 = block_pass(sc, garrs, gi, None, None, sg(seed_g),
                                shadow, rays6=rays[:6])
        else:
            t2, l2 = block_pass(sc, garrs, gi, sg(o), sg(d), sg(seed_g),
                                shadow)
        better = (t2 < seed_g) & (l2 >= 0)
        base = plan.prim_base[(si, gi)][0]
        wid = jnp.where(better, base * 2 + jnp.maximum(l2, 0), wid)
        t = jnp.where(better, t2, t)
    return t, wid


def _run_external(compiled, plan, arrays, o, d, sid, t, wid, shadow,
                  scene_id, rays=None):
    """Merge the oversized flat-prim groups (plan.external): each runs
    as one VMEM-streamed dense_intersect launch seeded with the
    megakernel's best t, so the cheaper pass culls the other."""
    if not plan.external:
        return t, wid
    from .compile import materialize_scene_params
    from .mesh_kernel import mesh_block_pass
    sg = jax.lax.stop_gradient
    for si, gi in plan.external:
        if rays is None and sid is None and si != scene_id:
            continue
        sc = compiled.scenes[si]
        g = sc.groups[gi]
        if (shadow and bool(g.noshadow.all())) or \
                (not shadow and bool(g.onlyshadow.all())):
            continue
        garrs = materialize_scene_params(sc, arrays["scenes"][si])
        if rays is not None:
            seed_g = jnp.where(rays[7] == float(si), t, jnp.zeros_like(t))
        else:
            seed_g = t if sid is None else jnp.where(
                sg(sid) == si, t, jnp.zeros_like(t))
        if shadow:
            # already-blocked lanes are done: zero their seed so they
            # don't drag tiles through the walk (any-hit semantics)
            seed_g = jnp.where(wid >= 0, jnp.zeros_like(seed_g), seed_g)
        if rays is not None:
            t2, bl2 = mesh_block_pass(sc, garrs, gi, None, None,
                                      sg(seed_g), shadow,
                                      rays6=rays[:6])
        else:
            t2, bl2 = mesh_block_pass(sc, garrs, gi, sg(o), sg(d),
                                      sg(seed_g), shadow)
        better = t2 < seed_g
        base = plan.prim_base[(si, gi)][0]
        # flat prims: the exit slot is always a miss, so slot bit = 0
        wid = jnp.where(better, (base + jnp.maximum(bl2, 0)) * 2, wid)
        t = jnp.where(better, t2, t)
    return t, wid


def mega_intersect_table(compiled, arrays, table,
                         interpret: Optional[bool] = None):
    """Table-native nearest-hit: `table` is (T, 8, 8, 128) tile-major
    with channels [ox,oy,oz,dx,dy,dz,tmax,sid] (dead lanes tmax 0,
    sid -1).  Returns the finalized Hit (finalize consumes o, d
    stacked from the table's channels -- the only (N, 3) arrays in the
    whole path).  This is the wavefront tracer's production entry: the
    (N, 3)-column entry (mega_intersect) cost ~16 per-component
    gathers + a layout transpose per launch in the round-3 frame
    trace."""
    plan = get_plan(compiled)
    sg = jax.lax.stop_gradient
    T = table.shape[0]
    N = T * RT
    pf, bb = pack_tables(plan, compiled, arrays)
    seed = jnp.minimum(table[:, 6], INFINITY)
    tbl = jnp.concatenate([table[:, :6], seed[:, None], table[:, 7:8]],
                          axis=1)
    t, wid, aux = mega_select(plan, pf, bb, rays=sg(tbl), multi=True,
                              interpret=interpret)
    o = jnp.stack([table[:, c].reshape(N) for c in range(3)], axis=-1)
    d = jnp.stack([table[:, c].reshape(N) for c in range(3, 6)], axis=-1)
    if plan.blocks or plan.external:
        rows = sg(tbl).transpose(1, 0, 2, 3).reshape(8, N)
        t, wid = _run_blocks(compiled, plan, arrays, o, d, None, t, wid,
                             False, 0, rays=rows)
        t, wid = _run_external(compiled, plan, arrays, o, d, None, t,
                               wid, False, 0, rays=rows)
    return finalize(compiled, plan, arrays, o, d, t, wid, aux=aux)


def mega_shadow_table(compiled, arrays, table,
                      interpret: Optional[bool] = None):
    """Table-native any-hit occlusion: `table` as in
    mega_intersect_table (channel 6 = segment tmax; 0 = dead lane).
    Returns blocked (T, 8, 128) bool."""
    plan = get_plan(compiled)
    sg = jax.lax.stop_gradient
    pf, bb = pack_tables(plan, compiled, arrays)
    t, wid, _ = mega_select(plan, pf, bb, rays=sg(table), multi=True,
                            shadow=True, interpret=interpret)
    if plan.blocks or plan.external:
        T = table.shape[0]
        N = T * RT
        rows = sg(table).transpose(1, 0, 2, 3).reshape(8, N)
        t, wid = _run_blocks(compiled, plan, arrays, None, None, None,
                             t, wid, shadow=True, scene_id=0, rays=rows)
        t, wid = _run_external(compiled, plan, arrays, None, None, None,
                               t, wid, shadow=True, scene_id=0,
                               rays=rows)
    return (wid >= 0).reshape(table.shape[0], 8, 128)


def mega_shadow(compiled, arrays, o=None, d=None, sid=None, tmax=None,
                scene_id: int = 0, interpret: Optional[bool] = None,
                rays=None):
    """Any-hit occlusion query: select-only, no finalize at all.

    Either (o, d [, sid, tmax]) (N,3)-column form, or `rays` = a
    prebuilt (8, N) plane table [o*3, d*3, tmax, sid] with N a
    multiple of 1024, dead lanes tmax 0 and sid -1 -- the
    layout-friendly path for tile-granular shadow batches."""
    plan = get_plan(compiled)
    sg = jax.lax.stop_gradient
    pf, bb = pack_tables(plan, compiled, arrays)
    if rays is not None:
        rays = sg(rays)
        t, wid, _ = mega_select(plan, pf, bb, shadow=True,
                                interpret=interpret, scene_id=scene_id,
                                rays=rays, multi=True)
        t, wid = _run_blocks(compiled, plan, arrays, None, None, None,
                             t, wid, shadow=True, scene_id=scene_id,
                             rays=rays)
        t, wid = _run_external(compiled, plan, arrays, None, None, None,
                               t, wid, shadow=True, scene_id=scene_id,
                               rays=rays)
        return wid >= 0
    N = o.shape[0]
    if tmax is None:
        tmax = jnp.full((N,), INFINITY, dtype=o.dtype)
    seed = jnp.minimum(tmax, INFINITY)
    t, wid, _ = mega_select(plan, pf, bb, sg(o), sg(d), sg(seed),
                            sid=None if sid is None else sg(sid),
                            shadow=True, interpret=interpret,
                            scene_id=scene_id)
    t, wid = _run_blocks(compiled, plan, arrays, o, d, sid, t, wid,
                         shadow=True, scene_id=scene_id)
    t, wid = _run_external(compiled, plan, arrays, o, d, sid, t, wid,
                           shadow=True, scene_id=scene_id)
    return wid >= 0

"""Go/no-go sim for frustum-bitmask traversal: per-tile conservative
beam culling of 16-prim leaf clusters vs the per-ray bvh2 walk, on the
real TestScene ray samples (tools/dump_shadow_sample.py).

For each (8,128)=1024-ray tile: beam = componentwise [omin,omax],
[dmin,dmax], tmax_max over active lanes.  A leaf box survives when the
interval slab test says SOME ray in the beam could hit it closer than
tmax_max.  Compares surviving leaves/tile against the union of leaves
the per-ray ordered walk actually visits, and models the per-tile ns
cost with micro-measured constants (tools/micro_prims.py):
  30 ns/prim dense test, ~150 ns per scalar decision/drain,
  ~15 ns per checked leaf-word, ~0.3 us fixed per phase (pack+readout).

Usage: python tools/sim_beam.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")

import glome_tpu as G
from glome_tpu import accel as A
from glome_tpu.scenes import test_scene

TILE = 1024
LEAF = 16

dat = np.load("/tmp/shadow_sample.npz")
solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
sc = compiled.scenes[0]


def leaf_clusters(gi):
    g = sc.groups[gi]
    bmin, bmax = A.group_bounds(g)
    bvh = A.build_bvh2(bmin, bmax, leaf_max=LEAF)
    # leaves in DFS order
    sel = bvh.leaf_count > 0
    ls, lc = bvh.leaf_start[sel], bvh.leaf_count[sel]
    lbmin = np.stack([bmin[bvh.order[s:s + c]].min(0)
                      for s, c in zip(ls, lc)])
    lbmax = np.stack([bmax[bvh.order[s:s + c]].max(0)
                      for s, c in zip(ls, lc)])
    return bvh, lbmin, lbmax, ls, lc, bmin, bmax


def beam_cull(o, d, tmax, lbmin, lbmax):
    """Surviving-leaf mask per tile: interval slab test."""
    Tn = o.shape[0] // TILE
    act = tmax > 0
    out = []
    for ti in range(Tn):
        s = slice(ti * TILE, (ti + 1) * TILE)
        a = act[s]
        if not a.any():
            out.append(np.zeros(lbmin.shape[0], bool))
            continue
        ov, dv, tm = o[s][a], d[s][a], tmax[s][a].max()
        olo, ohi = ov.min(0), ov.max(0)
        dlo, dhi = dv.min(0), dv.max(0)
        # interval slab test per axis: t-range of (blo - o_int) * inv(d_int)
        tlo = np.zeros(lbmin.shape[0])
        thi = np.full(lbmin.shape[0], tm)
        ok = np.ones(lbmin.shape[0], bool)
        for ax in range(3):
            # numerator intervals
            n1lo = lbmin[:, ax] - ohi[ax]
            n1hi = lbmin[:, ax] - olo[ax]
            n2lo = lbmax[:, ax] - ohi[ax]
            n2hi = lbmax[:, ax] - olo[ax]
            if dlo[ax] > 1e-9 or dhi[ax] < -1e-9:
                ilo, ihi = 1.0 / dhi[ax], 1.0 / dlo[ax]
                if ilo > ihi:
                    ilo, ihi = ihi, ilo
                cands = np.stack([n1lo * ilo, n1lo * ihi, n1hi * ilo,
                                  n1hi * ihi, n2lo * ilo, n2lo * ihi,
                                  n2hi * ilo, n2hi * ihi])
                near = np.minimum.reduce(
                    [np.maximum(np.minimum(n1lo * i, n2hi * i),
                                0 * tlo) for i in (ilo, ihi)])
                # conservative: entry = max over axes of min-corner t,
                # exit = min over axes of max-corner t
                t_in = np.minimum.reduce([cands[j] for j in range(8)])
                t_out = np.maximum.reduce([cands[j] for j in range(8)])
                tlo = np.maximum(tlo, t_in)
                thi = np.minimum(thi, t_out)
            else:
                # direction interval spans 0: axis constrains only by
                # origin overlap
                ok &= (lbmax[:, ax] >= olo[ax] - tm) & \
                      (lbmin[:, ax] <= ohi[ax] + tm)
        out.append(ok & (tlo <= thi) & (thi > 0))
    return np.stack(out)


def per_ray_union(o, d, tmax, bvh, bmin, bmax, ls_set):
    """Leaves the ordered per-ray walk would visit (no best-t culling,
    shadow any-hit style): a leaf is visited if ANY active ray's
    segment hits the leaf box."""
    Tn = o.shape[0] // TILE
    sel = bvh.leaf_count > 0
    lbmin = np.stack([bmin[bvh.order[s:s + c]].min(0)
                      for s, c in zip(bvh.leaf_start[sel],
                                      bvh.leaf_count[sel])])
    lbmax = np.stack([bmax[bvh.order[s:s + c]].max(0)
                      for s, c in zip(bvh.leaf_start[sel],
                                      bvh.leaf_count[sel])])
    out = []
    for ti in range(Tn):
        s = slice(ti * TILE, (ti + 1) * TILE)
        a = tmax[s] > 0
        if not a.any():
            out.append(np.zeros(lbmin.shape[0], bool))
            continue
        ov, dv, tm = o[s][a], d[s][a], tmax[s][a]
        inv = 1.0 / np.where(np.abs(dv) < 1e-12, 1e-12, dv)
        t1 = (lbmin[None] - ov[:, None]) * inv[:, None]
        t2 = (lbmax[None] - ov[:, None]) * inv[:, None]
        near = np.minimum(t1, t2).max(-1)
        far = np.maximum(t1, t2).min(-1)
        hit = (near <= far) & (far > 0) & (near < tm[:, None])
        out.append(hit.any(0))
    return np.stack(out)


for gi, g in [(gi, g) for gi, g in enumerate(sc.groups)
              if g.size > 512]:
    bvh, lbmin, lbmax, ls, lc, bmin, bmax = leaf_clusters(gi)
    L = lbmin.shape[0]
    print(f"== g{gi} {g.ptype} P={g.size} leaves={L} ==")
    for mode, (o, d, tm) in {
        "shadow": (dat["so"], dat["sd"], dat["st"]),
        "primary": (dat["po"], dat["pd"],
                    np.full(dat["po"].shape[0], 1e6, np.float32)),
    }.items():
        beam = beam_cull(o, d, tm, lbmin, lbmax)
        ray = per_ray_union(o, d, tm, bvh, bmin, bmax, None)
        live = (tm.reshape(-1, TILE) > 0).any(1)
        b, r = beam[live].sum(1), ray[live].sum(1)
        # cost model per tile
        words = (L + 15) // 16
        ns_beam = 300 + words * 15 + b * (LEAF * 30 + 20)
        print(f" [{mode}] leaves/tile beam={b.mean():6.1f} "
              f"perray={r.mean():6.1f}  prims beam={b.mean()*LEAF:7.0f} "
              f" est {ns_beam.mean()/1e3:6.2f} us/tile "
              f"(cur ~6.8 shadow)")
EOF = None

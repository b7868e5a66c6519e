"""Host-side traversal simulator: counts node steps + prim tests per
(8,128) tile for BVH/traversal variants on REAL TestScene ray samples
(tools/dump_shadow_sample.py), converting to per-launch ms with
micro-measured constants.  Decides where kernel time actually goes
before more kernel surgery.

Variants:
  skip-cur   : repo midpoint-cost BVH (accel.build_bvh), skip-link DFS
  bvh2-cur   : same split heuristic, binary, near-child-first ordered
  bvh2-sah   : 16-bucket binned SAH sweep build, ordered
Each with per-lane any-hit gating for shadow batches.

Usage: python tools/sim_traversal.py [/tmp/shadow_sample.npz]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")

import glome_tpu as G
from glome_tpu import accel as A
from glome_tpu.scenes import test_scene

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shadow_sample.npz"
dat = np.load(path)

solid, lights, cam = test_scene()
compiled = G.compile_scene(solid, lights)
sc = compiled.scenes[0]

# micro-measured per-op constants (tools/PERF_BUDGET.md + layout test)
NS_NODE_SKIP = 30.0      # one slab eval + loop overhead, (8,128)
NS_NODE_ORD = 60.0       # two child slabs + vote + stack
NS_PRIM = 115.0          # one prim test vs the tile (~25 vec ops)


def sphere_groups():
    for gi, g in enumerate(sc.groups):
        if g.ptype == "sphere" and g.size > 512:
            c = np.asarray(g.params["center"], np.float64)
            r = np.asarray(g.params["radius"], np.float64)
            yield gi, c, r


def sph_t(c, r, o, d, bt):
    """Nearest positive crossing < bt (entry or exit) per ray for ONE
    sphere vs (N,) rays; returns t or +inf."""
    e = c[None, :] - o
    v = np.einsum('nj,nj->n', e, d)
    disc = r * r - (np.einsum('nj,nj->n', e, e) - v * v)
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = v - sq
    t1 = v + sq
    t = np.where(ok & (t0 > 0) & (t0 < bt), t0,
                 np.where(ok & (t1 > 0) & (t1 < bt), t1, np.inf))
    return t


def slab(bmin, bmax, o, d):
    inv = 1.0 / np.where(d == 0, 1e-20, d)
    t1 = (bmin[None] - o) * inv
    t2 = (bmax[None] - o) * inv
    near = np.minimum(t1, t2).max(axis=1)
    far = np.maximum(t1, t2).min(axis=1)
    return near, far


def run_skip(bvh, C, R, o, d, seed, shadow):
    bt = seed.copy()
    node = 0
    M = bvh.n_nodes
    steps = 0
    ptests = 0
    while node < M:
        steps += 1
        near, far = slab(bvh.bmin[node], bvh.bmax[node], o, d)
        gate = bt > 0
        if shadow:
            gate &= bt >= seed
        hit = (near <= far) & (far > 0) & (near < bt) & gate
        if hit.any():
            lc = bvh.leaf_count[node]
            if lc > 0:
                for k in range(lc):
                    p = bvh.order[bvh.leaf_start[node] + k]
                    ptests += 1
                    t = sph_t(C[p], R[p], o, d, bt)
                    upd = hit & (t < bt)
                    bt = np.where(upd, t, bt)
            node += 1
            if shadow and not (gate & (bt >= seed)).any():
                break
        else:
            node = bvh.skip[node]
    return steps, ptests


def run_ordered(b2, C, R, o, d, seed, shadow):
    bt = seed.copy()
    steps = 0
    ptests = 0
    stack = [0]
    while stack:
        node = stack.pop()
        steps += 1
        lc = b2.leaf_count[node]
        gate = bt > 0
        if shadow:
            gate &= bt >= seed
            if not gate.any():
                break
        if lc > 0:
            for k in range(lc):
                p = b2.order[b2.leaf_start[node] + k]
                ptests += 1
                t = sph_t(C[p], R[p], o, d, bt)
                # candidate accepted only where the node gate holds
                upd = gate & (t < bt)
                bt = np.where(upd, t, bt)
            continue
        li, ri = b2.left[node], b2.right[node]
        nL, fL = slab(b2.bmin[li], b2.bmax[li], o, d)
        nR, fR = slab(b2.bmin[ri], b2.bmax[ri], o, d)
        hL = (nL <= fL) & (fL > 0) & (nL < bt) & gate
        hR = (nR <= fR) & (fR > 0) & (nR < bt) & gate
        aL, aR = hL.any(), hR.any()
        if aL and aR:
            l_first = np.sum(np.where(hL & hR, nR - nL, 0.0)) >= 0
            first, second = (li, ri) if l_first else (ri, li)
            stack.append(second)
            stack.append(first)
        elif aL:
            stack.append(li)
        elif aR:
            stack.append(ri)
    return steps, ptests


def build_sah2(bmin, bmax, leaf_max=4):
    """16-bucket binned SAH sweep, strictly binary."""
    P = bmin.shape[0]
    mids = (bmin + bmax) * 0.5

    nb_min, nb_max = [], []
    left, right, ls, lc = [], [], [], []
    order = []

    def sa(mn, mx):
        dd = np.maximum(mx - mn, 0.0)
        return 2 * (dd[0] * dd[1] + dd[0] * dd[2] + dd[1] * dd[2])

    def emit(idx):
        me = len(left)
        mn = bmin[idx].min(0)
        mx = bmax[idx].max(0)
        nb_min.append(mn)
        nb_max.append(mx)
        left.append(-1)
        right.append(-1)
        ls.append(-1)
        lc.append(0)
        n = len(idx)
        if n <= leaf_max:
            ls[me] = len(order)
            lc[me] = n
            order.extend(idx.tolist())
            return me
        best = (np.inf, None, None)
        for axis in range(3):
            lo, hi = mn[axis], mx[axis]
            if hi - lo < 1e-12:
                continue
            b = np.clip(((mids[idx, axis] - lo) / (hi - lo) * 16).astype(int),
                        0, 15)
            for cut in range(1, 16):
                selL = b < cut
                nl = selL.sum()
                if nl == 0 or nl == n:
                    continue
                li, ri = idx[selL], idx[~selL]
                cost = (sa(bmin[li].min(0), bmax[li].max(0)) * nl
                        + sa(bmin[ri].min(0), bmax[ri].max(0)) * (n - nl))
                if cost < best[0]:
                    best = (cost, li, ri)
        if best[1] is None:
            axis = int(np.argmax(mx - mn))
            srt = np.argsort(mids[idx, axis])
            h = n // 2
            best = (0, idx[srt[:h]], idx[srt[h:]])
        left[me] = emit(best[1])
        right[me] = emit(best[2])
        return me

    sys.setrecursionlimit(100000)
    emit(np.arange(P))
    M = len(left)
    return A.Bvh2(bmin=np.asarray(nb_min), bmax=np.asarray(nb_max),
                  left=np.asarray(left), right=np.asarray(right),
                  leaf_start=np.asarray(ls), leaf_count=np.asarray(lc),
                  order=np.asarray(order), depth=0)


def batch_tiles(o, d, seed):
    T = o.shape[0] // 1024
    for t in range(T):
        s = slice(t * 1024, (t + 1) * 1024)
        yield o[s], d[s], seed[s]


def report(label, fn, tree, C, R, o, d, seed, shadow, ns_node):
    steps = ptests = 0
    T = o.shape[0] // 1024
    for ot, dt_, st_ in batch_tiles(o, d, seed):
        s, p = fn(tree, C, R, ot.astype(np.float64),
                  dt_.astype(np.float64), st_.astype(np.float64), shadow)
        steps += s
        ptests += p
    us = (steps * ns_node + ptests * NS_PRIM) / 1e3 / T
    print(f"  {label:12s} steps/tile={steps/T:7.1f} prims/tile="
          f"{ptests/T:7.1f}  ~{us:6.1f} us/tile", flush=True)
    return us


so, sd, st = dat["so"], dat["sd"], dat["st"]
po, pd = dat["po"], dat["pd"]
pseed = np.full(po.shape[0], 1e6, np.float32)

for gi, C, R in sphere_groups():
    print(f"== group g{gi} P={len(R)} ==", flush=True)
    bmin = C - R[:, None]
    bmax = C + R[:, None]
    cur = A.build_bvh(bmin, bmax)
    b2 = A.build_bvh2(bmin, bmax, leaf_max=4)
    sah = build_sah2(bmin, bmax, leaf_max=4)
    for batch, (o_, d_, s_) in (("shadow", (so, sd, st)),
                                ("primary", (po, pd, pseed))):
        shadow = batch == "shadow"
        print(f" [{batch}]", flush=True)
        report("skip-cur", run_skip, cur, C, R, o_, d_, s_, shadow,
               NS_NODE_SKIP)
        report("bvh2-cur", run_ordered, b2, C, R, o_, d_, s_, shadow,
               NS_NODE_ORD)
        report("bvh2-sah", run_ordered, sah, C, R, o_, d_, s_, shadow,
               NS_NODE_ORD)

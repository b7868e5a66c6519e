"""Work counters: rayint_debug / trace_debug parity.

The reference threads a primitives+boxes-visited count through every
solid as a SEPARATE typeclass method (rayint_debug, Solid.hs:155,205;
Bih.hs:378-412) and renders it as false color (Glome.hs:57-62).  This
module is the same idea in array form: `ray_debug_counts` replays the
compiled scene's intersection STRUCTURE -- dense groups, convex CSG
members, deferred prims with their restricted constraint scans, and
the tile-packet skip-link BVH traversal -- counting per ray:

  prims:  primitive intersection/inside evaluations performed
  nodes:  BVH node boxes slab-tested against the ray's tile

Counts reflect the lockstep execution model this engine actually runs
(a dense group tests every prim against every ray; a BVH tile advances
into a node when ANY live ray hits its box, and every leaf prim is
tested against the whole tile), so the false color is a true map of
where the machine spends work -- the TPU analog of the reference's
boxes-visited heat map.  The Pallas megakernel executes the identical
phase structure at (8, 128)-ray tiles.

`python -m glome_tpu.app --debug` renders prims into red and nodes
into green like the reference's get_color_debug.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import INFINITY
from .intersect import TILE, _kernel_hits2, _slice_params


def ray_debug_counts(compiled, arrays, o, d, scene_id: int = 0,
                     tile: int = TILE):
    """(prims, nodes): (N,) int32 work counters for primary rays."""
    from .compile import materialize_scene_params
    sc = compiled.scenes[scene_id]
    garrs = materialize_scene_params(sc, arrays["scenes"][scene_id])
    garrs = jax.tree.map(jax.lax.stop_gradient, garrs)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    N = o.shape[0]
    prims = jnp.zeros((N,), jnp.int32)
    nodes = jnp.zeros((N,), jnp.int32)

    for gi, g in enumerate(sc.groups):
        if g.size == 0:
            continue
        if g.accel is not None:
            p_add, n_add = _bvh_counts(sc, garrs, gi, o, d, tile)
            prims = prims + p_add
            nodes = nodes + n_add
        elif g.vclass in ("plain", "inline"):
            # dense lockstep: every prim is evaluated for every ray
            prims = prims + g.size
        elif g.vclass == "deferred":
            # candidate test + restricted other-clause membership scans
            from .megakernel import get_plan
            plan = get_plan(compiled)
            scans = 0
            for ph in plan.phases:
                if ph.kind == "deferred" and ph.si == scene_id \
                        and ph.gi == gi:
                    scans += 1 + sum(cm.M for _, ms in (ph.cons or [])
                                     for cm in ms)
                    scans += sum(cm.M for cm in (ph.own or []))
            prims = prims + scans
    for csg in sc.csgs:
        if csg.convex:
            prims = prims + sum(len(idx) for cl in csg.clauses
                                for _, idx in cl.members)
    return prims, nodes


def _bvh_counts(sc, garrs, gi, o, d, tile):
    """Per-ray (prims tested, node boxes hit) through the tile-packet
    skip-link traversal -- the counting twin of intersect.bvh_pass."""
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

    ot, dt_ = tl(o), tl(d, fill=1.0)
    inv_d = 1.0 / jnp.where(dt_ == 0.0, 1e-20, dt_)
    nb_min = jnp.asarray(bvh.bmin)
    nb_max = jnp.asarray(bvh.bmax)
    leaf_count = jnp.asarray(bvh.leaf_count)
    skip = jnp.asarray(bvh.skip)

    def body(state):
        idx, pc, nc = state
        nidx = jnp.clip(idx, 0, M - 1)
        bmin = nb_min[nidx][:, None, :]
        bmax = nb_max[nidx][:, None, :]
        t1 = (bmin - ot) * inv_d
        t2 = (bmax - ot) * inv_d
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        live = idx < M
        hitr = (near <= far) & (far > 0.0) & live[:, None]
        hitb = live & jnp.any(hitr, axis=-1)
        nc = nc + hitr.astype(jnp.int32)
        # leaf prims are charged to the rays whose box test passed (the
        # reference's per-ray rayint_debug semantics; the tile-mates'
        # lockstep ride-along is execution detail, not ray work)
        pc = pc + jnp.where(hitr, leaf_count[nidx][:, None], 0)
        nxt = jnp.where(hitb, idx + 1, skip[nidx])
        return jnp.where(live, nxt, idx), pc, nc

    idx0 = jnp.zeros((T,), jnp.int32)
    z = jnp.zeros((T, K), jnp.int32)
    _, pc, nc = jax.lax.while_loop(
        lambda st: jnp.any(st[0] < M), body, (idx0, z, z))
    return pc.reshape(-1)[:N], nc.reshape(-1)[:N]


def trace_debug_counts(compiled, arrays, o, d, recurs: int = 3,
                       config=None, scene_id: int = 0):
    """Full-trace work counters (trace_debug parity, Trace.hs:86-109):
    per PRIMARY ray, the intersection work of its whole bounce tree --
    each level queue's rayint work, each level's per-light shadow-ray
    work, and the children's subtree counts ascending to their parents
    through the wavefront queue maps exactly like colors do.

    Returns (prims, nodes): (N,) int32."""
    from .config import DELTA, RenderConfig
    from .trace import _light_arrays
    from .trace_wavefront import TILE, WavefrontTracer
    from .vec import vdot, vscaleadd

    cfg = config or RenderConfig(maxdepth=recurs)
    tracer = WavefrontTracer(compiled, cfg)
    lights = compiled.lights
    lpos, lcol, lrad = _light_arrays(compiled, arrays, lights)
    N = o.shape[0]
    dt = o.dtype
    R = max(recurs, 1)

    from .trace_wavefront import _mk_table

    Tq = (N + TILE - 1) // TILE
    Np = Tq * TILE
    tmax = jnp.full((N,), INFINITY, dtype=dt)
    if Np != N:
        pad = Np - N
        o = jnp.concatenate([o, jnp.zeros((pad, 3), dt)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), dt).at[:, 2].set(1.0)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), dt)])
    Q = _mk_table([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                   tmax, jnp.full((Np,), float(scene_id), dt)], Tq)

    levels = []
    overflow = []
    tracer.overflow_labels = []
    for level in range(R):
        Qc = Q.shape[0] * TILE
        co = jnp.stack([Q[:, c].reshape(Qc) for c in range(3)], axis=-1)
        cd = jnp.stack([Q[:, c].reshape(Qc) for c in range(3, 6)],
                       axis=-1)
        ctmax = Q[:, 6].reshape(Qc)
        segs, Qt = tracer._plan(Q.shape[0], level)
        Q, stored = tracer._down_level(arrays, Q, segs, Qt,
                                       level, lights, lpos, lcol,
                                       lrad, overflow)
        # own-queue rayint work (charged only to live rays)
        live = ctmax > 0.0
        qp, qn = ray_debug_counts(compiled, arrays, co, cd, scene_id)
        qp = jnp.where(live, qp, 0)
        qn = jnp.where(live, qn, 0)
        # per-light shadow rayint work (reconstructed preshade rays,
        # Shader.hs:65-80), charged to active shadow lanes
        sh_o = vscaleadd(stored["pos"], stored["norm"], DELTA)
        for li, l in enumerate(lights):
            if not l.shadow:
                continue
            ldir = stored["ldirs"][li]
            lvec = lpos[li] - stored["pos"]
            llen = jnp.sqrt(vdot(lvec, lvec))
            active = (stored["hitmask"]
                      & (vdot(lvec, stored["norm"]) >= 0.0)
                      & (llen <= lrad[li]))
            sp, sn = ray_debug_counts(compiled, arrays, sh_o, ldir,
                                      scene_id)
            qp = qp + jnp.where(active, sp, 0)
            qn = qn + jnp.where(active, sn, 0)
        levels.append((segs, stored, qp, qn))

    # ascend: children's subtree counts flow to parents like colors
    Qdeep = Q.shape[0] * TILE
    up_p = jnp.zeros((Qdeep,), jnp.int32)
    up_n = jnp.zeros((Qdeep,), jnp.int32)
    for segs, stored, qp, qn in reversed(levels):
        tot_p, tot_n = qp, qn
        cn2 = jnp.stack([up_p, up_n], axis=-1)
        # queue segments are laid out in 128-lane ROW units
        from .trace_wavefront import ROW
        cn2t = cn2.reshape(cn2.shape[0] // ROW, ROW * 2)
        for key, offt, capt in segs:
            inv = stored["inv"][key]
            mask = stored["mask"][key]
            rows = jnp.take(cn2t, offt + jnp.maximum(inv, 0), axis=0,
                            mode='clip').reshape(-1, 2)
            has = mask & jnp.repeat(inv >= 0, ROW)
            tot_p = tot_p + jnp.where(has, rows[:, 0], 0)
            tot_n = tot_n + jnp.where(has, rows[:, 1], 0)
        up_p, up_n = tot_p, tot_n
    return up_p[:N], up_n[:N]


def debug_image(compiled, arrays, cam, xres: int, yres: int,
                scene_id: int = 0, full: bool = False, recurs: int = 3):
    """(H, W, 3) false-color work map: prims -> red, nodes -> green,
    normalized to the 99th percentile (Glome.hs:57-62 spirit)."""
    from .render import Renderer, tile_order
    from .config import RenderConfig
    from .trace import Tracer
    r = Renderer(Tracer(compiled, RenderConfig(xres=xres, yres=yres)),
                 cam, RenderConfig(xres=xres, yres=yres))
    ys, xs = np.mgrid[0:yres, 0:xres]
    perm = tile_order(xres, yres)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    o, d = r.rays_for_pixels(xs.reshape(-1)[perm].astype(np.float32),
                             ys.reshape(-1)[perm].astype(np.float32))
    if full:
        fn = jax.jit(lambda a, o_, d_: trace_debug_counts(
            compiled, a, o_, d_, recurs=recurs, scene_id=scene_id))
    else:
        fn = jax.jit(lambda a, o_, d_: ray_debug_counts(
            compiled, a, o_, d_, scene_id))
    prims, nodes = fn(arrays, o, d)
    prims = np.asarray(prims)[inv].reshape(yres, xres).astype(np.float64)
    nodes = np.asarray(nodes)[inv].reshape(yres, xres).astype(np.float64)
    img = np.zeros((yres, xres, 3))
    img[..., 0] = prims / max(np.percentile(prims, 99.0), 1.0)
    img[..., 1] = nodes / max(np.percentile(nodes, 99.0), 1.0)
    return np.clip(img, 0.0, 1.0), prims, nodes

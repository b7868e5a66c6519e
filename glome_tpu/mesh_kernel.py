"""Two-level block-BVH intersection for giant flat-prim groups.

dense_intersect streams the ENTIRE parameter table past every ray tile
(Pallas prefetches each grid block whether or not the kernel uses it),
so a 100k-triangle mesh costs n_ray_tiles x 7.2 MB of HBM traffic per
query -- measured 8.1 s/frame at 1080p.  This kernel inverts control:

  - triangles are grouped into BP-wide blocks (Morton order, so blocks
    are spatially compact) with a skip-link BVH built OVER THE BLOCKS
    (accel.build_bvh); the block-BVH node tables live in SMEM
    (100k tris -> ~780 blocks -> ~12 KB of nodes);
  - the triangle table stays in HBM (memory_space ANY); each ray tile
    walks the block BVH and DMAs ONLY the leaf blocks its rays can
    reach into a VMEM scratch buffer (pltpu.make_async_copy), testing
    BP triangles per block against the whole tile in the dense
    (rays-down-sublanes x prims-across-lanes) layout;
  - the running best-t culls farther nodes, and the shadow variant
    stops a tile as soon as every ray found a blocker.

HBM traffic becomes (visited blocks) x 4.6-9.2 KB per tile instead of
the whole table, which is the same asymptotic win the reference gets
from its mesh BVH (Mesh.hs:136-198) -- re-expressed for a machine that
wants block-granular DMA instead of per-ray pointer chasing.

Flat prims only (triangle/trianglenorm): their exit crossing is always
a miss, so the winner needs no entry/exit slot bit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import INFINITY
from .pallas_kernels import FIELDS, _T_KERNELS, pack_params_rows

INF = INFINITY

BN = 1024        # rays per tile
BP = 128         # tris per block (one lane row)
BLOCK_LEAF_MAX = 4   # blocks per block-BVH leaf


class MeshBlockPlan:
    """Host-side static plan for one group: block BVH + permutations."""

    def __init__(self, g):
        from . import accel as A
        P = g.size
        self.ptype = g.ptype
        self.F = sum(w for _, w in FIELDS[g.ptype])
        self.n_blocks = (P + BP - 1) // BP
        bmin, bmax = A.group_bounds(g)
        padP = self.n_blocks * BP - P
        if padP:
            # padded bounds collapse to the last prim's box (harmless:
            # padded param rows are degenerate and never hit)
            bmin = np.concatenate([bmin, np.repeat(bmin[-1:], padP, 0)])
            bmax = np.concatenate([bmax, np.repeat(bmax[-1:], padP, 0)])
        blk_min = bmin.reshape(self.n_blocks, BP, 3).min(axis=1)
        blk_max = bmax.reshape(self.n_blocks, BP, 3).max(axis=1)
        bvh = A.build_bvh(blk_min, blk_max, leaf_max=BLOCK_LEAF_MAX)
        self.block_order = np.asarray(bvh.order, np.int32)  # perm of blocks
        self.nf = np.concatenate(
            [np.asarray(bvh.bmin, np.float32),
             np.asarray(bvh.bmax, np.float32)], axis=1).reshape(-1)
        self.ni = np.stack(
            [np.asarray(bvh.skip, np.int32),
             np.asarray(bvh.leaf_start, np.int32),
             np.asarray(bvh.leaf_count, np.int32)], axis=1).reshape(-1)
        self.n_nodes = bvh.n_nodes
        # permuted-tri-slot -> group-local prim index (for the winner),
        # and the row gather that builds the permuted block table
        self.row_perm = (np.repeat(self.block_order * BP, BP)
                         + np.tile(np.arange(BP, dtype=np.int32),
                                   self.n_blocks))
        self.sel_to_local = np.where(self.row_perm < P, self.row_perm, -1)
        self.padP = padP


def get_block_plan(g) -> MeshBlockPlan:
    plan = getattr(g, "_block_plan", None)
    if plan is None:
        plan = MeshBlockPlan(g)
        g._block_plan = plan
    return plan


def pack_tri_blocks(plan: MeshBlockPlan, params):
    """(n_blocks, F, BP) f32 triangle table in BVH block order (device,
    built under the caller's stop_gradient)."""
    rows = pack_params_rows(plan.ptype, params)           # (P, F)
    if plan.padP:
        rows = jnp.concatenate(
            [rows, jnp.zeros((plan.padP, rows.shape[1]), rows.dtype)])
    rows = rows[plan.row_perm]
    return rows.reshape(plan.n_blocks, BP, plan.F).transpose(0, 2, 1)


def mesh_block_select(plan: MeshBlockPlan, tri_blocks, o, d, seed_t,
                      shadow: bool = False,
                      interpret: Optional[bool] = None, rays6=None):
    """(t, sel): nearest triangle of the block-BVH'd group per ray.
    sel indexes the PERMUTED tri table (map through plan.sel_to_local);
    -1 where nothing beat seed_t."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rays6 is not None:
        N = rays6.shape[1]
        assert N % BN == 0
        T = N // BN
        rays8 = jnp.concatenate(
            [rays6, seed_t[None], jnp.zeros_like(seed_t)[None]])
    else:
        N = o.shape[0]
        T = pl.cdiv(N, BN)
        pad = T * BN - N
        rays8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2],
                           seed_t, jnp.zeros_like(seed_t)])
        if pad:
            fill = jnp.zeros((8, pad), rays8.dtype).at[5].set(1.0)
            rays8 = jnp.concatenate([rays8, fill], axis=1)

    M = plan.n_nodes
    F = plan.F
    tker = _T_KERNELS[plan.ptype]

    def kernel(rays_ref, nf_ref, ni_ref, tri_ref, out_t, out_l,
               scratch, sem):
        def rrow(idx):
            return rays_ref[idx:idx + 1, :].reshape(BN, 1)

        ox, oy, oz = rrow(0), rrow(1), rrow(2)
        dx, dy, dz = rrow(3), rrow(4), rrow(5)
        seed = rrow(6)
        ivx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)

        def leaf_blocks(args):
            bt, bl, hitm, ls, lc = args

            def blk_body(k, carry):
                bt, bl = carry
                b = ls + jnp.minimum(k, lc - 1)
                dma = pltpu.make_async_copy(tri_ref.at[b],
                                            scratch.at[0], sem.at[0])
                dma.start()
                dma.wait()

                def p(idx):
                    return scratch[0, idx:idx + 1, :]       # (1, BP)

                t0, t1 = tker(p, ox, oy, oz, dx, dy, dz)
                ok = hitm & (k < lc)
                v0 = ok & (t0 > 0.0) & (t0 < bt)
                v1 = ok & (t1 > 0.0) & (t1 < bt)
                tc = jnp.where(v0, t0, jnp.where(v1, t1, INF))
                tbest = jnp.min(tc, axis=-1, keepdims=True)  # (BN, 1)
                arg = jnp.argmin(tc, axis=-1).astype(jnp.int32)[:, None]
                better = tbest < bt
                bl = jnp.where(better, arg + b * BP, bl)
                return jnp.where(better, tbest, bt), bl

            bt, bl = jax.lax.fori_loop(0, BLOCK_LEAF_MAX, blk_body,
                                       (bt, bl))
            return bt, bl

        def step(st):
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
            hitm = (near <= far) & (far > 0.0) & (near < bt)
            if shadow:
                # any-hit: dead lanes (seed <= 0, the tile-compacted
                # queues' masked rays) and already-blocked lanes must
                # not pull the tile through more geometry
                hitm = hitm & (seed > 0.0) & (bt >= seed)
            anyhit = jnp.any(hitm)
            nib = node * 3
            lc = ni_ref[nib + 2]
            ls = ni_ref[nib + 1]
            bt, bl = jax.lax.cond(anyhit & (lc > 0), leaf_blocks,
                                  lambda a: (a[0], a[1]),
                                  (bt, bl, hitm, ls, lc))
            nxt = jnp.where(anyhit, node + 1, ni_ref[nib])
            if shadow:
                undone = (seed > 0.0) & (bt >= seed)
                nxt = jnp.where(jnp.any(undone), nxt, M)
            return nxt, bt, bl

        bt = seed
        bl = jnp.full((BN, 1), -1, jnp.int32)
        _, bt, bl = jax.lax.while_loop(
            lambda st: st[0] < M, step, (jnp.int32(0), bt, bl))
        out_t[:] = bt.reshape(1, BN)
        out_l[:] = jnp.where(bt < seed, bl, -1).reshape(1, BN)

    in_specs = [
        pl.BlockSpec((8, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    rdt = rays6.dtype if rays6 is not None else o.dtype
    out_shape = (jax.ShapeDtypeStruct((1, T * BN), rdt),
                 jax.ShapeDtypeStruct((1, T * BN), jnp.int32))
    out_specs = (pl.BlockSpec((1, BN), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, BN), lambda i: (0, i),
                              memory_space=pltpu.VMEM))
    bt, bl = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, F, BP), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
        interpret=interpret,
    )(rays8, jnp.asarray(plan.nf), jnp.asarray(plan.ni), tri_blocks)
    return bt.reshape(-1)[:N], bl.reshape(-1)[:N]


def mesh_block_pass(sc, garrs, gi, o, d, seed_t, shadow: bool,
                    interpret: Optional[bool] = None, rays6=None):
    """dense_pass-compatible wrapper: (t, group-local winner)."""
    g = sc.groups[gi]
    plan = get_block_plan(g)
    sg = jax.lax.stop_gradient
    ga = {k: sg(jnp.asarray(v)) for k, v in garrs[gi].items()
          if k not in ("m_inv", "m_fwd")}
    tri = pack_tri_blocks(plan, ga)
    t, sel = mesh_block_select(
        plan, tri,
        None if rays6 is not None else sg(o),
        None if rays6 is not None else sg(d),
        sg(seed_t), shadow=shadow, interpret=interpret,
        rays6=None if rays6 is None else sg(rays6))
    local = jnp.asarray(plan.sel_to_local)[jnp.maximum(sel, 0)]
    return t, jnp.where(sel >= 0, local, -1)

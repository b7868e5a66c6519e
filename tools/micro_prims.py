"""Microbenchmarks for megakernel traversal design constants.

Measures, per (8,128)-ray tile on the real chip:
  a. while-loop step with one any()-vote (the bvh2-style sync chain)
  b. dense SMEM-broadcast sphere tests (fori, no decisions)
  c. same with a lax.cond any()-gate every LEAF prims
  d. packed-bit readout: OR-pack a (8,128) lane mask into 21-bit words,
     one drain, then a scalar bit-loop over 128 entries
  e. lane-parallel dense sphere block: 128 spheres across lanes per
     step via an (F, 8, 128) VMEM table (zero scalar involvement)

These constants decide leaf width, sync amortization, and whether a
frustum-culled fixed-order walk beats the per-node-vote stack walk.

Usage: python tools/micro_prims.py
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from tools.tpu_time import device_time

T = 256          # tiles
P = 1024         # spheres
STEPS = 256      # while-loop steps for (a)

rng = np.random.default_rng(0)
rays = rng.normal(size=(8, T, 8, 128)).astype(np.float32)
rays[6] = 1e6  # seed t
# sphere params laid row-major [cx cy cz r2]
pf = rng.normal(size=(P * 4,)).astype(np.float32)
pf[3::4] = 0.05
# lane-table: (4, 8, 128) -> 8*128=1024 spheres, field-major
pf_lane = pf.reshape(P, 4).T.reshape(4, 8, 128).copy()

rays_d = jax.device_put(jnp.asarray(rays))
pf_d = jax.device_put(jnp.asarray(pf))
pf_lane_d = jax.device_put(jnp.asarray(pf_lane))


def sph(f, ox, oy, oz, dx, dy, dz):
    ex = f(0) - ox
    ey = f(1) - oy
    ez = f(2) - oz
    v = ex * dx + ey * dy + ez * dz
    disc = f(3) - (ex * ex + ey * ey + ez * ez - v * v)
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = jnp.where(ok, v - sq, 1e6)
    t1 = jnp.where(ok, v + sq, 1e6)
    return t0, t1


def common(rays_ref):
    rc = lambda c: rays_ref[c, 0]
    return rc(0), rc(1), rc(2), rc(3), rc(4), rc(5), rc(6)


def mk(kernel, extra=(), scratch=()):
    def run(rays, *args):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=s) for s in extra],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
            scratch_shapes=list(scratch),
        )(rays, *args)
    return run


# --- a: while loop with per-step any() vote --------------------------------
def k_vote(rays_ref, pf_ref, out):
    ox, oy, oz, dx, dy, dz, seed = common(rays_ref)

    def step(st):
        i, bt = st
        f = lambda q: pf_ref[(i % P) * 4 + q]
        t0, t1 = sph(f, ox, oy, oz, dx, dy, dz)
        bt = jnp.minimum(bt, jnp.where(t0 > 0, t0, t1))
        nxt = jnp.where(jnp.any(t0 < bt), i + 1, i + 2)
        return nxt, bt

    _, bt = jax.lax.while_loop(lambda st: st[0] < STEPS, step,
                               (jnp.int32(0), seed))
    out[0] = bt


# --- b: dense fori over P prims, no decisions ------------------------------
def k_dense(rays_ref, pf_ref, out):
    ox, oy, oz, dx, dy, dz, seed = common(rays_ref)

    def step(p, bt):
        f = lambda q: pf_ref[p * 4 + q]
        t0, t1 = sph(f, ox, oy, oz, dx, dy, dz)
        return jnp.minimum(bt, jnp.where(t0 > 0, t0, t1))

    out[0] = jax.lax.fori_loop(0, P, step, seed)


# --- c: dense with an any-gate every LEAF prims ----------------------------
def mk_gated(LEAF):
    def k_gated(rays_ref, pf_ref, out):
        ox, oy, oz, dx, dy, dz, seed = common(rays_ref)

        def leaf(l, bt):
            def body(bt):
                def step(k, bt):
                    f = lambda q: pf_ref[(l * LEAF + k) * 4 + q]
                    t0, t1 = sph(f, ox, oy, oz, dx, dy, dz)
                    return jnp.minimum(bt, jnp.where(t0 > 0, t0, t1))
                return jax.lax.fori_loop(0, LEAF, step, bt)
            return jax.lax.cond(jnp.any(bt > 0.05 * l), body,
                                lambda b: b, bt)

        out[0] = jax.lax.fori_loop(0, P // LEAF, leaf, seed)
    return k_gated


# --- d: packed-bit readout + scalar bit loop --------------------------------
def k_bits(rays_ref, pf_ref, out, sref):
    ox, oy, oz, dx, dy, dz, seed = common(rays_ref)
    # pretend lane l holds leaf l's hit flag
    lane = jax.lax.broadcasted_iota(jnp.float32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.float32, (8, 128), 0)
    hit = (ox + dx) > 0.0
    # pack 21 lanes per word: word w = sum over lanes of bit<<k
    k21 = jnp.mod(lane, 21.0)
    w6 = jnp.floor(lane / 21.0) + sub * 7.0   # word id 0..55
    val = jnp.where(hit, jnp.exp2(k21), 0.0)
    # reduce into 64 words: one-hot matmul (8,128)x(128? ) -- cheap path:
    # sum over groups via segment trick: multiply by indicator per word
    acc = []
    for w in range(8):          # read 8 words only (microbench scale)
        s = jnp.sum(jnp.where(w6 == float(w), val, 0.0))
        acc.append(s)
    for w in range(8):
        sref[w] = acc[w]
    bt = seed
    # scalar bit loop over 8*21 = 168 leaf bits
    def word(w, bt):
        def bit(k, st):
            wv, bt = st
            half = jnp.floor(wv / 2.0)
            is_set = wv - 2.0 * half
            f = lambda q: pf_ref[(w * 21 + k) * 4 + q]

            def body(bt):
                t0, t1 = sph(f, ox, oy, oz, dx, dy, dz)
                return jnp.minimum(bt, jnp.where(t0 > 0, t0, t1))
            bt = jax.lax.cond(is_set > 0.5, body, lambda b: b, bt)
            return half, bt
        _, bt = jax.lax.fori_loop(0, 21, bit, (sref[w], bt))
        return bt
    out[0] = jax.lax.fori_loop(0, 8, word, bt)


# --- e: lane-parallel dense block -------------------------------------------
def k_lane(rays_ref, pfl_ref, out):
    ox, oy, oz, dx, dy, dz, seed = common(rays_ref)
    # test ray LANE against sphere LANE?  No: test the whole tile against
    # 1024 spheres, one (8,128) block of spheres per ray ... a ray is a
    # lane; spheres also lanes.  True dense needs (rays x prims); here we
    # measure the pure VPU cost shape: for each of 8 sphere sub-blocks
    # (128 spheres in lanes), min-reduce over the block then lane-reduce.
    bt = seed
    for sb in range(8):
        cx = pfl_ref[0, sb]
        cy = pfl_ref[1, sb]
        cz = pfl_ref[2, sb]
        r2 = pfl_ref[3, sb]
        # NOTE this is sphere-lane vs ray-lane (not all-pairs); measures
        # per-op cost of the layout, not the algorithm
        ex = cx - ox
        ey = cy - oy
        ez = cz - oz
        v = ex * dx + ey * dy + ez * dz
        disc = r2 - (ex * ex + ey * ey + ez * ez - v * v)
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = jnp.where(ok, v - sq, 1e6)
        bt = jnp.minimum(bt, t0)
    out[0] = bt


# --- f: all-pairs MXU block: (1024 rays) x (128 spheres) -------------------
def k_mxu(rays_ref, pfl_ref, out):
    ox, oy, oz, dx, dy, dz, seed = common(rays_ref)
    # features per ray: rows (1024, 8): [dx dy dz ox oy oz 1 pad]
    rd = jnp.stack([dx, dy, dz, ox, oy, oz, jnp.ones_like(ox),
                    jnp.zeros_like(ox)], axis=-1).reshape(1024, 8)
    bt = seed.reshape(1024, 1)
    for sb in range(1):         # one 128-sphere block per step
        c = jnp.stack([pfl_ref[0, sb], pfl_ref[1, sb], pfl_ref[2, sb]],
                      axis=0).reshape(3, 128)
        feat = jnp.concatenate([
            c,                                    # d.c terms
            -c * 0.0, jnp.zeros((2, 128))], axis=0)  # pad to 8 rows
        vm = jnp.dot(rd, feat, preferred_element_type=jnp.float32)
        # epilogue approx: a few (1024,128) VPU ops
        disc = vm * vm - 0.05
        t0 = vm - jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = jnp.where(disc >= 0.0, t0, 1e6)
        bt = jnp.minimum(bt, jnp.min(t0, axis=1, keepdims=True))
    out[0] = bt.reshape(8, 128)


runs = {
    "a_vote_while":   (mk(k_vote, extra=[pltpu.SMEM]), (pf_d,), STEPS),
    "b_dense_fori":   (mk(k_dense, extra=[pltpu.SMEM]), (pf_d,), P),
    "c_gate8":        (mk(mk_gated(8), extra=[pltpu.SMEM]), (pf_d,), P),
    "c_gate16":       (mk(mk_gated(16), extra=[pltpu.SMEM]), (pf_d,), P),
    "c_gate32":       (mk(mk_gated(32), extra=[pltpu.SMEM]), (pf_d,), P),
    "d_bits168":      (mk(k_bits, extra=[pltpu.SMEM],
                          scratch=[pltpu.SMEM((8,), jnp.float32)]),
                       (pf_d,), 168),
    "e_lane8x128":    (mk(k_lane, extra=[pltpu.VMEM]), (pf_lane_d,), P),
    "f_mxu128":       (mk(k_mxu, extra=[pltpu.VMEM]), (pf_lane_d,), 128),
}

for name, (fn, args, units) in runs.items():
    try:
        def step(p, fn=fn, args=args):
            return jnp.mean(fn(rays_d + p * 1e-6, *args))
        ms = device_time(step, verbose=None)
        per = ms * 1e6 / T / units
        print(f"{name:14s} {ms:8.3f} ms  {per:8.1f} ns/unit/tile")
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:160]}")

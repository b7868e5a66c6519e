"""Measure the XLA layout/glue ops that dominate the non-kernel half
of the frame (~35 ms in the round-4 trace): reshapes between (N,),
(Tq,TILE), (T,8,128); (N,3) column extracts; row gathers; transposes.

Usage: python tools/micro_layout.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.tpu_time import device_time

N = 345600 * 2  # ~L0 shadow batch width
T = N // 1024
W = 45
P = 8192

rng = np.random.default_rng(0)
flat = jax.device_put(jnp.asarray(rng.normal(size=(N,)).astype(np.float32)))
tiles = jax.device_put(jnp.asarray(
    rng.normal(size=(T, 8, 128)).astype(np.float32)))
n3 = jax.device_put(jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)))
tab = jax.device_put(jnp.asarray(
    rng.normal(size=(P, W)).astype(np.float32)))
idx_flat = jax.device_put(jnp.asarray(
    rng.integers(0, P, size=(N,)).astype(np.int32)))
idx_tiles = jax.device_put(idx_flat.reshape(T, 8, 128))
tidx = jax.device_put(jnp.asarray(
    rng.integers(0, T, size=(T // 2,)).astype(np.int32)))
nw = jax.device_put(jnp.asarray(
    rng.normal(size=(N, W)).astype(np.float32)))

cases = {
    "reshape_flat_to_t88": lambda p: (flat + p).reshape(T, 8, 128),
    "reshape_t88_to_flat": lambda p: (tiles + p).reshape(N),
    "reshape_flat_to_TqTILE": lambda p: (flat + p).reshape(T, 1024),
    "col_extract_n3": lambda p: (n3 + p)[:, 0] + (n3 + p)[:, 1],
    "stack3_from_flat": lambda p: jnp.stack(
        [flat + p, flat + p * 2, flat + p * 3]),
    "gather_rows_NW_flatidx": lambda p: (tab + p)[idx_flat],
    "gather_rows_NW_tileidx": lambda p: (tab + p)[idx_tiles],
    "tile_take_t88": lambda p: jnp.take(tiles + p, tidx, axis=0),
    "tile_take_TqTILE": lambda p: jnp.take(
        (flat + p).reshape(T, 1024), tidx, axis=0),
    "transpose_NW_to_WN": lambda p: (nw + p).T,
    "slice_rows_WN": lambda p: sum(jnp.sum((nw + p).T[w]) for w in range(6)),
}

for name, fn in cases.items():
    def step(p, fn=fn):
        out = fn(p * 1e-6)
        return jnp.sum(out) * 1e-12 + p
    try:
        sec = device_time(step, verbose=None)
        print(f"{name:26s} {sec*1e3:8.3f} ms")
    except Exception as e:
        print(f"{name:26s} FAILED {type(e).__name__}: {str(e)[:120]}")

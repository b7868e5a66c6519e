"""Trustworthy device timing over the TPU relay.

The relay memoizes repeated executions, returns from block_until_ready
before work completes in some paths, and charges ~90 ms of host round
trip per dispatch -- so naive wall-clock timing of jitted calls is
meaningless (it produced numbers from 0.1 ms to 2.7 s for the same
program).  The only robust scheme found: run the workload as a chained
fori_loop INSIDE one executable (iteration i+1's input depends on
iteration i's output, so nothing can be skipped, cached, or
overlapped), with a *dynamic* trip count, and report the difference
between a long and a short chain -- fixed dispatch/transfer overhead
cancels.  Agreement across reps is typically 0.1%.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain_timer(step):
    """step: scalar f32 -> scalar f32 (must route the scalar through the
    workload's inputs and fold the outputs back into a scalar).
    Returns timed(n) -> wall seconds for a chain of n steps."""

    @jax.jit
    def run(p0, n):
        return jax.lax.fori_loop(0, n, lambda i, p: step(p), p0)

    def timed(p0, n):
        t0 = time.time()
        jax.block_until_ready(run(jnp.float32(p0), jnp.int32(n)))
        return time.time() - t0

    return timed


def device_time(step, n_long=9, n_short=1, reps=2, warmup=True,
                verbose=None):
    """Median per-iteration device seconds of `step` (see chain_timer)."""
    timed = chain_timer(step)
    if warmup:
        t0 = time.time()
        timed(0.0, n_short)
        if verbose:
            print(f"# {verbose}: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
    dts = []
    for r in range(reps):
        ts = timed(1e-3 * (2 * r + 1), n_short)
        tl = timed(1e-3 * (2 * r + 2), n_long)
        dts.append((tl - ts) / (n_long - n_short))
    dts.sort()
    out = dts[len(dts) // 2]
    if verbose:
        print(f"# {verbose}: {out*1e3:.2f} ms/iter  (spread "
              f"{dts[0]*1e3:.2f}..{dts[-1]*1e3:.2f})", flush=True)
    return out

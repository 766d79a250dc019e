"""Probes for the binned element-engine redesign (round 2).

The design: expand products into per-C-row padded segments (rows binned by
product count), then BATCHED short-row sorts replace one global sort
(log2(S)^2 substeps instead of log2(45M)^2).  Feasibility hinges on:
  1. XLA batched sort rate on (NSEG, S) for S in {64, 256, 1024, 4096}
  2. row-granular gather (take) of 2M rows from class tables
  3. row-granular scatter of 2M rows into a padded layout
  4. fused take-then-scatter
  5. small-N sort (the 2M A-element plan sort)
  6. segmented ops along axis -1 of the padded layout (dedup scans)

Run: python scripts/microbench5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pem_spgemm_tpu.utils.timing import force_sync

NTOT = 63_000_000        # padded product stream scale
NA = 2_000_000           # A elements


def timeit(label, fn, *args, n=NTOT, reps=3):
    out = fn(*args)
    force_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force_sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:55s} {best*1e3:9.2f} ms  ({n/best/1e9:.2f} Gelem/s)",
          flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)

    for S in ():
        nseg = NTOT // S
        k2 = jax.random.randint(key, (nseg, S), 0, 1 << 20, dtype=jnp.int32)
        v2 = jnp.ones((nseg, S), jnp.float32)
        timeit(f"batched sort 2op ({nseg}x{S})",
               jax.jit(lambda k, v: lax.sort((k, v), num_keys=1,
                                             dimension=1)), k2, v2)

    # row gather: 2M rows from class tables of width L
    for L in ():
        nrows = 500_000
        table_k = jax.random.randint(key, (nrows, L), 0, 1 << 20,
                                     dtype=jnp.int32)
        idx = jax.random.randint(key, (NA,), 0, nrows, dtype=jnp.int32)
        timeit(f"row take (2M rows from 500Kx{L})",
               jax.jit(lambda t, i: t[i]), table_k, idx, n=NA * L)

    # row scatter: 2M rows of width L into a 63M-slot padded layout
    for L in (16, 64):
        nslots = max(NTOT // L, 2 * NA)
        rows = jax.random.randint(key, (NA, L), 0, 100, dtype=jnp.int32)
        dst = jax.random.permutation(key, nslots)[:NA].astype(jnp.int32)
        timeit(f"row scatter (2M x{L} rows into {nslots} slots)",
               jax.jit(lambda r, d: jnp.zeros((nslots, L), jnp.int32)
                       .at[d].set(r, mode="drop", unique_indices=True)),
               rows, dst, n=NA * L)

    # fused take->scatter
    L = 64
    nrows = 500_000
    nslots = max(NTOT // L, 2 * NA)
    table_k = jax.random.randint(key, (nrows, L), 0, 1 << 20, dtype=jnp.int32)
    src = jax.random.randint(key, (NA,), 0, nrows, dtype=jnp.int32)
    dst = jax.random.permutation(key, nslots)[:NA].astype(jnp.int32)
    timeit("take+scatter fused (2M x64 rows)",
           jax.jit(lambda t, s, d: jnp.zeros((nslots, L), jnp.int32)
                   .at[d].set(t[s], mode="drop", unique_indices=True)),
           table_k, src, dst, n=NA * L)

    # plan-scale sort (A elements, 3 operands)
    ka = jax.random.randint(key, (NA,), 0, 1 << 30, dtype=jnp.int32)
    pa = jnp.arange(NA, dtype=jnp.int32)
    va = jnp.ones((NA,), jnp.float32)
    timeit("sort 3op 2M (plan scale)",
           jax.jit(lambda k, p, v: lax.sort((k, p, v), num_keys=1)),
           ka, pa, va, n=NA)

    # dedup along axis -1 of padded layout (boundary flags + 6-round
    # log-shift segsum)
    S = 64
    nseg = NTOT // S
    k2 = jnp.sort(jax.random.randint(key, (nseg, S), 0, 1 << 10,
                                     dtype=jnp.int32), axis=1)
    v2 = jnp.ones((nseg, S), jnp.float32)

    @jax.jit
    def dedup(k, v):
        first = jnp.concatenate(
            [jnp.ones((k.shape[0], 1), jnp.bool_), k[:, 1:] != k[:, :-1]],
            axis=1)
        last = jnp.concatenate(
            [k[:, 1:] != k[:, :-1], jnp.ones((k.shape[0], 1), jnp.bool_)],
            axis=1)
        f = last[:, ::-1]
        s = v[:, ::-1]
        for r in range(6):
            sh = 1 << r
            s_sh = jnp.pad(s, ((0, 0), (sh, 0)))[:, :-sh]
            f_sh = jnp.pad(f, ((0, 0), (sh, 0)), constant_values=True)[:, :-sh]
            s = s + jnp.where(f, 0.0, s_sh)
            f = f | f_sh
        return first, s[:, ::-1], jnp.sum(first.astype(jnp.int32))

    timeit("dedup+segsum rows (63M, S=64)", dedup, k2, v2)

    # global cumsum on 2D layout (out_id): flatten cost check
    timeit("cumsum i32 63M", jax.jit(lambda x: jnp.cumsum(
        x.reshape(-1), dtype=jnp.int32)), k2)


if __name__ == "__main__":
    main()

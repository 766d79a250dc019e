"""Round-2 primitive probes on the real chip (element-engine redesign).

Questions this answers (extends scripts/microbench3.py's cost model):
  1. lax.sort cost vs operand count and key width (is payload packing worth it?)
  2. int64 vs int32 cumsum rate (delta-scatter fills need int64)
  3. lax.cummax / associative alternatives rate
  4. scatter-set/add rate at 2M updates into 45M (the fill scatters)
  5. 45M scalar gather (for reference — should stay off the hot path)

Run: python scripts/microbench4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pem_spgemm_tpu.utils.timing import force_sync

N = 45_000_000
M = 2_000_000


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    force_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force_sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:55s} {best*1e3:9.2f} ms  ({N/best/1e9:.2f} Gelem/s)", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    k32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    k64 = k32.astype(jnp.int64) << 10
    p32 = jnp.arange(N, dtype=jnp.int32)
    p64 = jnp.arange(N, dtype=jnp.int64)
    f32 = jnp.ones((N,), jnp.float32)
    perm = jax.random.permutation(key, N).astype(jnp.int32)

    print(f"N={N/1e6:.0f}M  M={M/1e6:.0f}M")
    timeit("sort 1op (k32)", jax.jit(lambda k: lax.sort((k,), num_keys=1)), k32)
    timeit("sort 2op (k32, p32)",
           jax.jit(lambda k, p: lax.sort((k, p), num_keys=1)), k32, p32)
    timeit("sort 2op (k32, p64)",
           jax.jit(lambda k, p: lax.sort((k, p), num_keys=1)), k32, p64)
    timeit("sort 2op (k64, p32)",
           jax.jit(lambda k, p: lax.sort((k, p), num_keys=1)), k64, p32)
    timeit("sort 3op (k32, p32, f32)",
           jax.jit(lambda k, a, b: lax.sort((k, a, b), num_keys=1)),
           k32, p32, f32)
    timeit("sort 4op (k32, p32, f32, p32)",
           jax.jit(lambda k, a, b, c: lax.sort((k, a, b, c), num_keys=1)),
           k32, p32, f32, p32)
    timeit("sort 2key (k32, k32, f32)",
           jax.jit(lambda k, a, b: lax.sort((k, a, b), num_keys=2)),
           k32, p32 % 997, f32)
    timeit("sort 2op PRESORTED key (p32, f32)",
           jax.jit(lambda k, b: lax.sort((k, b), num_keys=1)), p32, f32)

    timeit("cumsum i32", jax.jit(lambda x: jnp.cumsum(x, dtype=jnp.int32)), k32)
    timeit("cumsum i64", jax.jit(lambda x: jnp.cumsum(x)), k64)
    timeit("cummax i32", jax.jit(lambda x: lax.cummax(x)), k32)
    timeit("cumsum f32", jax.jit(lambda x: jnp.cumsum(x)), f32)

    idx_sorted = jnp.sort(jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))
    upd32 = jnp.ones((M,), jnp.int32)
    upd64 = jnp.ones((M,), jnp.int64)

    def scat32(i, u):
        return jnp.zeros((N,), jnp.int32).at[i].add(u, mode="drop")

    def scat64(i, u):
        return jnp.zeros((N,), jnp.int64).at[i].add(u, mode="drop")

    def scat32_sorted(i, u):
        return jnp.zeros((N,), jnp.int32).at[i].add(
            u, mode="drop", indices_are_sorted=True, unique_indices=True)

    timeit("scatter-add 2M->45M i32", jax.jit(scat32), idx_sorted, upd32)
    timeit("scatter-add 2M->45M i32 sorted-hint", jax.jit(scat32_sorted),
           idx_sorted, upd32)
    timeit("scatter-add 2M->45M i64", jax.jit(scat64), idx_sorted, upd64)

    small = jnp.arange(M, dtype=jnp.int32)
    gidx = jax.random.randint(key, (N,), 0, M, dtype=jnp.int32)
    timeit("gather 45M from 2M i32", jax.jit(lambda t, i: t[i]), small, gidx)

    # permutation apply via sort vs via scatter
    timeit("apply perm via .at[].set (45M)",
           jax.jit(lambda p, v: jnp.zeros((N,), jnp.int32).at[p].set(v)),
           perm, k32)


if __name__ == "__main__":
    main()

"""Trustworthy device-side microbenchmarks.

Method: each op runs in a fori_loop whose carry is the FULL output array
(feed-forward dependency, no scalar slicing XLA could simplify through),
and the per-op time is the SLOPE between iters=2 and iters=10 runs, which
cancels dispatch/transfer constants.  Outputs are checksummed on the host
so results cannot be dead-code-eliminated.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax import lax

I1, I2 = 2, 10


def _force(o):
    """block_until_ready does not reliably block on the tunnel platform;
    a host read of a reduction is the only trustworthy sync."""
    return float(jnp.sum(jnp.ravel(jnp.asarray(o, jnp.float32))[:4096]))


def slope(run, *args, n=4):
    """run(iters, *args) -> array. Returns sec/iter via two-point slope."""
    _force(run(I1, *args))
    _force(run(I2, *args))
    t1 = []
    t2 = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(I1, *args))
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force(run(I2, *args))
        t2.append(time.perf_counter() - t0)
    return max(1e-9, (min(t2) - min(t1)) / (I2 - I1))


def report(name, sec, work, unit):
    print(f"{name:58s} {sec*1e3:9.3f} ms  {work/sec/1e9:10.2f} G{unit}/s",
          file=sys.stderr)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    N = 1 << 22

    # ---- sort: chain full output ----
    @partial(jax.jit, static_argnames=("iters",))
    def run_sort1(iters, k0):
        def body(i, kk):
            s, p = lax.sort((kk, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
            return jnp.roll(s, 1) ^ p
        return lax.fori_loop(0, iters, body, k0)

    k0 = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
    report(f"sort 1key+payload i32 {N}", slope(run_sort1, k0), N, "elem")

    @partial(jax.jit, static_argnames=("iters",))
    def run_sort1_3pay(iters, k0, v1, v2):
        def body(i, carry):
            kk, a, b = carry
            s, p, a2, b2 = lax.sort((kk, jnp.arange(N, dtype=jnp.int32),
                                     a, b), num_keys=1)
            return jnp.roll(s, 1) ^ p, a2, b2
        return lax.fori_loop(0, iters, body, (k0, v1, v2))[0]

    v1 = jax.random.randint(key, (N,), 0, 100, jnp.int32)
    v2 = jax.random.normal(key, (N,), jnp.float32)
    report(f"sort 1key+3payload i32 {N}", slope(run_sort1_3pay, k0, v1, v2),
           N, "elem")

    @partial(jax.jit, static_argnames=("iters",))
    def run_sort2(iters, k0, k1):
        def body(i, carry):
            kk, k2 = carry
            s, s2, p = lax.sort((kk, k2, jnp.arange(N, dtype=jnp.int32)),
                                num_keys=2)
            return jnp.roll(s, 1) ^ p, s2
        return lax.fori_loop(0, iters, body, (k0, k1))[0]

    report(f"sort 2key+1payload i32 {N}", slope(run_sort2, k0, v1), N, "elem")

    # ---- cumsum ----
    @partial(jax.jit, static_argnames=("iters",))
    def run_cumsum(iters, x0):
        def body(i, x):
            c = jnp.cumsum(x, dtype=jnp.int32)
            return jnp.roll(c, 1) - c
        return lax.fori_loop(0, iters, body, x0)

    report(f"cumsum i32 {N}", slope(run_cumsum, v1), N, "elem")

    # ---- 1D gather: acc carries full output ----
    BIG = 1 << 25
    big = jax.random.normal(key, (BIG,), jnp.float32)
    M = 1 << 22
    gi = jax.random.randint(key, (M,), 0, BIG, jnp.int32)
    gis = jnp.sort(gi)

    @partial(jax.jit, static_argnames=("iters",))
    def run_gather(iters, tbl, idx):
        def body(i, acc):
            return acc + tbl[idx ^ i]
        return lax.fori_loop(0, iters, body, jnp.zeros((M,), jnp.float32))

    report(f"gather1d f32 {M} random from {BIG}",
           slope(run_gather, big, gi), M, "elem")
    report(f"gather1d f32 {M} sorted from {BIG}",
           slope(run_gather, big, gis), M, "elem")

    # ---- row gather (tiles) ----
    T = 1 << 18
    W = 256
    tbl = jax.random.normal(key, (T, W), jnp.float32)
    MR = 1 << 18
    ri = jax.random.randint(key, (MR,), 0, T, jnp.int32)
    ris = jnp.sort(ri)

    @partial(jax.jit, static_argnames=("iters",))
    def run_rowgather(iters, t, idx):
        def body(i, acc):
            return acc + t[idx ^ (i & 1)]
        return lax.fori_loop(0, iters, body, jnp.zeros((MR, W), jnp.float32))

    report(f"rowgather ({MR},{W}) f32 from {T} random",
           slope(run_rowgather, tbl, ri), MR * W * 4, "B")
    report(f"rowgather ({MR},{W}) f32 from {T} sorted",
           slope(run_rowgather, tbl, ris), MR * W * 4, "B")

    # ---- row scatter-add / segment reduce ----
    T2 = 1 << 17
    src = jax.random.normal(key, (MR, W), jnp.float32)
    seg = jnp.sort(jax.random.randint(key, (MR,), 0, T2, jnp.int32))

    @partial(jax.jit, static_argnames=("iters",))
    def run_rowscat(iters, s, sg):
        def body(i, acc):
            return acc.at[sg].add(s, indices_are_sorted=True)
        return lax.fori_loop(0, iters, body,
                             jnp.zeros((T2, W), jnp.float32))

    report(f"rowscatter-add ({MR},{W}) -> {T2} sorted",
           slope(run_rowscat, src, seg), MR * W * 4, "B")

    @partial(jax.jit, static_argnames=("iters",))
    def run_rowsegsum(iters, s, sg):
        def body(i, acc):
            return acc + jax.ops.segment_sum(s + i, sg, num_segments=T2,
                                             indices_are_sorted=True)
        return lax.fori_loop(0, iters, body,
                             jnp.zeros((T2, W), jnp.float32))

    report(f"rowsegment_sum ({MR},{W}) -> {T2} sorted",
           slope(run_rowsegsum, src, seg), MR * W * 4, "B")

    # ---- scalar segment sum ----
    segN = jnp.sort(jax.random.randint(key, (N,), 0, N, jnp.int32))

    @partial(jax.jit, static_argnames=("iters",))
    def run_segsum(iters, v, sg):
        def body(i, acc):
            return acc + jax.ops.segment_sum(v + i, sg, num_segments=N,
                                             indices_are_sorted=True)
        return lax.fori_loop(0, iters, body, jnp.zeros((N,), jnp.float32))

    report(f"segment_sum f32 {N} -> {N} sorted",
           slope(run_segsum, v2, segN), N, "elem")

    # ---- batched tiny matmul ----
    P = 1 << 15
    x = jax.random.normal(key, (P, 16, 16), jnp.float32)

    for prec in ("default", "highest"):
        @partial(jax.jit, static_argnames=("iters", "pr"))
        def run_bmm(iters, xx, pr):
            def body(i, acc):
                return acc + jnp.einsum(
                    "pij,pjk->pik", xx + i, xx,
                    preferred_element_type=jnp.float32, precision=pr)
            return lax.fori_loop(0, iters, body, jnp.zeros_like(xx))

        report(f"batched 16x16 matmul x{P} f32/{prec}",
               slope(run_bmm, x, prec), P * 2 * 16**3, "FLOP")

    xb = x.astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames=("iters",))
    def run_bmm_bf16(iters, xx):
        def body(i, acc):
            return acc + jnp.einsum("pij,pjk->pik",
                                    xx + jnp.bfloat16(i), xx,
                                    preferred_element_type=jnp.float32)
        return lax.fori_loop(0, iters, body,
                             jnp.zeros((P, 16, 16), jnp.float32))

    report(f"batched 16x16 matmul x{P} bf16->f32",
           slope(run_bmm_bf16, xb), P * 2 * 16**3, "FLOP")

    # one einsum shape candidate: pattern+numeric in one (p,16,32) rhs
    x2 = jax.random.normal(key, (P, 16, 32), jnp.float32)

    @partial(jax.jit, static_argnames=("iters",))
    def run_bmm32(iters, xx, rhs):
        def body(i, acc):
            return acc + jnp.einsum(
                "pij,pjk->pik", xx + i, rhs,
                preferred_element_type=jnp.float32, precision="highest")
        return lax.fori_loop(0, iters, body, jnp.zeros((P, 16, 32),
                                                       jnp.float32))

    report(f"batched 16x(16x32) matmul x{P} f32/highest",
           slope(run_bmm32, x, x2), P * 2 * 16 * 16 * 32, "FLOP")

    # ---- dense matmul sanity (should approach ~197 TF bf16) ----
    D = 4096
    m = jax.random.normal(key, (D, D)).astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames=("iters",))
    def run_dense(iters, mm):
        def body(i, acc):
            y = jnp.dot(acc.astype(jnp.bfloat16), mm,
                        preferred_element_type=jnp.float32)
            return y * 1e-3
        return lax.fori_loop(0, iters, body, jnp.zeros((D, D), jnp.float32))

    report(f"dense {D}x{D}x{D} bf16 matmul", slope(run_dense, m),
           2 * D**3, "FLOP")

    # ---- elementwise bandwidth sanity ----
    @partial(jax.jit, static_argnames=("iters",))
    def run_ew(iters, b):
        def body(i, acc):
            return acc * 0.5 + b
        return lax.fori_loop(0, iters, body, jnp.zeros_like(b))

    report(f"elementwise axpy {BIG} f32 (3x{BIG*4}B)",
           slope(run_ew, big), 3 * BIG * 4, "B")

    print("MICROBENCH3 OK")


if __name__ == "__main__":
    main()

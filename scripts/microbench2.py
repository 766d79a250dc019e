"""Gather/scatter/matmul microbenchmarks (device-side loops, explicit args).

Arrays are passed as jit arguments (not closure constants) so the tunnel
doesn't ship them inside the compile request.
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


def bench(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def report(name, sec, work, unit):
    print(f"{name:58s} {sec*1e3:9.3f} ms  {work/sec/1e9:10.2f} G{unit}/s",
          file=sys.stderr)


@partial(jax.jit, static_argnames=("iters",))
def gather_loop(tbl, idx, iters):
    def body(i, acc):
        g = tbl[idx ^ i]
        return acc + g[0] + g[-1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters",))
def rowgather_loop(tbl, idx, iters):
    def body(i, acc):
        g = tbl[idx ^ i]
        return acc + g[0, 0] + g[-1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters",))
def take_rowgather_loop(tbl, idx, iters):
    def body(i, acc):
        g = jnp.take(tbl, idx ^ i, axis=0)
        return acc + g[0, 0] + g[-1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters", "t2"))
def rowsegsum_loop(src, seg, iters, t2):
    def body(i, acc):
        s = jax.ops.segment_sum(src + i, seg, num_segments=t2,
                                indices_are_sorted=True)
        return acc + s[0, 0] + s[-1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters", "t2"))
def rowscatter_loop(src, seg, iters, t2):
    def body(i, acc):
        return acc.at[seg].add(src + i, indices_are_sorted=True, mode="drop")
    return lax.fori_loop(0, iters, body,
                         jnp.zeros((t2, src.shape[1]), jnp.float32))


@partial(jax.jit, static_argnames=("iters", "prec"))
def bmm_loop(x, iters, prec):
    def body(i, acc):
        y = jnp.einsum("pij,pjk->pik", x + i, x,
                       preferred_element_type=jnp.float32, precision=prec)
        return acc + y[0, 0, 0] + y[-1, -1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters",))
def bmm_bf16_loop(x, iters):
    xb = x.astype(jnp.bfloat16)

    def body(i, acc):
        y = jnp.einsum("pij,pjk->pik", xb + jnp.bfloat16(i), xb,
                       preferred_element_type=jnp.float32)
        return acc + y[0, 0, 0] + y[-1, -1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters",))
def grouped128_loop(x, iters):
    """8 pairs fused as block-diag into (P/8, 128, 128) matmuls? No —
    measure (P/8, 128, 16)@(16,16 shared): A-major grouped."""
    P = x.shape[0]
    xg = x.reshape(P // 8, 128, 16)
    w = x[0]

    def body(i, acc):
        y = jnp.einsum("gij,jk->gik", xg + i, w,
                       preferred_element_type=jnp.float32)
        return acc + y[0, 0, 0] + y[-1, -1, -1]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


@partial(jax.jit, static_argnames=("iters",))
def dense_loop(m, iters):
    def body(i, acc):
        y = jnp.dot(m + jnp.bfloat16(i), m, preferred_element_type=jnp.float32)
        return acc + y[0, 0]
    return lax.fori_loop(0, iters, body, jnp.float32(0))


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)

    BIG = 1 << 25  # 32M f32 = 128MB
    big = jax.random.normal(key, (BIG,), jnp.float32)
    for M in (1 << 22,):
        gi = jax.random.randint(key, (M,), 0, BIG, jnp.int32)
        gis = jnp.sort(gi)
        sec = bench(gather_loop, big, gi, 8) / 8
        report(f"gather1d f32 {M} random from {BIG}", sec, M, "elem")
        sec = bench(gather_loop, big, gis, 8) / 8
        report(f"gather1d f32 {M} sorted from {BIG}", sec, M, "elem")
        gi20 = jax.random.randint(key, (M,), 0, 1 << 20, jnp.int32)
        sec = bench(gather_loop, big, gi20, 8) / 8
        report(f"gather1d f32 {M} random from {1<<20}-window", sec, M, "elem")

    # row gathers: tiles as rows
    T = 1 << 18
    for W in (256,):
        tbl = jax.random.normal(key, (T, W), jnp.float32)
        M = 1 << 18
        ri = jax.random.randint(key, (M,), 0, T, jnp.int32)
        ris = jnp.sort(ri)
        sec = bench(rowgather_loop, tbl, ri, 4) / 4
        report(f"rowgather ({M},{W}) f32 from {T} random", sec, M * W * 4, "B")
        sec = bench(rowgather_loop, tbl, ris, 4) / 4
        report(f"rowgather ({M},{W}) f32 from {T} sorted", sec, M * W * 4, "B")
        sec = bench(take_rowgather_loop, tbl, ri, 4) / 4
        report(f"take-rowgather ({M},{W}) f32 random", sec, M * W * 4, "B")

    # row scatter/segsum
    T2 = 1 << 17
    M = 1 << 18
    W = 256
    src = jax.random.normal(key, (M, W), jnp.float32)
    seg = jnp.sort(jax.random.randint(key, (M,), 0, T2, jnp.int32))
    sec = bench(rowsegsum_loop, src, seg, 4, T2) / 4
    report(f"rowsegment_sum ({M},{W}) -> {T2}", sec, M * W * 4, "B")
    sec = bench(rowscatter_loop, src, seg, 4, T2) / 4
    report(f"rowscatter-add ({M},{W}) -> {T2} (in-loop)", sec, M * W * 4, "B")

    # batched tiny matmuls
    P = 1 << 15
    x = jax.random.normal(key, (P, 16, 16), jnp.float32)
    for prec in ("default", "highest"):
        sec = bench(bmm_loop, x, 8, prec) / 8
        report(f"batched 16x16 matmul x{P} f32/{prec}", sec,
               P * 2 * 16**3, "FLOP")
    sec = bench(bmm_bf16_loop, x, 8) / 8
    report(f"batched 16x16 matmul x{P} bf16", sec, P * 2 * 16**3, "FLOP")
    sec = bench(grouped128_loop, x, 8) / 8
    report(f"grouped (P/8,128,16)@(16,16) f32", sec, P * 2 * 16**3, "FLOP")

    D = 4096
    m = jax.random.normal(key, (D, D), jnp.float32).astype(jnp.bfloat16)
    sec = bench(dense_loop, m, 8) / 8
    report(f"dense {D}x{D} bf16 matmul", sec, 2 * D**3, "FLOP")

    print("MICROBENCH2 OK")


if __name__ == "__main__":
    main()

"""Device-side op microbenchmarks: the TPU cost model for this framework.

Each op runs ITERS times inside one jitted fori_loop (single dispatch), so
the ~25ms tunnel round-trip amortizes away.  A token dependency threads
through iterations to stop XLA from hoisting the loop body.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def timeit_device(make_body, iters=16, n_time=3):
    """make_body() -> (body, init) where body(i, carry) -> carry.
    Returns seconds per iteration, steady-state."""
    body, init = make_body()

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, body, c)

    out = run(init)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n_time):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def report(name, sec, work, unit):
    print(f"{name:56s} {sec*1e3:9.3f} ms  {work/sec/1e9:10.2f} G{unit}/s",
          file=sys.stderr)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rs = np.random.default_rng(0)

    N = 1 << 22  # 4M

    # --- sorts ---
    k = jnp.asarray(rs.integers(0, 1 << 30, N).astype(np.int32))
    k2 = jnp.asarray(rs.integers(0, 1 << 30, N).astype(np.int32))
    v = jnp.asarray(rs.standard_normal(N).astype(np.float32))

    def mk_sort1():
        def body(i, c):
            kk, acc = c
            s, p = jax.lax.sort((kk, jnp.arange(N, dtype=jnp.int32)),
                                num_keys=1)
            # feed the (re-scrambled) output back in: no hoisting possible
            return s ^ p, acc + s[0]
        return body, (k, jnp.int32(0))
    report(f"sort 1key+1payload i32 {N}", timeit_device(mk_sort1), N, "elem")

    def mk_sort4():
        def body(i, c):
            kk, acc = c
            a, b_, c_, d = jax.lax.sort(
                (kk, k2, jnp.arange(N, dtype=jnp.int32), v), num_keys=2)
            return a ^ c_, acc + a[0]
        return body, (k, jnp.int32(0))
    report(f"sort 2key+2payload {N}", timeit_device(mk_sort4), N, "elem")

    # --- cumsum / segment_sum ---
    def mk_cumsum():
        def body(i, c):
            kk, acc = c
            return kk, acc + jnp.cumsum(kk + i, dtype=jnp.int32)[-1]
        return body, (k, jnp.int32(0))
    report(f"cumsum i32 {N}", timeit_device(mk_cumsum), N, "elem")

    seg_sorted = jnp.sort(jnp.asarray(rs.integers(0, N, N).astype(np.int32)))

    def mk_segsum():
        def body(i, c):
            vv, acc = c
            s = jax.ops.segment_sum(vv + i, seg_sorted, num_segments=N,
                                    indices_are_sorted=True)
            return vv, acc + s[0] + s[-1]
        return body, (v, jnp.float32(0))
    report(f"segment_sum f32 {N}->{N} sorted", timeit_device(mk_segsum),
           N, "elem")

    # --- 1D gathers (the extract_values shape) ---
    BIG = 1 << 27  # 128M f32 = 512MB
    big = jnp.asarray(rs.standard_normal(BIG).astype(np.float32))
    for M in (1 << 20, 1 << 24):
        gi = jnp.asarray(rs.integers(0, BIG, M).astype(np.int32))
        gi_sorted = jnp.sort(gi)

        def mk_gather(idx):
            def make():
                def body(i, c):
                    acc = c
                    g = big[jnp.bitwise_xor(idx, i)]  # vary index cheaply
                    return acc + g[0] + g[-1]
                return body, jnp.float32(0)
            return make
        report(f"gather1d f32 {M} random from {BIG}",
               timeit_device(mk_gather(gi), iters=4), M, "elem")
        report(f"gather1d f32 {M} sorted from {BIG}",
               timeit_device(mk_gather(gi_sorted), iters=4), M, "elem")

    # --- row gathers: (T, W) take along axis 0 ---
    T = 1 << 20
    for W in (256, 512):
        tbl = jnp.asarray(rs.standard_normal((T, W)).astype(np.float32))
        M = 1 << 18
        ri = jnp.asarray(rs.integers(0, T, M).astype(np.int32))

        def mk_rowgather():
            def body(i, c):
                acc = c
                g = tbl[jnp.bitwise_xor(ri, i)]
                return acc + g[0, 0] + g[-1, -1]
            return body, jnp.float32(0)
        sec = timeit_device(mk_rowgather)
        report(f"rowgather ({M}, {W}) f32 from {T} rows", sec,
               M * W * 4, "B")

    # --- row scatter-add: (M, W) into (T2, W), sorted segments ---
    T2 = 1 << 18
    for W in (256,):
        M = 1 << 18
        si = jnp.sort(jnp.asarray(rs.integers(0, T2, M).astype(np.int32)))
        src = jnp.asarray(rs.standard_normal((M, W)).astype(np.float32))
        acc0 = jnp.zeros((T2, W), jnp.float32)

        def mk_rowscatter():
            def body(i, c):
                a = c
                a = a.at[si].add(src + i, indices_are_sorted=True)
                return a
            return body, acc0
        sec = timeit_device(mk_rowscatter)
        report(f"rowscatter-add ({M}, {W}) f32 into {T2} rows (in-loop)",
               sec, M * W * 4, "B")

        def mk_rowsegsum():
            def body(i, c):
                a = c
                s = jax.ops.segment_sum(src + i, si, num_segments=T2,
                                        indices_are_sorted=True)
                return a + s
            return body, acc0
        sec = timeit_device(mk_rowsegsum)
        report(f"rowsegment_sum ({M}, {W}) f32 -> {T2} rows", sec,
               M * W * 4, "B")

    # --- batched tiny matmuls vs grouped matmuls ---
    P = 1 << 15
    x = jnp.asarray(rs.standard_normal((P, 16, 16)).astype(np.float32))

    for prec in ("default", "highest"):
        def mk_bmm():
            def body(i, c):
                acc = c
                y = jnp.einsum("pij,pjk->pik", x + i, x,
                               preferred_element_type=jnp.float32,
                               precision=prec)
                return acc + y[0, 0, 0] + y[-1, -1, -1]
            return body, jnp.float32(0)
        sec = timeit_device(mk_bmm, iters=8)
        report(f"batched 16x16 matmul x{P} f32/{prec}", sec,
               P * 2 * 16**3, "FLOP")

    xb = x.astype(jnp.bfloat16)

    def mk_bmm_bf16():
        def body(i, c):
            acc = c
            y = jnp.einsum("pij,pjk->pik", xb + jnp.bfloat16(i), xb,
                           preferred_element_type=jnp.float32)
            return acc + y[0, 0, 0] + y[-1, -1, -1]
        return body, jnp.float32(0)
    sec = timeit_device(mk_bmm_bf16, iters=8)
    report(f"batched 16x16 matmul x{P} bf16->f32", sec, P * 2 * 16**3, "FLOP")

    # grouped: reshape 8 pairs into one 128-row block: (P/8, 128, 16) @ tiles?
    # A-stationary alternative: (P*16, 16) @ (16, 16) shared B
    xs = x.reshape(P * 16, 16)
    w = jnp.asarray(rs.standard_normal((16, 16)).astype(np.float32))

    def mk_shared_b():
        def body(i, c):
            acc = c
            y = jnp.dot(xs + i, w, preferred_element_type=jnp.float32)
            return acc + y[0, 0] + y[-1, -1]
        return body, jnp.float32(0)
    sec = timeit_device(mk_shared_b, iters=8)
    report(f"({P*16},16)@(16,16) shared-B f32", sec, P * 2 * 16**3, "FLOP")

    # dense big matmul sanity: MXU peak
    D = 4096
    m1 = jnp.asarray(rs.standard_normal((D, D)).astype(np.bfloat16))

    def mk_dense():
        def body(i, c):
            acc = c
            y = jnp.dot(m1 + jnp.bfloat16(i), m1,
                        preferred_element_type=jnp.float32)
            return acc + y[0, 0]
        return body, jnp.float32(0)
    sec = timeit_device(mk_dense, iters=8)
    report(f"dense {D}x{D} bf16 matmul", sec, 2 * D**3, "FLOP")

    # --- elementwise bandwidth sanity ---
    def mk_ew():
        def body(i, c):
            acc = c
            return acc * 0.5 + (big + jnp.float32(i))[::2].sum()
        return body, jnp.float32(0)
    sec = timeit_device(mk_ew, iters=8)
    report(f"elementwise read {BIG} f32", sec, BIG * 4, "B")

    print("MICROBENCH OK")


if __name__ == "__main__":
    main()

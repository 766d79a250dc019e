"""Pallas feasibility probes: random-tile DMA gather rate + in-kernel
batched 16x16 matmul rate on VMEM data.

These two rates decide the fused numeric kernel design (see
pem_spgemm_tpu/ops/pallas_numeric.py).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_slope(run, *args, i1=1, i2=5, n=4):
    for it in (i1, i2):
        jax.block_until_ready(run(it, *args))
    t1, t2 = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(i1, *args))
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(i2, *args))
        t2.append(time.perf_counter() - t0)
    return max(1e-9, (min(t2) - min(t1)) / (i2 - i1))


# ---------------------------------------------------------------- gather
def make_gather_kernel(CH, T, W=256):
    """Tiles stored flat (T, W) so HBM DMA slices stay lane-aligned."""
    NSEM = 256

    def kernel(idx_ref, tiles_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        for k in range(CH):
            pltpu.make_async_copy(
                tiles_ref.at[pl.ds(idx_ref[k], 1)],
                scratch.at[pl.ds(k, 1)],
                sems.at[k % NSEM],
            ).start()
        for k in range(CH):
            pltpu.make_async_copy(
                tiles_ref.at[pl.ds(idx_ref[k], 1)],
                scratch.at[pl.ds(k, 1)],
                sems.at[k % NSEM],
            ).wait()
        out_ref[pl.ds(i % 8, 1)] = jnp.sum(scratch[:]).reshape(1, 1) + \
            jnp.zeros((1, 128), jnp.float32)

    def call(idx, tiles3d):
        P = idx.shape[0]
        grid = (P // CH,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P // CH, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((CH, 2, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((NSEM,)),
            ],
        )(idx, tiles3d)

    return call


# ---------------------------------------------------- in-kernel matmul
def make_bmm_kernel(CH, mode):
    def kernel(a_ref, b_ref, o_ref):
        if mode == "einsum":
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        elif mode == "loop":
            def body(k, _):
                o_ref[k] = jnp.dot(a_ref[k], b_ref[k],
                                   preferred_element_type=jnp.float32)
                return 0
            lax.fori_loop(0, CH, body, 0)

    def call(a, b):
        P = a.shape[0]
        grid = (P // CH,)
        bs = lambda: pl.BlockSpec((CH, 16, 16), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[bs(), bs()],
            out_specs=bs(),
            out_shape=jax.ShapeDtypeStruct((P, 16, 16), jnp.float32),
        )(a, b)

    return call


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)

    T = 1 << 18                       # 256k tiles = 256MB source
    tiles = jax.random.normal(key, (T, 2, 128), jnp.float32)
    P = 1 << 19                       # 512k gathers

    for CH in (1024, 2048):
        call = make_gather_kernel(CH, T)
        idx = jax.random.randint(key, (P,), 0, T, jnp.int32)

        @partial(jax.jit, static_argnames=("iters",))
        def run(iters, idx_, tiles_):
            def body(i, acc):
                return acc + jnp.sum(call(idx_ ^ i, tiles_))
            return lax.fori_loop(0, iters, body, jnp.float32(0))

        sec = bench_slope(run, idx, tiles)
        rate = P * 1024 / sec / 1e9
        print(f"pallas DMA gather CH={CH}: {sec*1e3:.2f}ms for {P} tiles "
              f"= {rate:.1f} GB/s ({P/sec/1e6:.1f}M tiles/s)",
              file=sys.stderr)

    PB = 1 << 18
    a = jax.random.normal(key, (PB, 16, 16), jnp.float32)
    b = jax.random.normal(key, (PB, 16, 16), jnp.float32)
    for mode in ("einsum", "loop"):
        for CH in (2048,):
            call = make_bmm_kernel(CH, mode)

            @partial(jax.jit, static_argnames=("iters",))
            def run(iters, a_, b_):
                def body(i, acc):
                    return acc + call(a_ + i, b_)[0, 0, 0]
                return lax.fori_loop(0, iters, body, jnp.float32(0))

            try:
                sec = bench_slope(run, a, b)
                fl = PB * 2 * 16**3 / sec / 1e12
                print(f"pallas bmm mode={mode} CH={CH}: {sec*1e3:.2f}ms "
                      f"= {fl:.2f} TFLOP/s ({PB/sec/1e6:.0f}M pairs/s)",
                      file=sys.stderr)
            except Exception as e:
                print(f"pallas bmm mode={mode} CH={CH}: FAILED "
                      f"{type(e).__name__}: {str(e)[:800]}", file=sys.stderr)

    print("PALLAS PROBE OK")


if __name__ == "__main__":
    main()

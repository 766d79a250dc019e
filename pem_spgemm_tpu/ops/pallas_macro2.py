"""Pipelined Pallas macro kernel: gather via index-mapped block pipeline.

Second-generation kernel for the Macro128 engine.  Instead of issuing
per-pair DMAs inside the kernel body (ops/pallas_macro.py — correct but
DMA-latency-bound, since manual DMAs must complete within their grid
step), the GATHER rides the Pallas grid pipeline itself: the kernel
declares CH operand-tile inputs per side with (1, 128, 128) blocks whose
index_maps read the pair index arrays from scalar-prefetch SMEM.  The
pipeline machinery prefetches step i+1's tiles (double-buffered,
overlapped with step i's matmuls) like any other blocked input — the
idiomatic TPU form of a random block gather.

Scalar-prefetch arrays live in SMEM, so one pallas_call serves at most
WINDOW pairs; longer pair streams run as a sequence of window calls that
chain state through input_output_aliases: the C accumulators (numeric +
bf16 structural counts), the spill carry, and the previous-block scalar
all alias in->out, so a C-tile block or a block-boundary spill that spans
two windows accumulates exactly.  Within a window the output-block
revisiting + spill-carry scheme matches pallas_macro.py (exclusive
ownership by construction — the reference's atomic-freedom argument,
spgemm.cu:593-661).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4               # pairs per grid step
BC = 4               # C tiles per output block (>= CH)
WINDOW = 1 << 15     # pairs per pallas_call (scalar-prefetch SMEM budget)


def _kernel(pa_ref, pb_ref, info_ref, prev_in,
            cn_in, cp_in, carry_n_in, carry_p_in, *refs, precision):
    a_tiles = refs[0:CH]
    b_tiles = refs[CH:2 * CH]
    (c_num_ref, c_pat_ref, carry_n, carry_p, prev_out) = refs[2 * CH:]

    i = pl.program_id(0)
    nb1 = info_ref[0]                      # n_blocks - 1
    last_real = info_ref[1]                # last real block
    # pa_ref chunk layout: [pair indices (CH) | block | seg values (CH)]
    R = 2 * CH + 1
    b0 = pa_ref[i * R + CH]
    bp = pa_ref[jnp.maximum(i - 1, 0) * R + CH]
    prev = jnp.where(i > 0, bp, prev_in[0])

    # First step of the window: seed the carry from the previous window.
    @pl.when(i == 0)
    def _():
        carry_n[:] = carry_n_in[:]
        carry_p[:] = carry_p_in[:]

    # Seed the output VMEM window from the block's current HBM content
    # (chained across windows via aliasing) whenever the window cannot
    # already hold it: on block entry, and on the FIRST grid step of every
    # pallas_call — on hardware output windows are uninitialized at i == 0
    # even when b0 == prev (block straddling a WINDOW boundary), where the
    # b0 != prev seed alone would accumulate onto garbage.
    @pl.when((b0 != prev) | (i == 0))
    def _():
        c_num_ref[:] = cn_in[:]
        c_pat_ref[:] = cp_in[:]

    # Entering a block: flush the spill carry of block-1 into its leading
    # tiles.  NOT on a straddling i == 0 (b0 == prev): the carry there
    # holds spills that target block b0+1, not b0.
    @pl.when(b0 != prev)
    def _():
        c_num_ref[0:CH] += carry_n[:]
        c_pat_ref[0:CH] += carry_p[:]
        carry_n[:] = jnp.zeros_like(carry_n)
        carry_p[:] = jnp.zeros_like(carry_p)

    a3 = jnp.concatenate([r[:] for r in a_tiles], axis=0)   # (CH, 128, 128)
    b3 = jnp.concatenate([r[:] for r in b_tiles], axis=0)
    prod = lax.dot_general(a3, b3,
                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32,
                           precision=precision)
    pat = lax.dot_general((a3 != 0).astype(jnp.bfloat16),
                          (b3 != 0).astype(jnp.bfloat16),
                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)

    base = b0 * BC
    for k in range(CH):                     # k static: rows slice statically
        local = pa_ref[i * R + CH + 1 + k] - base
        inb = local < BC
        pk = prod[k:k + 1]
        tk = pat[k:k + 1].astype(jnp.bfloat16)

        @pl.when(inb)
        def _(pk=pk, tk=tk, local=local):
            j = jnp.clip(local, 0, BC - 1)
            c_num_ref[pl.ds(j, 1)] += pk
            c_pat_ref[pl.ds(j, 1)] += tk

        @pl.when(jnp.logical_not(inb))
        def _(pk=pk, tk=tk, local=local):
            j = jnp.clip(local - BC, 0, CH - 1)
            carry_n[pl.ds(j, 1)] += pk
            carry_p[pl.ds(j, 1)] += tk

    # Hand the block id to the next window.
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        prev_out[0] = b0


@functools.partial(jax.jit, static_argnames=("c_cap", "precision",
                                             "interpret", "window"))
def accumulate_macro_pipelined(a_dense, b_dense, a_idx, b_idx, seg, cnt_c,
                               c_cap, precision="highest", interpret=False,
                               window=WINDOW):
    """Fused macro accumulation, grid-pipeline gather edition.

    Same contract as pallas_macro.accumulate_macro_pallas; p_cap must be a
    multiple of CH.  Arbitrary pair-stream lengths run as chained `window`
    calls (default WINDOW; tests shrink it to force multi-window chaining
    on small streams).
    """
    WINDOW = window
    p_cap = a_idx.shape[0]
    assert p_cap % CH == 0, (p_cap, CH)
    assert WINDOW % CH == 0, (WINDOW, CH)
    c_cap_r = -(-c_cap // BC) * BC
    n_blocks = c_cap_r // BC

    zero_a = jnp.int32(a_dense.shape[0] - 1)
    zero_b = jnp.int32(b_dense.shape[0] - 1)
    pa_all = jnp.minimum(a_idx, zero_a)
    pb_all = jnp.minimum(b_idx, zero_b)
    info = jnp.array([n_blocks - 1, 0], jnp.int32).at[1].set(
        jnp.maximum(cnt_c - 1, 0) // BC)

    prec = dict(highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[precision]

    R = 2 * CH + 1   # prefetch row stride: pairs | block | seg values

    def a_map(k):
        return lambda i, pa, pb, info: (pa[i * R + k], 0, 0)

    def b_map(k):
        return lambda i, pa, pb, info: (pb[i * CH + k], 0, 0)

    def c_map(i, pa, pb, info):
        # block of the chunk's first pair (precomputed, clamped)
        return (pa[i * R + CH], 0, 0)

    n_win = -(-p_cap // WINDOW)
    pad = n_win * WINDOW - p_cap
    if pad:
        pa_all = jnp.concatenate([pa_all, jnp.full((pad,), zero_a)])
        pb_all = jnp.concatenate([pb_all, jnp.full((pad,), zero_b)])
        seg = jnp.concatenate(
            [seg, jnp.full((pad,), jnp.int32(0x7FFFFFFF))])

    c_num = jnp.zeros((c_cap_r, 128, 128), jnp.float32)
    c_pat = jnp.zeros((c_cap_r, 128, 128), jnp.bfloat16)
    carry_n = jnp.zeros((CH, 128, 128), jnp.float32)
    carry_p = jnp.zeros((CH, 128, 128), jnp.bfloat16)
    prev = jnp.full((1,), -1, jnp.int32)

    nw_chunks = WINDOW // CH
    for w in range(n_win):
        lo = w * WINDOW
        pa_w = lax.dynamic_slice_in_dim(pa_all, lo, WINDOW)
        pb_w = lax.dynamic_slice_in_dim(pb_all, lo, WINDOW)
        seg_w = lax.dynamic_slice_in_dim(seg, lo, WINDOW)
        # pa2 row = [pair indices (CH) | block-of-chunk | seg values (CH)]:
        # everything the kernel and index maps need rides scalar prefetch
        s0 = seg_w[::CH]
        blk = jnp.minimum(jnp.clip(s0 // BC, 0, n_blocks - 1),
                          jnp.maximum(cnt_c - 1, 0) // BC)
        segs_clip = jnp.minimum(seg_w, jnp.int32((1 << 30) - 1))
        pa2 = jnp.concatenate(
            [pa_w.reshape(nw_chunks, CH), blk[:, None],
             segs_clip.reshape(nw_chunks, CH)], axis=1).reshape(-1)
        pb2 = pb_w

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # pa2, pb2, info
            grid=(nw_chunks,),
            in_specs=(
                [pl.BlockSpec((1,), lambda i, pa, pb, info: (0,),
                              memory_space=pltpu.SMEM)]     # prev scalar
                + [pl.BlockSpec((BC, 128, 128), c_map,
                                memory_space=pltpu.VMEM)] * 2   # C content
                + [pl.BlockSpec((CH, 128, 128),
                                lambda i, pa, pb, info: (0, 0, 0),
                                memory_space=pltpu.VMEM)]   # carry_n in
                + [pl.BlockSpec((CH, 128, 128),
                                lambda i, pa, pb, info: (0, 0, 0),
                                memory_space=pltpu.VMEM)]   # carry_p in
                + [pl.BlockSpec((1, 128, 128), a_map(k),
                                memory_space=pltpu.VMEM) for k in range(CH)]
                + [pl.BlockSpec((1, 128, 128), b_map(k),
                                memory_space=pltpu.VMEM) for k in range(CH)]
            ),
            out_specs=(
                pl.BlockSpec((BC, 128, 128), c_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, 128, 128), c_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CH, 128, 128),
                             lambda i, pa, pb, info: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CH, 128, 128),
                             lambda i, pa, pb, info: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,), lambda i, pa, pb, info: (0,),
                             memory_space=pltpu.SMEM),
            ),
        )

        def kernel(pa_ref, pb_ref, info_ref, prev_in,
                   cn_in, cp_in, cnr_in, cpr_in, *refs):
            return _kernel(pa_ref, pb_ref, info_ref, prev_in,
                           cn_in, cp_in, cnr_in, cpr_in, *refs,
                           precision=prec)

        tile_args = [a_dense] * CH + [b_dense] * CH
        c_num, c_pat, carry_n, carry_p, prev = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((c_cap_r, 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((c_cap_r, 128, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((CH, 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((CH, 128, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 3: 4},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pa2, pb2, info, prev, c_num, c_pat, carry_n, carry_p,
          *tile_args)

    live = (jnp.arange(c_cap_r, dtype=jnp.int32) < cnt_c)[:, None, None]
    return (jnp.where(live, c_num, 0),
            jnp.where(live, c_pat, jnp.bfloat16(0)))

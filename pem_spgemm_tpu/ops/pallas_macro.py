"""Pallas fused accumulation kernel for the Macro128 engine.

Replaces ops/macro.accumulate_macro's XLA gather -> einsum -> scatter chain
with one kernel that keeps the output C-tile block resident in VMEM:

  XLA path traffic per pair: 128KB gather + 96KB product write + ~192KB
  scatter read-modify-write  (~416KB)
  this kernel:               128KB DMA gather + C written once (~128KB + C/pairs)

Pairs are sorted by C tile (ops/symbolic.expand_pairs), so each C tile is
owned by a contiguous run of grid steps — the atomic-freedom-by-exclusive-
ownership argument of the reference's warp-per-C-tile step 3
(spgemm.cu:593-661), mapped onto the Pallas revisit-the-same-output-block
pipeline.  Pairs that spill past the current block boundary accumulate in
a VMEM carry flushed when the grid enters the next block (a chunk spans at
most two consecutive blocks because CH <= BC).

Numeric product and 0/1 structural pattern are computed by one MXU matmul
each per pair; the pattern accumulates in bf16 (a positive integer sum
never rounds to 0; only count > 0 is consumed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4             # pairs per grid step
BC = 4             # C tiles per output block (>= CH)
IDXBLK = 1024      # SMEM block granule for index arrays


def _kernel(bof_ref, a_idx_ref, b_idx_ref, seg_ref, a_hbm, b_hbm,
            c_num_ref, c_pat_ref, a_buf, b_buf, carry_n, carry_p, sems,
            *, precision):
    i = pl.program_id(0)
    b0 = bof_ref[i]
    prev = jnp.where(i > 0, bof_ref[jnp.maximum(i - 1, 0)], jnp.int32(-1))
    ibase = (i % (IDXBLK // CH)) * CH

    def start_dma(k, _):
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_idx_ref[ibase + k], 1)], a_buf.at[pl.ds(k, 1)],
            sems.at[k]).start()
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_idx_ref[ibase + k], 1)], b_buf.at[pl.ds(k, 1)],
            sems.at[CH + k]).start()
        return 0

    lax.fori_loop(0, CH, start_dma, 0)

    @pl.when(i == 0)
    def _():
        carry_n[:] = jnp.zeros_like(carry_n)
        carry_p[:] = jnp.zeros_like(carry_p)

    @pl.when(b0 != prev)
    def _():
        c_num_ref[:] = jnp.zeros_like(c_num_ref)
        c_pat_ref[:] = jnp.zeros_like(c_pat_ref)
        c_num_ref[0:CH] += carry_n[:]
        c_pat_ref[0:CH] += carry_p[:]
        carry_n[:] = jnp.zeros_like(carry_n)
        carry_p[:] = jnp.zeros_like(carry_p)

    def wait_dma(k, _):
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_idx_ref[ibase + k], 1)], a_buf.at[pl.ds(k, 1)],
            sems.at[k]).wait()
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_idx_ref[ibase + k], 1)], b_buf.at[pl.ds(k, 1)],
            sems.at[CH + k]).wait()
        return 0

    lax.fori_loop(0, CH, wait_dma, 0)

    a3 = a_buf[:]
    b3 = b_buf[:]
    prod = lax.dot_general(a3, b3,
                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32,
                           precision=precision)
    pat = lax.dot_general((a3 != 0).astype(jnp.bfloat16),
                          (b3 != 0).astype(jnp.bfloat16),
                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    # Stage both products in the now-dead operand buffers so the
    # accumulation loop dynamic-indexes REFS (Mosaic cannot dynamic-slice
    # a vector value).
    a_buf[:] = prod
    b_buf[:] = pat

    base = b0 * BC

    def acc(k, _):
        local = seg_ref[ibase + k] - base
        inb = local < BC

        @pl.when(inb)
        def _():
            j = jnp.clip(local, 0, BC - 1)
            c_num_ref[pl.ds(j, 1)] += a_buf[pl.ds(k, 1)]
            c_pat_ref[pl.ds(j, 1)] += \
                b_buf[pl.ds(k, 1)].astype(jnp.bfloat16)

        @pl.when(jnp.logical_not(inb))
        def _():
            j = jnp.clip(local - BC, 0, CH - 1)
            carry_n[pl.ds(j, 1)] += a_buf[pl.ds(k, 1)]
            carry_p[pl.ds(j, 1)] += \
                b_buf[pl.ds(k, 1)].astype(jnp.bfloat16)

        return 0

    lax.fori_loop(0, CH, acc, 0)


@functools.partial(jax.jit, static_argnames=("c_cap", "precision",
                                             "interpret"))
def accumulate_macro_pallas(a_dense, b_dense, a_idx, b_idx, seg, cnt_c,
                            c_cap, precision="highest", interpret=False):
    """Fused macro accumulation (Pallas engine).

    a_dense/b_dense: (T+1, 128, 128) tables (zero tile at T).
    a_idx/b_idx/seg: (p_cap,) i32 sorted by seg; padding seg = INT32_MAX,
    padding indices point at the zero tile.  p_cap must be a multiple of
    IDXBLK (the plan pads it).
    Returns (c_dense f32, c_counts bf16): (c_cap_r, 128, 128) with rows
    >= cnt_c zeroed; c_cap_r = c_cap rounded up to BC.
    """
    p_cap = a_idx.shape[0]
    assert p_cap % IDXBLK == 0, (p_cap, IDXBLK)
    n_chunks = p_cap // CH
    c_cap_r = -(-c_cap // BC) * BC
    n_blocks = c_cap_r // BC

    seg_first = seg[::CH]
    last_real = jnp.maximum(cnt_c - 1, 0) // BC
    bof = jnp.minimum(jnp.clip(seg_first // BC, 0, n_blocks - 1), last_real)

    prec = dict(highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[precision]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((IDXBLK,), lambda i, bof: (i // (IDXBLK // CH),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((IDXBLK,), lambda i, bof: (i // (IDXBLK // CH),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((IDXBLK,), lambda i, bof: (i // (IDXBLK // CH),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BC, 128, 128), lambda i, bof: (bof[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, 128, 128), lambda i, bof: (bof[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CH, 128, 128), jnp.float32),
            pltpu.VMEM((CH, 128, 128), jnp.float32),
            pltpu.VMEM((CH, 128, 128), jnp.float32),
            pltpu.VMEM((CH, 128, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2 * CH,)),
        ],
    )

    c_num, c_pat = pl.pallas_call(
        functools.partial(_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c_cap_r, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_cap_r, 128, 128), jnp.bfloat16),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(bof, a_idx, b_idx, seg, a_dense, b_dense)

    live = (jnp.arange(c_cap_r, dtype=jnp.int32) < cnt_c)[:, None, None]
    return (jnp.where(live, c_num, 0),
            jnp.where(live, c_pat, jnp.bfloat16(0)))

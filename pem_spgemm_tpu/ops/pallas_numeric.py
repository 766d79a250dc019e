"""Fused Pallas numeric kernel for Tile16: DMA-gather + batched 16x16
matmul + segmented accumulation in one pass.

STATUS: correct under the Pallas interpreter (tests/test_pallas.py) but
NOT compilable on current Mosaic hardware backends — the in-kernel
relayout (CH, 2, 128) -> (CH, 16, 16) hits an unsupported vector shape
cast.  The production Tile16 path remains the XLA engine
(ops/numeric.accumulate_fused_flat); the production Pallas kernel is the
Macro128 one (ops/pallas_macro2.py), where (1, 128, 128) blocks need no
relayout.  Kept as the blueprint for when Mosaic gains the shape cast.

TPU-native re-design of reference step 3 + step 2b
(pem_spgemm_step3_accumulate spgemm.cu:593-661,
pem_spgemm_step2_compute_CMasksAndOffsets spgemm.cu:499-550): the reference
gives each C tile to one warp which loops its pairs with popcount-indexed
scalar FMAs; here each grid step owns a chunk of the pair stream (sorted by
C tile, so each C tile is touched by a contiguous run of steps — exclusive
ownership by construction, the same atomic-freedom argument) and

  * gathers its operand tiles HBM->VMEM with per-pair async DMAs
    (~12ns/tile — the measured random-1KB wall on v5e, which XLA's gather
    also hits, but without XLA's extra stream materialization + scatter
    round-trips),
  * computes numeric AND 0/1 structural products as one batched matmul on
    the MXU,
  * accumulates into the output C-tile block resident in VMEM; pairs
    spilling past the block boundary land in a carry buffer flushed when
    the grid enters the next block.

Layouts are flat (rows of 256 f32 = one 16x16 tile) because (T, 16, 16)
f32 is physically lane-padded to (T, 16, 128) in HBM — an 8x traffic tax
this kernel exists to avoid.

Requirements on inputs (provided by ops/symbolic.expand_pairs):
  * pairs sorted by dense C tile rank `seg`; padding pairs have
    seg = INT32_MAX and operand indices pointing at the all-zero tile row.
  * CH (pairs/step) <= BC (C tiles/block) so one chunk spans at most two
    consecutive blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 1024          # pairs per grid step (SMEM blocks need 1024-multiples)
BC = 1024          # C tiles per output block (must be >= CH)
NSEM = 256


def _kernel(bof_ref, a_idx_ref, b_idx_ref, seg_ref, a_hbm, b_hbm,
            c_num_ref, c_pat_ref, a_buf, b_buf, carry, sems,
            *, precision):
    i = pl.program_id(0)
    b0 = bof_ref[i]
    prev = jnp.where(i > 0, bof_ref[jnp.maximum(i - 1, 0)], jnp.int32(-1))

    def start_dma(k, _):
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_idx_ref[k], 1)], a_buf.at[pl.ds(k, 1)],
            sems.at[k % NSEM]).start()
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_idx_ref[k], 1)], b_buf.at[pl.ds(k, 1)],
            sems.at[(k + NSEM // 2) % NSEM]).start()
        return 0

    lax.fori_loop(0, CH, start_dma, 0)

    # Scratch is uninitialized at grid start.
    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    # New block: flush the spill carry of the previous block into rows
    # [0, CH) of this block (blocks are entered consecutively), then clear.
    @pl.when(b0 != prev)
    def _():
        c_num_ref[:] = jnp.zeros_like(c_num_ref)
        c_pat_ref[:] = jnp.zeros_like(c_pat_ref)
        c_num_ref[0:CH] += carry[0]
        c_pat_ref[0:CH] += carry[1]
        carry[:] = jnp.zeros_like(carry)

    def wait_dma(k, _):
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(a_idx_ref[k], 1)], a_buf.at[pl.ds(k, 1)],
            sems.at[k % NSEM]).wait()
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(b_idx_ref[k], 1)], b_buf.at[pl.ds(k, 1)],
            sems.at[(k + NSEM // 2) % NSEM]).wait()
        return 0

    lax.fori_loop(0, CH, wait_dma, 0)

    a3 = a_buf[:].reshape(CH, 16, 16)
    b3 = b_buf[:].reshape(CH, 16, 16)
    lhs = jnp.concatenate([a3, (a3 != 0).astype(jnp.float32)], axis=0)
    rhs = jnp.concatenate([b3, (b3 != 0).astype(jnp.float32)], axis=0)
    both = lax.dot_general(lhs, rhs,
                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32,
                           precision=precision)
    both = both.reshape(2 * CH, 2, 128)
    # Operand buffers are dead after the matmul: reuse them to stage the
    # products so the accumulation loop can dynamic-index a REF (Mosaic
    # cannot dynamic-slice a vector value).
    a_buf[:] = both[0:CH]
    b_buf[:] = both[CH:2 * CH]

    base = b0 * BC

    def acc(k, _):
        local = seg_ref[k] - base
        inb = local < BC

        @pl.when(inb)
        def _():
            j = jnp.clip(local, 0, BC - 1)
            c_num_ref[pl.ds(j, 1)] += a_buf[pl.ds(k, 1)]
            c_pat_ref[pl.ds(j, 1)] += b_buf[pl.ds(k, 1)]

        @pl.when(jnp.logical_not(inb))
        def _():
            j = jnp.clip(local - BC, 0, CH - 1)
            carry[0, pl.ds(j, 1)] += a_buf[pl.ds(k, 1)]
            carry[1, pl.ds(j, 1)] += b_buf[pl.ds(k, 1)]

        return 0

    lax.fori_loop(0, CH, acc, 0)


@functools.partial(jax.jit, static_argnames=("c_cap", "precision",
                                             "interpret"))
def accumulate_fused_pallas(a_flat, b_flat, a_idx, b_idx, seg, cnt_c,
                            c_cap, precision="highest", interpret=False):
    """Fused numeric+structural accumulation (Pallas engine).

    a_flat/b_flat: (T+1, 2, 128) dense tile tables (zero row at T).
    a_idx/b_idx/seg: (p_cap,) i32, sorted by seg, padding seg=INT32_MAX.
    cnt_c: device scalar i32 — true number of C tiles (<= c_cap).
    Returns (c_dense, c_counts): (c_cap_r, 2, 128) f32 with c_cap_r =
    c_cap rounded up to a block multiple; rows >= cnt_c zeroed.
    """
    p_cap = a_idx.shape[0]
    assert p_cap % CH == 0, (p_cap, CH)
    n_chunks = p_cap // CH
    c_cap_r = -(-c_cap // BC) * BC
    n_blocks = c_cap_r // BC

    # Block of each chunk = block of its first pair, clamped to the last
    # REAL block so the final spill (if any) flushes into the right block.
    seg_first = seg[::CH]
    last_real = jnp.maximum(cnt_c - 1, 0) // BC
    bof = jnp.minimum(jnp.clip(seg_first // BC, 0, n_blocks - 1), last_real)

    prec = dict(highest=lax.Precision.HIGHEST,
                default=lax.Precision.DEFAULT)[precision]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CH,), lambda i, bof: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CH,), lambda i, bof: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CH,), lambda i, bof: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BC, 2, 128), lambda i, bof: (bof[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, 2, 128), lambda i, bof: (bof[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CH, 2, 128), jnp.float32),
            pltpu.VMEM((CH, 2, 128), jnp.float32),
            pltpu.VMEM((2, CH, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )

    c_num, c_pat = pl.pallas_call(
        functools.partial(_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c_cap_r, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_cap_r, 2, 128), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bof, a_idx, b_idx, seg, a_flat, b_flat)

    # Blocks past the last real C tile are never visited by the grid and
    # contain garbage; zero them (and any padding rows inside the last
    # visited block that a padding pair's zero contribution didn't clear).
    live = (jnp.arange(c_cap_r, dtype=jnp.int32) < cnt_c)[:, None, None]
    return jnp.where(live, c_num, 0), jnp.where(live, c_pat, 0)

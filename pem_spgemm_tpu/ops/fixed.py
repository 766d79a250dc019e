"""A fully-jittable fixed-capacity SpGEMM step.

The interactive pipeline (ops/spgemm.py) crosses to the host between phases
for the two-pass allocation protocol.  When capacities are known up front
(from a previous run on the same sparsity, or from upper bounds), the whole
symbolic+numeric pipeline composes into ONE jitted function — no host syncs,
fully fusable/schedulable by XLA.  This is the "forward step" of the
framework: the repeated-execution shape used by the benchmark loop once the
sparsity pattern is fixed, and the unit the multi-device layer shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pem_spgemm_tpu.ops import symbolic, cstruct, numeric


@partial(jax.jit, static_argnames=("p_cap", "c_cap", "c_nnz_cap", "chunk",
                                   "acc_dtype", "precision"))
def spgemm_fixed(a_tile_row, a_tile_col, a_masks, a_vals, a_rowcol,
                 a_elem_tile, b_tile_rowptr, b_tile_col, b_tmasks, b_vals,
                 b_rowcol, b_elem_tile, ntiles_a, *,
                 p_cap, c_cap, c_nnz_cap, chunk, acc_dtype=jnp.float32,
                 precision="highest"):
    """One-shot tiled SpGEMM at static capacities.

    Returns (c_tile_row, c_tile_col, cmask, cptr, c_rowcol, c_elem_tile,
    c_vals, c_nnz).  Capacities must dominate the true sizes (p_cap >=
    pairs, c_cap >= C tiles, c_nnz_cap >= C nnz) or results are truncated.
    """
    offsets = symbolic.pair_counts(a_tile_col, b_tile_rowptr, ntiles_a)
    n_pairs = jnp.minimum(offsets[-1], p_cap)
    c_row, c_col, a_idx, b_idx, c_tile_id, _cnt_c = symbolic.expand_pairs(
        offsets, a_tile_row, a_tile_col, b_tile_rowptr, b_tile_col,
        n_pairs, p_cap)
    c_tile_row, c_tile_col, cmask, cptr, _pair_ptr = cstruct.c_masks(
        a_masks, b_tmasks, a_idx, b_idx, c_tile_id, c_row, c_col, c_cap)
    c_rowcol, c_elem_tile = cstruct.c_rowcol(cmask, c_nnz_cap)
    a_dense = numeric.densify_tiles(a_vals, a_rowcol, a_elem_tile,
                                    a_masks.shape[0])
    b_dense = numeric.densify_tiles(b_vals, b_rowcol, b_elem_tile,
                                    b_tmasks.shape[0])
    c_dense = numeric.accumulate_dense(
        a_dense, b_dense, a_idx, b_idx, c_tile_id, c_cap, chunk,
        acc_dtype, precision)
    c_vals = numeric.extract_values(c_dense, c_rowcol, c_elem_tile)
    return (c_tile_row, c_tile_col, cmask, cptr, c_rowcol, c_elem_tile,
            c_vals, cptr[-1])

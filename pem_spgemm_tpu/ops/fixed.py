"""A fully-jittable fixed-capacity SpGEMM step.

The interactive pipeline (ops/spgemm.py) crosses to the host between phases
for the two-pass allocation protocol.  When capacities are known (from a
first interactive run on the same sparsity, or from upper bounds), the whole
symbolic+numeric pipeline composes into ONE jitted call — no host syncs.

This matters doubly on this setup: each host<->device sync costs ~30ms over
the TPU tunnel, so the interactive pipeline has a ~10-sync floor per
multiply while the fixed step has exactly one dispatch + one result fetch.
It is also the unit the multi-device layer shards and the reference-parity
"repeat" body for benchmarking (the reference re-runs its three steps with
no size feedback changes after the first iteration, spgemm.cu:1133-1357).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from pem_spgemm_tpu.ops import symbolic, cstruct, numeric


@partial(jax.jit, static_argnames=("p_cap", "c_cap", "c_nnz_cap", "chunk",
                                   "acc_dtype", "precision", "packed"))
def spgemm_fixed(a_tile_row, a_tile_col, a_vals, a_rowcol, a_elem_tile,
                 b_tile_rowptr, b_tile_col, b_vals, b_rowcol, b_elem_tile,
                 ntiles_a, *, p_cap, c_cap, c_nnz_cap, chunk,
                 acc_dtype=jnp.float32, precision="highest", packed=False):
    """One-shot fused-engine tiled SpGEMM at static capacities.

    Returns (c_tile_row, c_tile_col, cmask, cptr, c_rowcol, c_elem_tile,
    c_vals, c_nnz).  Capacities must dominate the true sizes (p_cap >=
    pairs, c_cap >= C tiles, c_nnz_cap >= C nnz) or results are truncated.
    """
    offsets = symbolic.pair_counts(a_tile_col, b_tile_rowptr, ntiles_a)
    n_pairs = jnp.minimum(offsets[-1], p_cap)
    c_row, c_col, a_idx, b_idx, c_tile_id, _cnt_c = symbolic.expand_pairs(
        offsets, a_tile_row, a_tile_col, b_tile_rowptr, b_tile_col,
        n_pairs, p_cap, packed)
    a_dense = numeric.densify_tiles(a_vals, a_rowcol, a_elem_tile,
                                    a_tile_row.shape[0])
    b_dense = numeric.densify_tiles(b_vals, b_rowcol, b_elem_tile,
                                    b_tile_col.shape[0])
    c_dense, c_counts = numeric.accumulate_fused(
        a_dense, b_dense, a_idx, b_idx, c_tile_id, c_cap, chunk,
        acc_dtype, precision)
    c_tile_row, c_tile_col = cstruct.c_tile_coords(
        c_tile_id, c_row, c_col, c_cap)
    cmask, cptr = numeric.counts_to_masks(c_counts)
    c_rowcol, c_elem_tile = cstruct.c_rowcol(cmask, cptr, c_nnz_cap)
    c_vals = numeric.extract_values(c_dense, c_rowcol, c_elem_tile)
    return (c_tile_row, c_tile_col, cmask, cptr, c_rowcol, c_elem_tile,
            c_vals, cptr[-1])


@dataclasses.dataclass(frozen=True)
class SpGEMMPlan:
    """Static capacities learned from one interactive run."""

    p_cap: int
    c_cap: int
    c_nnz_cap: int
    chunk: int
    packed: bool
    acc_dtype: object
    precision: str

    def run(self, a, b):
        """Execute the planned step: one dispatch, no host syncs."""
        return spgemm_fixed(
            a.tile_row, a.tile_col, a.vals, a.rowcol, a.elem_tile,
            b.tile_rowptr, b.tile_col, b.vals, b.rowcol, b.elem_tile,
            jnp.int32(a.ntiles), p_cap=self.p_cap, c_cap=self.c_cap,
            c_nnz_cap=self.c_nnz_cap, chunk=self.chunk,
            acc_dtype=self.acc_dtype, precision=self.precision,
            packed=self.packed)


@dataclasses.dataclass(frozen=True)
class ElementPlan:
    """Static capacities for the element-level engine's fixed step."""

    p_cap: int
    c_cap: int

    def run(self, a, b):
        """One dispatch: (rows, cols, vals, c_nnz) padded to c_cap."""
        from pem_spgemm_tpu.ops.element import element_fixed
        b_rowptr, _b_rows, b_cols, b_vals = b.element_csr()
        a_rows, a_cols = a.element_coords()
        return element_fixed(a_rows, a_cols, a.vals, b_rowptr, b_cols,
                             b_vals, p_cap=self.p_cap, c_cap=self.c_cap)


def make_plan(result, config, a, b):
    """Build a fixed-capacity plan from an interactive SpGEMMResult."""
    from pem_spgemm_tpu.config import round_up_pow2
    from pem_spgemm_tpu.ops.scanops import can_pack
    if result.engine == "element":
        return ElementPlan(
            p_cap=max(config.numeric_chunk, round_up_pow2(result.n_pairs)),
            c_cap=round_up_pow2(max(1, result.c_nnz)))
    return SpGEMMPlan(
        p_cap=max(config.numeric_chunk, round_up_pow2(result.n_pairs)),
        c_cap=round_up_pow2(max(1, result.c_ntiles)),
        c_nnz_cap=round_up_pow2(max(1, result.c_nnz)),
        chunk=config.numeric_chunk,
        packed=can_pack(a.n_tile_rows, b.n_tile_cols),
        acc_dtype=config.acc(), precision=config.precision)

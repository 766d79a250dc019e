"""The tiled SpGEMM pipeline orchestrator.

Host-side driver that chains the jitted phases with the two-pass allocation
protocol (SURVEY.md section 3.3-3.5): each data-dependent size crosses to
the host exactly once and the next phase runs at a power-of-two bucketed
capacity.  This mirrors the reference's three D2H size-feedback syncs
(_C_nnz at spgemm.cu:1169, pairs_count at :1246, C_nnz at :1291) while
keeping XLA recompilation bounded.

Phase naming follows the reference for benchmark parity:
  step1 = symbolic pair expansion + C tile structure (ref steps 1 + 2a)
  step2 = C masks / exact nnz / intra-tile coords   (ref steps 2b + 2c)
  step3 = numeric accumulation + value extraction    (ref step 3)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pem_spgemm_tpu.config import SpGEMMConfig, DEFAULT_CONFIG, \
    round_up_bucket, round_up_pow2
from pem_spgemm_tpu.formats.coo import COOMatrix
from pem_spgemm_tpu.formats.tiled import TiledMatrix
from pem_spgemm_tpu.ops import symbolic, cstruct, numeric, assemble
from pem_spgemm_tpu.ops.convert import transpose_masks
from pem_spgemm_tpu.utils.timing import PhaseTimers


@dataclasses.dataclass
class SpGEMMResult:
    """C = A@B in tiled form plus assembly inputs."""

    c_tile_row: jax.Array   # (c_cap,) i32
    c_tile_col: jax.Array   # (c_cap,) i32
    cmask: jax.Array        # (c_cap, 16) i32
    cptr: jax.Array         # (c_cap+1,) i32 per-tile nnz exclusive scan
    rowcol: jax.Array       # (c_nnz_cap,) i32
    elem_tile: jax.Array    # (c_nnz_cap,) i32
    vals: jax.Array         # (c_nnz_cap,) value dtype, tile-major order
    shape: tuple
    c_ntiles: int           # true C tile count
    c_nnz: int              # true C nnz (structural, exact)
    n_pairs: int            # tile-level intermediate products

    def to_coo(self) -> COOMatrix:
        """Assemble + sort to canonical global COO (host)."""
        rows, cols, vals = assemble.assemble_coo(
            self.c_tile_row, self.c_tile_col, self.rowcol, self.elem_tile,
            self.vals, jnp.int32(self.c_nnz))
        n = self.c_nnz
        return COOMatrix(np.asarray(rows)[:n], np.asarray(cols)[:n],
                         np.asarray(vals)[:n], self.shape)


class SpGEMM:
    """C = A@B (or A@A.T) on Tile16 operands."""

    def __init__(self, config: SpGEMMConfig = DEFAULT_CONFIG):
        self.config = config

    def __call__(self, a: TiledMatrix, b: TiledMatrix,
                 timers: Optional[PhaseTimers] = None) -> SpGEMMResult:
        cfg = self.config
        timers = timers if timers is not None else PhaseTimers()
        if a.shape[1] != b.shape[0]:
            raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
        b_tmasks = b.tmasks
        if b_tmasks is None:
            b_tmasks = transpose_masks(b.masks)

        # --- step 1: pair expansion + C tile structure (symbolic) ---
        with timers.phase("step1") as box:
            offsets = symbolic.pair_counts(
                a.tile_col, b.tile_rowptr, jnp.int32(a.ntiles))
            n_pairs = int(offsets[-1])            # D2H size feedback #1
            if n_pairs == 0:
                raise ValueError("structurally empty product")
            p_cap = max(cfg.numeric_chunk, round_up_pow2(n_pairs))
            c_row, c_col, a_idx, b_idx, c_tile_id, cnt_c_dev = \
                symbolic.expand_pairs(
                    offsets, a.tile_row, a.tile_col, b.tile_rowptr,
                    b.tile_col, jnp.int32(n_pairs), p_cap)
            c_ntiles = int(cnt_c_dev)             # D2H size feedback #2
            box["sync"] = c_tile_id

        # --- step 2: C masks, exact per-tile nnz, intra-tile coords ---
        with timers.phase("step2") as box:
            c_cap = round_up_bucket(c_ntiles)
            c_tile_row, c_tile_col, cmask, cptr, _pair_ptr = cstruct.c_masks(
                a.masks, b_tmasks, a_idx, b_idx, c_tile_id, c_row, c_col,
                c_cap)
            c_nnz = int(cptr[-1])                 # D2H size feedback #3
            c_nnz_cap = round_up_bucket(c_nnz)
            c_rowcol, c_elem_tile = cstruct.c_rowcol(cmask, c_nnz_cap)
            box["sync"] = c_rowcol

        # --- step 3: numeric accumulation ---
        with timers.phase("step3") as box:
            a_dense = numeric.densify_tiles(
                a.vals, a.rowcol, a.elem_tile, a.tile_cap)
            b_dense = a_dense if b is a else numeric.densify_tiles(
                b.vals, b.rowcol, b.elem_tile, b.tile_cap)
            c_dense = numeric.accumulate_dense(
                a_dense, b_dense, a_idx, b_idx, c_tile_id,
                c_cap, cfg.numeric_chunk, cfg.acc(), cfg.precision)
            c_vals = numeric.extract_values(c_dense, c_rowcol, c_elem_tile)
            c_vals = c_vals.astype(cfg.dtype)
            box["sync"] = c_vals

        return SpGEMMResult(
            c_tile_row=c_tile_row, c_tile_col=c_tile_col, cmask=cmask,
            cptr=cptr, rowcol=c_rowcol, elem_tile=c_elem_tile, vals=c_vals,
            shape=(a.shape[0], b.shape[1]), c_ntiles=c_ntiles, c_nnz=c_nnz,
            n_pairs=n_pairs)

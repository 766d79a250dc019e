"""FLOP accounting, identical to the reference's definitions.

Reference (spgemm.cu:1068-1079, 1403-1404):
  flop              = sum over A's nonzeros (i, j) of nnz(row j of B)
  GFlops            = 2 * flop / time
  compression_ratio = flop / nnz(C)

The reference computes flop on a host jthread concurrently with GPU compute;
here it is a vectorized numpy bincount+gather on the host.
"""

from __future__ import annotations

import numpy as np


def spgemm_flops(a_cols: np.ndarray, b_rows: np.ndarray,
                 n_rows_b: int) -> int:
    """Intermediate-product count of A@B from host COO triplets."""
    b_row_nnz = np.bincount(np.asarray(b_rows), minlength=n_rows_b)
    return int(b_row_nnz[np.asarray(a_cols)].sum(dtype=np.int64))


def gflops(flop: int, seconds: float) -> float:
    return 2.0 * flop / seconds / 1e9 if seconds > 0 else 0.0


def compression_ratio(flop: int, c_nnz: int) -> float:
    return flop / c_nnz if c_nnz else 0.0

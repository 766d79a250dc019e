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


def spgemm_flops(a_cols, b_rows, n_rows_b: int) -> int:
    """Intermediate-product count of A@B from COO triplets.

    Device triplets are counted on device (one scalar D2H) — pulling
    10^8-element index arrays across a slow host link just to bincount
    them is the wrong side of the boundary.
    """
    if type(a_cols).__module__.startswith("jax") or \
            type(b_rows).__module__.startswith("jax"):
        import jax.numpy as jnp
        b_row_nnz = jnp.bincount(jnp.asarray(b_rows), length=n_rows_b)
        per = b_row_nnz[jnp.asarray(a_cols)]
        # Exact 64-bit total with int64 disabled: split each count into
        # 15-bit halves and sum in 16384-element chunks (each chunk sum
        # stays < 2^31), then combine the small chunk-sum vectors on host.
        m = 16384
        pad = (-per.shape[0]) % m
        per = jnp.concatenate([per, jnp.zeros((pad,), per.dtype)])
        hi = jnp.sum((per >> 15).reshape(-1, m), axis=1, dtype=jnp.int32)
        lo = jnp.sum((per & 0x7FFF).reshape(-1, m), axis=1,
                     dtype=jnp.int32)
        import numpy as _np
        return ((int(_np.asarray(hi).sum(dtype=_np.int64)) << 15)
                + int(_np.asarray(lo).sum(dtype=_np.int64)))
    b_row_nnz = np.bincount(np.asarray(b_rows), minlength=n_rows_b)
    return int(b_row_nnz[np.asarray(a_cols)].sum(dtype=np.int64))


def gflops(flop: int, seconds: float) -> float:
    return 2.0 * flop / seconds / 1e9 if seconds > 0 else 0.0


def compression_ratio(flop: int, c_nnz: int) -> float:
    return flop / c_nnz if c_nnz else 0.0

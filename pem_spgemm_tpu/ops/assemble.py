"""Result assembly: tiled C -> globally sorted COO.

Counterpart of the reference's sanitize_C + stable sort (spgemm.cu:663-695,
1495-1519): expand tile coordinates to global (row, col) and sort
lexicographically.  Like the reference, this is outside the timed SpGEMM
region and only runs when the caller wants a canonical COO result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def assemble_coo(c_tile_row, c_tile_col, c_rowcol, c_elem_tile, c_vals,
                 c_nnz):
    """Global, row-major-sorted COO triplets (padded slots sorted last).

    c_nnz: device scalar i32 — true element count; entries at positions
    >= c_nnz get INT32_MAX keys so the caller can slice them off.
    """
    n = c_rowcol.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < c_nnz
    tr = c_tile_row[c_elem_tile]
    tc = c_tile_col[c_elem_tile]
    rows = jnp.where(valid, tr * 16 + (c_rowcol >> 4), jnp.int32(0x7FFFFFFF))
    cols = jnp.where(valid, tc * 16 + (c_rowcol & 15), jnp.int32(0x7FFFFFFF))
    return lax.sort((rows, cols, c_vals), num_keys=2)

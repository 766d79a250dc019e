"""Element-level SpGEMM engine — the hypersparse regime.

The dense-tile numeric phase does 2*16^3 MXU flops per tile pair regardless
of fill; on matrices averaging ~1-2 nonzeros per tile (web graphs, uniform
random) that is a >1000x dense-work blowup AND the tile-pair count exceeds
the element product count.  This engine is the flop-proportional
alternative: expand every scalar product, sort by output coordinate, and
segment-reduce — all vector ops, no per-tile blowup.

This plays the role of the reference's NSPARSE fallback (dispatched by
structure at spgemm.cu:1142): a second engine behind the same API, selected
by a structural heuristic (config.engine="auto" uses mean nnz/tile).

Phase mapping for benchmark parity: step1 = product counting/expansion,
step2 = coordinate sort + boundary detection (structure, exact C nnz),
step3 = value segment-reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

INT32_MAX = jnp.int32(0x7FFFFFFF)


@jax.jit
def element_coords(tile_row, tile_col, elem_tile, rowcol):
    """Global (row, col) of every element of a TiledMatrix."""
    rows = tile_row[elem_tile] * 16 + (rowcol >> 4)
    cols = tile_col[elem_tile] * 16 + (rowcol & 15)
    return rows, cols


@partial(jax.jit, static_argnames=("n_rows",))
def build_element_csr(tile_row, tile_col, elem_tile, rowcol, vals, n_rows):
    """Row-sorted element triplets + row pointer (the element-level CSR the
    reference builds during conversion, spgemm.cu:894-928)."""
    rows, cols = element_coords(tile_row, tile_col, elem_tile, rowcol)
    rows, cols, vals = lax.sort((rows, cols, vals), num_keys=2)
    counts = jnp.bincount(rows, length=n_rows)
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts, dtype=jnp.int32)])
    return rowptr, rows, cols, vals


@jax.jit
def product_offsets(a_cols, b_row_nnz):
    cnt = b_row_nnz[a_cols]
    return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt, dtype=jnp.int32)])


@partial(jax.jit, static_argnames=("p_cap",))
def expand_sorted_products(offsets, a_rows, a_cols, a_vals, b_rowptr,
                           b_cols, b_vals, n_products, p_cap):
    """Scalar products sorted by (row, col) with boundary flags.

    Returns (ci, cj, cv, out_id, c_nnz_dev): coordinates, product values,
    dense output rank per product (INT32_MAX on padding), distinct count.
    """
    from pem_spgemm_tpu.ops import scanops
    p = jnp.arange(p_cap, dtype=jnp.int32)
    valid = p < n_products
    a = jnp.clip(scanops.segment_ids_from_offsets(offsets, p_cap),
                 0, a_rows.shape[0] - 1)
    b = b_rowptr[a_cols[a]] + (p - offsets[a])
    b = jnp.clip(b, 0, b_cols.shape[0] - 1)
    ci = jnp.where(valid, a_rows[a], INT32_MAX)
    cj = jnp.where(valid, b_cols[b], INT32_MAX)
    cv = jnp.where(valid, a_vals[a] * b_vals[b], 0)
    ci, cj, cv = lax.sort((ci, cj, cv), num_keys=2)
    new = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((ci[1:] != ci[:-1]) | (cj[1:] != cj[:-1])).astype(jnp.int32)])
    out_id = (jnp.cumsum(new) - 1).astype(jnp.int32)
    c_nnz = jnp.where(n_products > 0,
                      out_id[jnp.maximum(n_products - 1, 0)] + 1, 0)
    out_id = jnp.where(valid, out_id, INT32_MAX)
    return ci, cj, cv, out_id, c_nnz


@partial(jax.jit, static_argnames=("p_cap", "c_cap"))
def element_fixed(a_rows, a_cols, a_vals, b_rowptr, b_cols, b_vals,
                  *, p_cap, c_cap):
    """One-shot element-level SpGEMM at static capacities — no host syncs.

    The element-engine analog of ops/fixed.spgemm_fixed: product counting,
    expansion+sort, and segment reduction compose into ONE dispatch once the
    capacities (p_cap >= products, c_cap >= C nnz) are known from a first
    interactive run.  Mirrors the reference's steady-state repeat loop, which
    re-runs its three steps with unchanged sizes (spgemm.cu:1133-1357).

    Returns (rows, cols, vals, c_nnz): sorted COO triplets padded to c_cap
    (INT32_MAX coordinate sentinels past c_nnz).
    """
    b_row_nnz = b_rowptr[1:] - b_rowptr[:-1]
    offsets = product_offsets(a_cols, b_row_nnz)
    n_products = jnp.minimum(offsets[-1], p_cap)
    ci, cj, cv, out_id, c_nnz = expand_sorted_products(
        offsets, a_rows, a_cols, a_vals, b_rowptr, b_cols, b_vals,
        n_products, p_cap)
    rows, cols, vals = reduce_products(ci, cj, cv, out_id, c_cap)
    return rows, cols, vals, c_nnz


@partial(jax.jit, static_argnames=("c_cap",))
def reduce_products(ci, cj, cv, out_id, c_cap):
    """Coordinates + summed values of distinct outputs (padding INT32_MAX)."""
    oid = jnp.minimum(out_id, c_cap)
    rows = jnp.full((c_cap,), INT32_MAX).at[oid].set(
        ci, mode="drop", indices_are_sorted=True)
    cols = jnp.full((c_cap,), INT32_MAX).at[oid].set(
        cj, mode="drop", indices_are_sorted=True)
    vals = jax.ops.segment_sum(
        jnp.where(out_id < c_cap, cv, 0), jnp.minimum(oid, c_cap - 1),
        num_segments=c_cap, indices_are_sorted=True)
    return rows, cols, vals

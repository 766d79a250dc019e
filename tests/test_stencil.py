"""Stencil macro kernel (ops/pallas_stencil.py): interpret-mode parity.

Hardware exactness vs the v2 kernel is additionally verified on-chip by
the round-2 measurements (BASELINE.md): err = 0.0e0 on banded64-1M.
"""

import numpy as np
import jax.numpy as jnp

from pem_spgemm_tpu.models.synthetic import banded
from pem_spgemm_tpu.ops.convert import coo_to_macro
from pem_spgemm_tpu.ops import macro, symbolic
from pem_spgemm_tpu.ops import pallas_stencil as ps


def _pairs(m):
    offsets = symbolic.pair_counts(m.tile_col, m.tile_rowptr,
                                   jnp.int32(m.ntiles))
    n_pairs = int(offsets[-1])
    p_cap = -(-n_pairs // 256) * 256
    return n_pairs, symbolic.expand_pairs(
        offsets, m.tile_row, m.tile_col, m.tile_rowptr, m.tile_col,
        jnp.int32(n_pairs), p_cap, True)


def test_stencil_matches_xla_banded():
    coo = banded(n=12_000, bands=tuple(range(-16, 16)), seed=3)
    m = coo_to_macro(coo, dtype=jnp.float32)
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m)
    n_tiles = int(cnt)
    plan = ps.plan_stencil(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                           n_tiles, m.dense.shape[0], m.dense.shape[0])
    assert plan.coverage > 0.9, plan.coverage
    assert len(plan.classes) >= 1
    num, pat = ps.stencil_accumulate(m.dense, m.dense, plan, "highest",
                                     interpret=True)
    ref_n, ref_p = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, seg,
        -(-n_tiles // 256) * 256, 256, jnp.float32, "highest")
    order = plan.order
    real = order < n_tiles
    x = np.asarray(num)[:len(order)][real]
    y = np.asarray(ref_n)[order[real]]
    np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-5)
    assert np.array_equal(
        np.asarray(pat)[:len(order)][real].astype(np.float32) > 0,
        np.asarray(ref_p)[order[real]].astype(np.float32) > 0)
    assert np.unique(order[real]).size == n_tiles


def test_stencil_irregular_goes_residual():
    # irregular structure: low coverage, residual path keeps exactness
    rs = np.random.default_rng(5)
    from pem_spgemm_tpu.formats.coo import COOMatrix
    n, nnz = 4000, 30000
    coo = COOMatrix(rs.integers(0, n, nnz).astype(np.int32),
                    rs.integers(0, n, nnz).astype(np.int32),
                    rs.standard_normal(nnz), (n, n)).sum_duplicates()
    m = coo_to_macro(coo, dtype=jnp.float32)
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m)
    n_tiles = int(cnt)
    plan = ps.plan_stencil(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                           n_tiles, m.dense.shape[0], m.dense.shape[0])
    num, pat = ps.stencil_accumulate(m.dense, m.dense, plan, "highest",
                                     interpret=True)
    ref_n, _ = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, seg,
        -(-n_tiles // 256) * 256, 256, jnp.float32, "highest")
    order = plan.order
    real = order < n_tiles
    np.testing.assert_allclose(np.asarray(num)[:len(order)][real],
                               np.asarray(ref_n)[order[real]],
                               rtol=1e-5, atol=1e-5)
    assert np.unique(order[real]).size == n_tiles

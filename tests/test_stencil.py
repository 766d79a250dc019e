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


def test_run_plan_wandering_matches_xla():
    # irregular-macro regime: the periodic stencil plan collapses, the
    # consecutive-run row plan must cover it and stay exact
    from pem_spgemm_tpu.models.synthetic import wandering_device
    coo = wandering_device(n=8192, width=32, block=128, seed=11)
    m = coo_to_macro(coo, dtype=jnp.float32)
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m)
    n_tiles = int(cnt)
    sp = ps.plan_stencil(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                         n_tiles, m.dense.shape[0], m.dense.shape[0])
    rp = ps.plan_runs(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                      n_tiles, m.dense.shape[0], m.dense.shape[0])
    # at this small scale many signatures fall under MIN_CLASS_STEPS;
    # the full-scale coverage assertion is test_run_plan_coverage_scales
    assert rp.coverage > 0.6, (rp.coverage, sp.coverage)
    assert rp.coverage > sp.coverage
    assert len(rp.classes) >= 1
    # ragged classes: per-tile pair counts ride the signature
    assert any(isinstance(c[1], tuple) for c in rp.classes)
    num, pat = ps.stencil_accumulate(m.dense, m.dense, rp, "highest",
                                     interpret=True)
    ref_n, ref_p = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, seg,
        -(-n_tiles // 256) * 256, 256, jnp.float32, "highest")
    order = rp.order
    real = order < n_tiles
    np.testing.assert_allclose(np.asarray(num)[:len(order)][real],
                               np.asarray(ref_n)[order[real]],
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(
        np.asarray(pat)[:len(order)][real].astype(np.float32) > 0,
        np.asarray(ref_p)[order[real]].astype(np.float32) > 0)
    assert np.unique(order[real]).size == n_tiles


def test_run_plan_banded_still_exact():
    # regular banded input through the run plan (not its target regime,
    # but it must stay exact); covers multi-tile rows + boundary rows
    coo = banded(n=6000, bands=tuple(range(-20, 20)), seed=9)
    m = coo_to_macro(coo, dtype=jnp.float32)
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m)
    n_tiles = int(cnt)
    rp = ps.plan_runs(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                      n_tiles, m.dense.shape[0], m.dense.shape[0])
    num, _pat = ps.stencil_accumulate(m.dense, m.dense, rp, "highest",
                                      interpret=True)
    ref_n, _ = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, seg,
        -(-n_tiles // 256) * 256, 256, jnp.float32, "highest")
    order = rp.order
    real = order < n_tiles
    np.testing.assert_allclose(np.asarray(num)[:len(order)][real],
                               np.asarray(ref_n)[order[real]],
                               rtol=1e-5, atol=1e-5)
    assert np.unique(order[real]).size == n_tiles


def test_run_plan_coverage_scales():
    # planning only (host): at realistic scale the wandering signature
    # space (~25 walk variants) is fully covered by the class budget
    from pem_spgemm_tpu.models.synthetic import wandering_device
    coo = wandering_device(n=131072, width=32, block=128, seed=11)
    m = coo_to_macro(coo, dtype=jnp.float32)
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m)
    n_tiles = int(cnt)
    rp = ps.plan_runs(seg, a_idx, b_idx, c_row, c_col, n_pairs,
                      n_tiles, m.dense.shape[0], m.dense.shape[0])
    assert rp.coverage > 0.95, rp.coverage

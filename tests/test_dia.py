"""DIA engine: diagonal-band SpGEMM vs scipy oracles.

The DIA tier (formats/dia.py, ops/dia.py) replaces the reference's tiled
pipeline for banded structure (spgemm.cu:499-661) with shifted vector FMA
streams; these tests pin exact structural nnz, exact coordinates, and
value parity against scipy, plus the dispatch/fallback edges.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from pem_spgemm_tpu.formats.coo import COOMatrix
from pem_spgemm_tpu.config import SpGEMMConfig
from pem_spgemm_tpu.ops.spgemm import SpGEMM
from pem_spgemm_tpu.ops.dia import (coo_to_dia, detect_dia, diag_offsets,
                                    make_dia_plan, dia_to_coo)
from pem_spgemm_tpu.ops.fixed import make_plan


def _banded_coo(n, bands, seed=0, n_cols=None):
    rs = np.random.default_rng(seed)
    n_cols = n_cols or n
    rows_l, cols_l = [], []
    for d in bands:
        lo, hi = max(0, -d), min(n, n_cols - d)
        i = np.arange(lo, hi)
        rows_l.append(i)
        cols_l.append(i + d)
    rows = np.concatenate(rows_l).astype(np.int32)
    cols = np.concatenate(cols_l).astype(np.int32)
    vals = rs.standard_normal(len(rows))
    return COOMatrix(rows, cols, vals, (n, n_cols))


def _check_product(coo, b_coo=None, engine="dia"):
    b_coo = b_coo or coo
    a = coo_to_dia(coo, dtype=np.float32)
    b = a if b_coo is coo else coo_to_dia(b_coo, dtype=np.float32)
    assert a is not None and b is not None
    cfg = SpGEMMConfig(engine=engine)
    res = SpGEMM(cfg)(a, b)
    want = (coo.to_scipy() @ b_coo.to_scipy()).tocoo()
    want.sum_duplicates()
    assert res.c_nnz == want.nnz
    got = res.to_coo()
    order = np.lexsort((want.col, want.row))
    np.testing.assert_array_equal(got.rows, want.row[order])
    np.testing.assert_array_equal(got.cols, want.col[order])
    np.testing.assert_allclose(got.vals, want.data[order].astype(np.float32),
                               rtol=2e-5, atol=1e-5)
    return res, a, b, cfg


def test_round_trip():
    coo = _banded_coo(300, (-7, -1, 0, 2, 11))
    d = coo_to_dia(coo, dtype=np.float32)
    assert d.offsets == (-7, -1, 0, 2, 11)
    r, c, v = d.to_coo_numpy()
    order = np.lexsort((coo.cols, coo.rows))
    np.testing.assert_array_equal(r, coo.rows[order])
    np.testing.assert_array_equal(c, coo.cols[order])
    np.testing.assert_allclose(v, coo.vals[order].astype(np.float32),
                               rtol=1e-6)


def test_square_tridiagonal():
    _check_product(_banded_coo(257, (-1, 0, 1)))


def test_sparse_nonuniform_offsets():
    # pairbands-like: non-dense offset set (XLA path, never pallas)
    _check_product(_banded_coo(400, (0, 1, 60, 61, -60, -61)))


def test_wide_dense_band():
    _check_product(_banded_coo(300, tuple(range(-9, 10))))


def test_asymmetric_offsets():
    _check_product(_banded_coo(200, (-3, 0, 5, 17)))


def test_a_times_b_different_offsets():
    a_coo = _banded_coo(256, (0, 1, 2), seed=1)
    b_coo = _banded_coo(256, (-5, 0, 9), seed=2)
    _check_product(a_coo, b_coo)


def test_rectangular_aat():
    # A (200x300) @ A.T (300x200): offsets differ per operand
    a_coo = _banded_coo(200, (0, 4, 50), n_cols=300, seed=3)
    b_coo = a_coo.transpose()
    a = coo_to_dia(a_coo, dtype=np.float32)
    b = coo_to_dia(b_coo, dtype=np.float32)
    res = SpGEMM(SpGEMMConfig())(a, b)
    want = (a_coo.to_scipy() @ b_coo.to_scipy()).tocoo()
    want.sum_duplicates()
    assert res.c_nnz == want.nnz
    got = res.to_coo()
    order = np.lexsort((want.col, want.row))
    np.testing.assert_array_equal(got.rows, want.row[order])
    np.testing.assert_array_equal(got.cols, want.col[order])
    np.testing.assert_allclose(got.vals, want.data[order].astype(np.float32),
                               rtol=2e-5, atol=1e-5)


def test_structural_nnz_survives_cancellation():
    # A values engineered so a C entry sums to exactly zero numerically;
    # structural counts must keep it (reference parity: presence algebra)
    n = 64
    rows = np.array([0, 0, 1, 2], np.int32)
    cols = np.array([1, 2, 3, 3], np.int32)
    vals = np.array([1.0, 1.0, 1.0, -1.0])
    coo = COOMatrix(rows, cols, vals, (n, n))
    a = coo_to_dia(coo, dtype=np.float32)
    res = SpGEMM(SpGEMMConfig())(a, a)
    # C[0,3] = 1*1 + 1*(-1) = 0 numerically but structurally present
    s = coo.to_scipy()
    pattern = ((s != 0).astype(np.int64) @ (s != 0).astype(np.int64))
    assert res.c_nnz == pattern.nnz
    nonzero = (s @ s).tocoo()
    nonzero.eliminate_zeros()
    assert pattern.nnz > nonzero.nnz  # cancellation actually happened


def test_detect_rejects_explicit_zero():
    coo = _banded_coo(100, (0, 1))
    coo.vals[3] = 0.0
    assert detect_dia(coo) is None


def test_detect_rejects_many_diagonals():
    rs = np.random.default_rng(5)
    n = 2000
    rows = rs.integers(0, n, 4000).astype(np.int32)
    cols = rs.integers(0, n, 4000).astype(np.int32)
    coo = COOMatrix(rows, cols, np.ones(4000), (n, n)).sum_duplicates()
    assert detect_dia(coo, max_bands=64) is None
    assert len(diag_offsets(coo)) > 64


def test_fixed_plan_replay_matches_interactive():
    coo = _banded_coo(333, (-2, 0, 3, 40))
    res, a, b, cfg = _check_product(coo)
    plan = make_plan(res, cfg, a, b)
    out = plan.run(a, b)
    assert int(out[2]) == res.c_nnz
    assert not bool(out[3])
    r, c, v = dia_to_coo(out[0], out[1], plan.dc_list, res.shape,
                         res.c_nnz)
    got = res.to_coo()
    np.testing.assert_array_equal(r, got.rows)
    np.testing.assert_allclose(v, got.vals, rtol=1e-6)


def test_harness_runs_dia_engine():
    from pem_spgemm_tpu.bench.harness import run_benchmark
    coo = _banded_coo(500, (0, 1, 30, 31))
    cfg = SpGEMMConfig(engine="dia", warmup=1, repeat=2)
    record, result = run_benchmark(coo, "dia-banded", cfg, verbose=False)
    assert result.engine == "dia"
    s = coo.to_scipy()
    want = (s @ s).tocoo()
    want.sum_duplicates()
    assert record.c_nnz == want.nnz
    got = result.to_coo()
    order = np.lexsort((want.col, want.row))
    np.testing.assert_allclose(got.vals, want.data[order].astype(np.float32),
                               rtol=2e-5, atol=1e-5)


def test_harness_auto_detects_dia():
    from pem_spgemm_tpu.bench.harness import run_benchmark
    coo = _banded_coo(500, (-1, 0, 1))
    cfg = SpGEMMConfig(engine="auto", warmup=0, repeat=1)
    record, result = run_benchmark(coo, "dia-auto", cfg, verbose=False)
    assert result.engine == "dia"


def test_harness_auto_falls_back_for_scattered():
    from pem_spgemm_tpu.bench.harness import run_benchmark
    rs = np.random.default_rng(6)
    n = 600
    rows = rs.integers(0, n, 1200).astype(np.int32)
    cols = rs.integers(0, n, 1200).astype(np.int32)
    coo = COOMatrix(rows, cols, rs.standard_normal(1200),
                    (n, n)).sum_duplicates()
    cfg = SpGEMMConfig(engine="auto", warmup=0, repeat=1,
                       dia_max_bands=16)
    record, result = run_benchmark(coo, "dia-fallback", cfg, verbose=False)
    assert result.engine != "dia"


def test_pallas_path_interpret_matches_xla():
    # The pallas kernel requires a dense B offset range; compare its
    # interpret-mode output against the XLA path on a wide stencil.
    import jax
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps
    coo = _banded_coo(700, tuple(range(-4, 5)), seed=8)
    a = coo_to_dia(coo, dtype=np.float32)
    dc_list, idx_map = _plan_maps(a.offsets, a.offsets)
    cx, nx = _dia_multiply_xla(a.bands, a.bands, offs_a=a.offsets,
                               idx_map=idx_map, dc_count=len(dc_list),
                               n_out=a.shape[0])
    cp, np_ = pd.dia_multiply_pallas(a.bands, a.bands, offs_a=a.offsets,
                                     dc_list=dc_list, n_out=a.shape[0],
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(np_) > 0,
                                  np.asarray(nx) > 0)


def test_sharded_dia_matches_single_device():
    # halo-exchange column sharding (parallel/sharded_dia.py) vs the
    # single-device XLA path and scipy, on the virtual 8-device mesh
    import jax
    from pem_spgemm_tpu.parallel.sharded import make_mesh
    from pem_spgemm_tpu.parallel.sharded_dia import sharded_dia_multiply
    from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps, \
        dia_to_coo
    coo = _banded_coo(1000, (-7, -1, 0, 2, 11), seed=13)
    a = coo_to_dia(coo, dtype=np.float32)
    mesh = make_mesh(8)
    c, cnt, dc_list = sharded_dia_multiply(a, a, mesh)
    dl, idx_map = _plan_maps(a.offsets, a.offsets)
    cx, nx = _dia_multiply_xla(a.bands, a.bands, offs_a=a.offsets,
                               idx_map=idx_map, dc_count=len(dl),
                               n_out=a.shape[0])
    assert dc_list == dl
    np.testing.assert_allclose(c, np.asarray(cx), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(cnt > 0, np.asarray(nx) > 0)
    # scipy end-to-end through assembly
    s = coo.to_scipy()
    want = (s.tocsr() @ s.tocsr()).tocoo()
    want.sum_duplicates()
    r, col, v = dia_to_coo(c, cnt, dc_list, coo.shape)
    assert len(r) == want.nnz
    order = np.lexsort((want.col, want.row))
    np.testing.assert_allclose(v, want.data[order].astype(np.float32),
                               rtol=2e-5, atol=1e-5)


def test_pallas_applicable_rejects_gapped_sums():
    # offs_a spaced wider than B's dense range -> the C diagonal set has
    # gaps; the pallas kernel's dense row mapping would misindex, so the
    # qualifier must refuse (ops/pallas_dia.pallas_dia_applicable).
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _plan_maps

    class _FakeCfg:
        use_pallas = True

    offs_a = (0, 10)                 # spacing 10 > len(offs_b) = 5
    offs_b = (-2, -1, 0, 1, 2)
    dc_list, _ = _plan_maps(offs_a, offs_b)
    dc_dense = (max(offs_a) + max(offs_b)) - (min(offs_a) + min(offs_b)) + 1
    assert len(dc_list) < dc_dense   # gaps actually exist
    assert not pd.pallas_dia_applicable(offs_a, offs_b, dc_list, 10_000,
                                        _FakeCfg())


def test_pallas_interpret_d2_not_multiple_of_8():
    # B band count 5 pads the window DMA's sublane extent to 8 (Mosaic
    # tiling); padded rows are zero and the accumulator slice-off must
    # keep results exact.
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps
    a_coo = _banded_coo(600, (5,), seed=9)
    b_coo = _banded_coo(600, (-2, -1, 0, 1, 2), seed=10)
    a = coo_to_dia(a_coo, dtype=np.float32)
    b = coo_to_dia(b_coo, dtype=np.float32)
    dc_list, idx_map = _plan_maps(a.offsets, b.offsets)
    cx, nx = _dia_multiply_xla(a.bands, b.bands, offs_a=a.offsets,
                               idx_map=idx_map, dc_count=len(dc_list),
                               n_out=a.shape[0])
    cp, np_ = pd.dia_multiply_pallas(a.bands, b.bands, offs_a=a.offsets,
                                     dc_list=dc_list, n_out=a.shape[0],
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(np_) > 0, np.asarray(nx) > 0)


def test_fixed_plan_count_cache_second_run():
    # DiaPlan caches the static structural counts after the first run;
    # the second (values-only) run must return identical values, counts
    # and nnz (ops/dia.DiaPlan.run).
    coo = _banded_coo(400, (-3, 0, 2, 25), seed=17)
    res, a, b, cfg = _check_product(coo)
    plan = make_plan(res, cfg, a, b)
    out1 = plan.run(a, b)
    assert getattr(plan, "_cnt_cache", None) is not None
    out2 = plan.run(a, b)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(out1[0]))
    np.testing.assert_array_equal(np.asarray(out2[1]), np.asarray(out1[1]))
    assert int(out2[2]) == int(out1[2]) == res.c_nnz


def test_pallas_values_only_interpret():
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _plan_maps
    coo = _banded_coo(500, tuple(range(-4, 5)), seed=18)
    a = coo_to_dia(coo, dtype=np.float32)
    dc_list, _ = _plan_maps(a.offsets, a.offsets)
    c_full, cnt = pd.dia_multiply_pallas(a.bands, a.bands,
                                         offs_a=a.offsets,
                                         dc_list=dc_list, n_out=a.shape[0],
                                         interpret=True)
    c_vo, none = pd.dia_multiply_pallas(a.bands, a.bands,
                                        offs_a=a.offsets, dc_list=dc_list,
                                        n_out=a.shape[0], values_only=True,
                                        interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(c_vo), np.asarray(c_full),
                               rtol=1e-6, atol=1e-6)


def test_pallas_pairs_kernel_interpret_matches_xla():
    # The pairwise kernel (ops/pallas_dia._kernel_pairs) lifts the dense
    # offset-range precondition: pairbands-class gapped band sets run one
    # static row FMA per (d1, d2) product into the sparse dc row map.
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps
    bands = (0, 1, 60, 61, -60, -61, 120, 121, -120, -121)
    coo = _banded_coo(900, bands, seed=21)
    a = coo_to_dia(coo, dtype=np.float32)
    dc_list, idx_map = _plan_maps(a.offsets, a.offsets)
    dc_dense = 2 * (max(bands) - min(bands)) + 1
    assert len(dc_list) < dc_dense          # gapped C offsets for real
    cx, nx = _dia_multiply_xla(a.bands, a.bands, offs_a=a.offsets,
                               idx_map=idx_map, dc_count=len(dc_list),
                               n_out=a.shape[0])
    cp, np_ = pd.dia_multiply_pallas(a.bands, a.bands, offs_a=a.offsets,
                                     offs_b=a.offsets, mode="pairs",
                                     dc_list=dc_list, n_out=a.shape[0],
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(np_) > 0, np.asarray(nx) > 0)
    # values-only replay path (DiaPlan count-cache contract)
    c_vo, none = pd.dia_multiply_pallas(a.bands, a.bands, offs_a=a.offsets,
                                        offs_b=a.offsets, mode="pairs",
                                        dc_list=dc_list, n_out=a.shape[0],
                                        values_only=True, interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(c_vo), np.asarray(cp),
                               rtol=1e-6, atol=1e-6)


def test_pallas_mode_selects_pairs_for_gapped_bands(monkeypatch):
    from pem_spgemm_tpu.ops import pallas_dia as pd
    from pem_spgemm_tpu.ops.dia import _plan_maps

    class _FakeCfg:
        use_pallas = True

    bands = (0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201)
    dc_list, _ = _plan_maps(bands, bands)
    # CPU platform gate first (the real environment for this test run)
    assert pd.pallas_dia_mode(bands, bands, dc_list, 500_000,
                              _FakeCfg()) is None
    # ... then bypass it so the SELECTION logic itself is exercised
    # (ADVICE round 3: the 'pairs' branch was never executed by the suite)
    monkeypatch.setattr(pd, "_platform_ok", lambda: True)
    assert pd.pallas_dia_mode(bands, bands, dc_list, 500_000,
                              _FakeCfg()) == "pairs"
    # control: dense stencil range selects the dense kernel
    dense_bands = tuple(range(-8, 8))
    dcd, _ = _plan_maps(dense_bands, dense_bands)
    assert pd.pallas_dia_mode(dense_bands, dense_bands, dcd, 1_000_000,
                              _FakeCfg()) == "dense"
    # control: tiny n_out fails the pairs profitability gate
    assert pd.pallas_dia_mode(bands, bands, dc_list, 1024,
                              _FakeCfg()) is None
    # control: a VMEM-infeasible A-offset span must NOT select 'pairs'
    # (the window scratch is (d2, L+span); ADVICE round 3, medium) —
    # same shape class as the qualifying set, offsets blown out 1000x
    wide = tuple(b * 1000 for b in bands)
    dcw, _ = _plan_maps(wide, wide)
    assert not pd._pairs_vmem_ok(wide, wide, len(dcw))
    assert pd.pallas_dia_mode(wide, wide, dcw, 50_000_000,
                              _FakeCfg()) is None

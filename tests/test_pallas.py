"""Pallas kernels: interpret-mode parity with the XLA engines.

On CPU the kernels run under the Pallas interpreter; on TPU hardware the
macro kernel is the production accumulation path (config.use_pallas).
"""

import numpy as np
import jax.numpy as jnp

from pem_spgemm_tpu.models.synthetic import banded, power_law
from pem_spgemm_tpu.ops.convert import coo_to_macro, coo_to_tiled
from pem_spgemm_tpu.ops import symbolic, macro, numeric
from pem_spgemm_tpu.config import round_up_pow2


def _pairs(m, p_gran):
    offsets = symbolic.pair_counts(m.tile_col, m.tile_rowptr,
                                   jnp.int32(m.ntiles))
    n_pairs = int(offsets[-1])
    p_cap = max(p_gran, -(-n_pairs // p_gran) * p_gran)
    return symbolic.expand_pairs(
        offsets, m.tile_row, m.tile_col, m.tile_rowptr, m.tile_col,
        jnp.int32(n_pairs), p_cap, True)


def test_pallas_macro_matches_xla():
    from pem_spgemm_tpu.ops.pallas_macro import (accumulate_macro_pallas,
                                                 IDXBLK)
    coo = banded(n=2000, bands=(0, 3, -3, 64, -64), seed=4)
    m = coo_to_macro(coo, dtype=jnp.float32)
    c_row, c_col, a_idx, b_idx, c_tile_id, cnt = _pairs(m, IDXBLK)
    c_cap = max(4, -(-int(cnt) // 4) * 4)
    ref_n, ref_c = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, c_cap, 32, jnp.float32)
    got_n, got_c = accumulate_macro_pallas(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, cnt, c_cap,
        interpret=True)
    n_c = int(cnt)
    np.testing.assert_allclose(np.asarray(got_n)[:n_c],
                               np.asarray(ref_n)[:n_c],
                               rtol=1e-5, atol=1e-5)
    rc = np.asarray(ref_c, np.float32)[:n_c] > 0
    gc = np.asarray(got_c, np.float32)[:n_c] > 0
    np.testing.assert_array_equal(gc, rc)


def test_pallas_tile16_matches_xla():
    from pem_spgemm_tpu.ops.pallas_numeric import (accumulate_fused_pallas,
                                                   CH)
    coo = power_law(n=4096, nnz=16000, seed=3, hub_correlation=0.1)
    a = coo_to_tiled(coo, dtype=jnp.float32)
    af = a.dense_flat()
    offsets = symbolic.pair_counts(a.tile_col, a.tile_rowptr,
                                   jnp.int32(a.ntiles))
    n_pairs = int(offsets[-1])
    p_cap = max(CH, round_up_pow2(n_pairs))
    out = symbolic.expand_pairs(
        offsets, a.tile_row, a.tile_col, a.tile_rowptr, a.tile_col,
        jnp.int32(n_pairs), p_cap, True)
    c_row, c_col, a_idx, b_idx, c_tile_id, cnt = out
    c_cap = round_up_pow2(max(1, int(cnt)))
    ref_n, ref_c = numeric.accumulate_fused_flat(
        af, af, a_idx, b_idx, c_tile_id, c_cap, 1 << 10, jnp.float32)
    got_n, got_c = accumulate_fused_pallas(
        af, af, a_idx, b_idx, c_tile_id, cnt, c_cap, interpret=True)
    n_c = int(cnt)
    np.testing.assert_allclose(
        np.asarray(got_n)[:n_c].reshape(n_c, 256),
        np.asarray(ref_n)[:n_c], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got_c)[:n_c].reshape(n_c, 256) > 0,
        np.asarray(ref_c)[:n_c] > 0)


def test_pallas_macro_pipelined_matches_xla():
    import pem_spgemm_tpu.ops.pallas_macro2 as pm2
    coo = banded(n=2000, bands=(0, 3, -3, 64, -64), seed=4)
    m = coo_to_macro(coo, dtype=jnp.float32)
    c_row, c_col, a_idx, b_idx, c_tile_id, cnt = _pairs(m, 32)
    c_cap = max(4, -(-int(cnt) // 4) * 4)
    ref_n, ref_c = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, c_cap, 32, jnp.float32)
    got_n, got_c = pm2.accumulate_macro_pipelined(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, cnt, c_cap,
        interpret=True, window=64)   # force multi-window chaining
    n_c = int(cnt)
    np.testing.assert_allclose(np.asarray(got_n)[:n_c],
                               np.asarray(ref_n)[:n_c],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got_c, np.float32)[:n_c] > 0,
        np.asarray(ref_c, np.float32)[:n_c] > 0)

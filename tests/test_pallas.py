"""Pallas kernels: interpret-mode parity with the XLA engines.

On CPU the production pipelined macro kernel (ops/pallas_macro2.py) runs
under the Pallas interpreter; on TPU it is the production accumulation
path (config.use_pallas).  Hardware-only behaviors the interpreter cannot
see (uninitialized output windows at chained call boundaries) are covered
by scripts/verify_macro_hw.py on the real chip.
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

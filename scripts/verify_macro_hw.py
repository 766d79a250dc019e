"""Hardware verification of the pipelined macro kernel's window chaining.

The Pallas INTERPRETER initializes aliased output windows from the donated
input, so a missing output-VMEM seed at the first grid step of a chained
pallas_call (a C block straddling a WINDOW boundary) is invisible to the
interpret-mode tests (ADVICE.md round 1, high).  On hardware the window is
uninitialized, so only a real-chip run can prove the seed logic.

This script runs the production pipelined kernel (ops/pallas_macro2) on
the REAL device against the plain XLA accumulate (ops/macro.accumulate_macro)
on three adversarial settings where blocks straddle window boundaries:
  1. small irregular matrix, window=64 -> dozens of chained calls, odd
     per-block pair counts (forced straddling),
  2. same matrix, window=128 with a different phase,
  3. a banded-1M-class stream at the production WINDOW (multi-window at
     real scale, the shipped benchmark regime).

Exit code 0 = all match (rtol 1e-5 vs HIGHEST-precision XLA).
Run on the TPU: python scripts/verify_macro_hw.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pem_spgemm_tpu.models.synthetic import banded
from pem_spgemm_tpu.ops.convert import coo_to_macro
from pem_spgemm_tpu.ops import macro, symbolic
import pem_spgemm_tpu.ops.pallas_macro2 as pm2


def _pairs(m, gran):
    offsets = symbolic.pair_counts(m.tile_col, m.tile_rowptr,
                                   jnp.int32(m.ntiles))
    n_pairs = int(offsets[-1])
    p_cap = max(gran, -(-n_pairs // gran) * gran)
    return n_pairs, symbolic.expand_pairs(
        offsets, m.tile_row, m.tile_col, m.tile_rowptr, m.tile_col,
        jnp.int32(n_pairs), p_cap, True)


def check(name, m, window):
    n_pairs, (c_row, c_col, a_idx, b_idx, c_tile_id, cnt) = \
        _pairs(m, 32)   # lcm(CH, xla chunk)
    c_cap = max(pm2.BC, -(-int(cnt) // pm2.BC) * pm2.BC)
    ref_n, ref_c = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, c_cap, 32, jnp.float32,
        "highest")
    got_n, got_c = pm2.accumulate_macro_pipelined(
        m.dense, m.dense, a_idx, b_idx, c_tile_id, cnt, c_cap,
        precision="highest", window=window)
    n_c = int(cnt)
    rn = np.asarray(ref_n)[:n_c]
    gn = np.asarray(got_n)[:n_c]
    err = np.max(np.abs(gn - rn) / np.maximum(np.abs(rn), 1e-30))
    pat_ok = bool(np.array_equal(np.asarray(got_c, np.float32)[:n_c] > 0,
                                 np.asarray(ref_c, np.float32)[:n_c] > 0))
    n_win = -(-a_idx.shape[0] // window)
    ok = err < 1e-5 and pat_ok
    print(f"[{name}] pairs={n_pairs} c_tiles={n_c} windows={n_win} "
          f"max_rel_err={err:.2e} pattern_ok={pat_ok} -> "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = True
    # Irregular block structure: mixed band offsets give odd per-block pair
    # counts so blocks straddle the tiny windows in many phases.
    coo = banded(n=4000, bands=(0, 3, -3, 64, -64, 129, -200), seed=7)
    m = coo_to_macro(coo, dtype=jnp.float32)
    ok &= check("irregular w=64", m, 64)
    ok &= check("irregular w=128", m, 128)
    if "--full" in sys.argv:
        coo = banded(n=1_000_000, bands=tuple(range(-32, 32)), seed=1)
        m = coo_to_macro(coo, dtype=jnp.float32)
        ok &= check("banded64-1M w=WINDOW", m, pm2.WINDOW)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

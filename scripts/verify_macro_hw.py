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


def check_class_call2_direct(name, t, p, n_steps, ar, br, seed=0):
    """Drive class_call2 ON HARDWARE against a direct einsum oracle.

    Adversarial axes the interpreter cannot prove (it does not model
    in-flight DMAs): ODD n_steps (the round-3 drain bug), n_steps=1
    (no odd slot at all), ragged per-tile pair counts (run-plan
    signatures), and boundary step counts around MIN_CLASS_STEPS.
    """
    from pem_spgemm_tpu.ops import pallas_stencil as ps
    rs = np.random.default_rng(seed)
    p_list = (p,) * t if isinstance(p, int) else p
    n_p = sum(p_list)
    a_tbl = jnp.asarray(rs.standard_normal((ar + 8, 128, 128)), jnp.float32)
    b_tbl = jnp.asarray(rs.standard_normal((br + 8, 128, 128)), jnp.float32)
    a_offs = tuple(int(x) for x in rs.integers(0, ar, n_p))
    b_offs = tuple(int(x) for x in rs.integers(0, br, n_p))
    bases = np.empty(2 * n_steps, np.int32)
    bases[0::2] = rs.integers(0, 8, n_steps)
    bases[1::2] = rs.integers(0, 8, n_steps)
    c_cap = max(256, -(-n_steps * t // 256) * 256)
    c_num = jnp.zeros((c_cap, 128, 128), jnp.float32)
    c_pat = jnp.zeros((c_cap, 128, 128), jnp.bfloat16)
    num, pat = ps.class_call2(c_num, c_pat, a_tbl, b_tbl,
                              jnp.asarray(bases), t, p, ar, br,
                              a_offs, b_offs, 0, n_steps, "highest")
    an, bn = np.asarray(a_tbl, np.float64), np.asarray(b_tbl, np.float64)
    want = np.zeros((n_steps * t, 128, 128))
    for s in range(n_steps):
        a0, b0 = bases[2 * s], bases[2 * s + 1]
        k = 0
        for tt in range(t):
            for _ in range(p_list[tt]):
                want[s * t + tt] += an[a0 + a_offs[k]] @ bn[b0 + b_offs[k]]
                k += 1
    got = np.asarray(num)[:n_steps * t]
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30))
    ok = err < 1e-5
    print(f"[class_call2 {name}] t={t} p={p} steps={n_steps} "
          f"max_rel_err={err:.2e} -> {'OK' if ok else 'MISMATCH'}",
          flush=True)
    return ok


def check_plan(name, m, planner, min_cov=0.0):
    """End-to-end stencil/run plan vs the XLA accumulate, ON HARDWARE."""
    from pem_spgemm_tpu.ops import pallas_stencil as ps
    n_pairs, (c_row, c_col, a_idx, b_idx, seg, cnt) = _pairs(m, 256)
    n_tiles = int(cnt)
    plan = planner(seg, a_idx, b_idx, c_row, c_col, n_pairs, n_tiles,
                   m.dense.shape[0], m.dense.shape[0])
    num, pat = ps.stencil_accumulate(m.dense, m.dense, plan, "highest")
    ref_n, ref_p = macro.accumulate_macro(
        m.dense, m.dense, a_idx, b_idx, seg,
        -(-n_tiles // 256) * 256, 256, jnp.float32, "highest")
    order = plan.order
    real = order < n_tiles
    gn = np.asarray(num)[:len(order)][real]
    rn = np.asarray(ref_n)[order[real]]
    err = np.max(np.abs(gn - rn) / np.maximum(np.abs(rn), 1e-30))
    pat_ok = bool(np.array_equal(
        np.asarray(pat, np.float32)[:len(order)][real] > 0,
        np.asarray(ref_p, np.float32)[order[real]] > 0))
    ok = err < 1e-5 and pat_ok and np.unique(order[real]).size == n_tiles
    print(f"[{name}] coverage={plan.coverage:.3f} "
          f"classes={len(plan.classes)} res_tiles={plan.n_res_tiles} "
          f"max_rel_err={err:.2e} pattern_ok={pat_ok} -> "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    assert plan.coverage >= min_cov, (plan.coverage, min_cov)
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

    # class_call2 direct drives: odd/single/boundary step counts + ragged
    ok &= check_class_call2_direct("steps=1", 2, 2, 1, 6, 6)
    ok &= check_class_call2_direct("steps=3 odd", 4, 3, 3, 10, 10, seed=1)
    ok &= check_class_call2_direct("steps=5 odd", 8, 2, 5, 12, 12, seed=2)
    ok &= check_class_call2_direct("steps=8 even", 8, 3, 8, 16, 16, seed=3)
    ok &= check_class_call2_direct("ragged", 3, (1, 4, 2), 7, 9, 9, seed=4)

    # end-to-end plans on hardware: periodic (stencil), aperiodic (runs),
    # and residual mixing (scattered tail under the run plan)
    from pem_spgemm_tpu.ops import pallas_stencil as ps
    from pem_spgemm_tpu.models.synthetic import wandering_device
    coo = banded(n=16000, bands=tuple(range(-16, 16)), seed=3)
    ok &= check_plan("stencil banded", coo_to_macro(coo, jnp.float32),
                     ps.plan_stencil, min_cov=0.9)
    coo = wandering_device(n=32768, width=32, block=128, seed=11)
    ok &= check_plan("runs wandering", coo_to_macro(coo, jnp.float32),
                     ps.plan_runs, min_cov=0.6)

    if "--full" in sys.argv:
        coo = banded(n=1_000_000, bands=tuple(range(-32, 32)), seed=1)
        m = coo_to_macro(coo, dtype=jnp.float32)
        ok &= check("banded64-1M w=WINDOW", m, pm2.WINDOW)
        ok &= check_plan("stencil banded64-1M", m, ps.plan_stencil,
                         min_cov=0.9)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

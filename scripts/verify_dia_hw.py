"""Hardware verification of the Pallas DIA kernel vs the XLA DIA path.

Drives dia_multiply_pallas ON-CHIP (the interpret-mode tests cannot catch
Mosaic lowering/alignment issues — this script exists because an
unaligned-window DMA crashed the whole banded suite in round 3) across
the suite's stencil shapes plus adversarial offset sets: positive-only
offsets (unaligned global window base), single band, span not a multiple
of the lane tiling, block-boundary n.

Exits 0 on success; cited from BASELINE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps
from pem_spgemm_tpu.ops.pallas_dia import dia_multiply_pallas

CASES = [
    # (name, n, offs_a, offs_b, mode)
    ("banded16", 100_000, tuple(range(-8, 8)), tuple(range(-8, 8)),
     "dense"),
    ("banded64", 70_000, tuple(range(-32, 32)), tuple(range(-32, 32)),
     "dense"),
    ("banded128", 40_000, tuple(range(-64, 64)), tuple(range(-64, 64)),
     "dense"),
    ("upper-only", 65_536, tuple(range(3, 19)), tuple(range(3, 19)),
     "dense"),
    ("single-band", 50_000, (5,), (-2, -1, 0, 1, 2), "dense"),
    ("asym", 81_921, tuple(range(-5, 12)), tuple(range(-3, 9)), "dense"),
    # pairwise kernel (gapped band sets; _kernel_pairs)
    ("pairbands", 500_000,
     (0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201),
     (0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201), "pairs"),
    ("pairs-asym", 81_921, (0, 7, -13, 200), (-3, 0, 3, 50, 51), "pairs"),
    ("pairs-block-edge", 8_192, (0, 1, -100, 100), (0, 2, -50), "pairs"),
]


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    if dev.platform == "cpu":
        print("NOTE: cpu backend — running interpret mode (lowering "
              "not exercised)")
    rng = np.random.default_rng(0)
    failures = 0
    for name, n, offs_a, offs_b, mode in CASES:
        a = rng.standard_normal((len(offs_a), n)).astype(np.float32)
        b = rng.standard_normal((len(offs_b), n)).astype(np.float32)
        # mask out-of-range band tails like coo_to_dia produces
        for k, d in enumerate(offs_a):
            if d > 0:
                a[k, n - d:] = 0
            elif d < 0:
                a[k, :-d] = a[k, :-d]  # rows shifted are stored at row idx
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        dc_list, idx_map = _plan_maps(offs_a, offs_b)
        want_c, want_cnt = _dia_multiply_xla(
            aj, bj, offs_a=offs_a, idx_map=idx_map,
            dc_count=len(dc_list), n_out=n)
        got_c, got_cnt = dia_multiply_pallas(
            aj, bj, offs_a=offs_a, offs_b=offs_b, mode=mode,
            dc_list=dc_list, n_out=n,
            interpret=(dev.platform == "cpu"))
        c_err = float(jnp.max(jnp.abs(got_c - want_c)))
        denom = float(jnp.max(jnp.abs(want_c)))
        cnt_err = float(jnp.max(jnp.abs(got_cnt - want_cnt)))
        rel = c_err / max(denom, 1e-30)
        ok = rel < 1e-6 and cnt_err == 0.0
        # values-only replay kernel (DiaPlan count-cache path)
        got_vo, none = dia_multiply_pallas(
            aj, bj, offs_a=offs_a, offs_b=offs_b, mode=mode,
            dc_list=dc_list, n_out=n,
            values_only=True, interpret=(dev.platform == "cpu"))
        vo_err = float(jnp.max(jnp.abs(got_vo - got_c)))
        ok = ok and none is None and vo_err == 0.0
        print(f"[{name}:{mode}] D1={len(offs_a)} D2={len(offs_b)} n={n} "
              f"rel_err={rel:.2e} cnt_err={cnt_err:.1f} "
              f"values_only_err={vo_err:.1e} {'ok' if ok else 'FAIL'}")
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

"""Pallas DMA-issue-rate probe: ragged expansion feasibility (round 2).

The element engine's padded-segment design needs: for each A element,
copy one row of a (per-class) padded B table to a computed destination in
a padded product layout.  XLA rates (microbench5): row take ~22ns/row,
row SCATTER ~217ns/row -> both too slow or one-sided.  This measures what
Pallas can do:

  probe A: HBM->HBM direct row copies at dynamic src+dst, K per grid step
  probe B: HBM->VMEM gather then VMEM->HBM contiguous write (staged)
  probe C: same as A but copy width 16 (short-class rows)

Reports ns/row.  Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pem_spgemm_tpu.utils.timing import force_sync

NROWS = 100_000          # elements to expand in the probe
K = 256                  # copies per grid step


def probe_hbm2hbm(W, nrows=NROWS, label=""):
    table = jnp.arange(500_000 * W, dtype=jnp.int32).reshape(500_000, W)
    key = jax.random.PRNGKey(0)
    src = jax.random.randint(key, (nrows,), 0, 500_000, dtype=jnp.int32)
    # destination rows: a permutation (disjoint dst, like real segments)
    dst = jax.random.permutation(key, nrows).astype(jnp.int32)

    def kernel(src_ref, dst_ref, tab, out, sems):
        i = pl.program_id(0)

        def body(k, _):
            s = src_ref[i * K + k]
            d = dst_ref[i * K + k]
            cp = pltpu.make_async_copy(
                tab.at[pl.ds(s, 1)], out.at[pl.ds(d, 1)], sems.at[k])
            cp.start()
            return 0

        lax.fori_loop(0, K, body, 0)

        def wait(k, _):
            s = src_ref[i * K + k]
            d = dst_ref[i * K + k]
            pltpu.make_async_copy(
                tab.at[pl.ds(s, 1)], out.at[pl.ds(d, 1)], sems.at[k]).wait()
            return 0

        lax.fori_loop(0, K, wait, 0)

    grid = nrows // K

    @jax.jit
    def run(src, dst, table):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
            ),
            out_shape=jax.ShapeDtypeStruct((nrows, W), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(src, dst, table)

    out = run(src, dst, table)
    force_sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(src, dst, table)
        force_sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label or f'HBM->HBM W={W}'}: {best*1e3:.2f} ms "
          f"({best/nrows*1e9:.1f} ns/row, "
          f"{nrows*W*4/best/1e9:.1f} GB/s)", flush=True)
    # correctness spot check
    got = np.asarray(out)
    want_rows = np.asarray(table)[np.asarray(src)]
    order = np.argsort(np.asarray(dst))
    ok = np.array_equal(got, want_rows[order])
    print(f"  correct={ok}", flush=True)
    return best


def main():
    # Mosaic constraint: HBM slices must be 128-aligned in the lane dim,
    # so rows are probed at widths 128/256 only.
    print("device:", jax.devices()[0], flush=True)
    probe_hbm2hbm(128)
    probe_hbm2hbm(256)


if __name__ == "__main__":
    main()

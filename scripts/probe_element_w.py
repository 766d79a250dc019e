"""Measure the binned element engine across chunk widths w.

Usage: python scripts/probe_element_w.py [powerlaw|rmat|uniform] [w ...]
Default widths: the auto pick plus 16/32/64.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "powerlaw"
    ws = [int(x) for x in sys.argv[2:]] or [None, 16, 32, 64]
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices())

    from pem_spgemm_tpu.models import synthetic
    from pem_spgemm_tpu.ops.convert import coo_to_tiled
    from pem_spgemm_tpu.ops import binned
    from pem_spgemm_tpu.utils.timing import force_sync

    if which == "rmat":
        coo = synthetic.rmat(scale=16, edge_factor=8, seed=7)
    elif which == "powerlaw":
        coo = synthetic.power_law(n=1_000_000, nnz=3_000_000, seed=42,
                                  hub_correlation=0.1)
    else:
        coo = synthetic.uniform_random(n_rows=1_000_000, n_cols=1_000_000,
                                       nnz=4_000_000, seed=3)
    print(f"{which}: shape={coo.shape} nnz={coo.nnz}", flush=True)
    a = coo_to_tiled(coo, dtype=np.float32)

    for w in ws:
        # fresh operand view per w (chunk/plan caches key on w via args)
        b = coo_to_tiled(coo, dtype=np.float32)
        if w is None:
            w = binned.pick_w(a, b)
            label = f"auto(w={w})"
        else:
            label = f"w={w}"
        t0 = time.time()
        object.__setattr__(a, "_binned_plan_cache", None)
        plan = binned.build_plan_device(a, b, w=w)
        slots = sum(bk.src.shape[0] * bk.m * plan.w for bk in plan.buckets)
        nch = sum(bk.src.shape[0] * bk.m for bk in plan.buckets
                  if not bk.single)
        print(f"[{label}] plan {time.time()-t0:.1f}s products="
              f"{plan.n_products} slots={slots} sort_chunks={nch}",
              flush=True)
        out = plan.run()
        force_sync(out.c_nnz)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = plan.run()
            force_sync(out.c_nnz)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        gf = 2 * plan.n_products / dt / 1e9
        print(f"[{label}] steady {dt*1e3:.1f} ms  {gf:.2f} GF  "
              f"c_nnz={int(out.c_nnz)}", flush=True)


if __name__ == "__main__":
    main()

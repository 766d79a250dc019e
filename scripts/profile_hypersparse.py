"""Profile the binned element engine's plan composition + per-stage time.

Usage: python scripts/profile_hypersparse.py [rmat|powerlaw|uniform]

Reports, for the chosen suite matrix: the bucket histogram (class width,
rows, padded slots, single/sort, scan rounds), the padded-slot total vs
true products, and per-stage device timings (take / sort / dedup) measured
with the tunnel-safe force_sync protocol.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "rmat"
    import jax
    import jax.numpy as jnp
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
    print(f"{which}: shape={coo.shape} nnz={coo.nnz}")
    a = coo_to_tiled(coo, dtype=np.float32)
    b = coo_to_tiled(coo, dtype=np.float32)

    t0 = time.time()
    plan = binned.build_plan_device(a, b)
    print(f"plan: {time.time()-t0:.2f}s  w={plan.w} "
          f"products={plan.n_products} res_chunks={plan.n_res_chunks}")

    tot_slots = 0
    print(f"{'m':>6} {'rows':>9} {'cap':>9} {'slots':>12} "
          f"{'single':>6} {'rounds':>6}")
    for bk in plan.buckets:
        slots = bk.src.shape[0] * bk.m * plan.w
        tot_slots += slots
        print(f"{bk.m:>6} {bk.n_rows:>9} {bk.src.shape[0]:>9} "
              f"{slots:>12} {str(bk.single):>6} {bk.rounds:>6}")
    if plan.win is not None:
        wslots = plan.win[0].shape[0] * binned.WIN
        tot_slots += wslots
        print(f"win    {plan.win[0].shape[0]:>9} windows "
              f"{wslots:>12} slots")
    tot_slots += plan.res_src.shape[0] * plan.w
    print(f"TOTAL padded slots: {tot_slots}  "
          f"(pad ratio {tot_slots/max(plan.n_products,1):.2f})")

    # stage timings: take-only vs take+sort vs full (sort buckets only)
    sort_buckets = [bk for bk in plan.buckets if not bk.single]
    sort_slots = sum(bk.src.shape[0] * bk.m * plan.w for bk in sort_buckets)
    single_slots = sum(bk.src.shape[0] * bk.m * plan.w
                       for bk in plan.buckets if bk.single)
    print(f"sort-path slots: {sort_slots}  single-path slots: "
          f"{single_slots}")

    import functools
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("m", "w"))
    def take_only(table, src, avals, m, w):
        r = src.shape[0]
        raw = table[src]
        cols = raw[:, :, :w].reshape(r, m * w)
        bvals = lax.bitcast_convert_type(raw[:, :, w:],
                                         jnp.float32).reshape(r, m * w)
        vals = bvals * jnp.repeat(avals, w, axis=1)
        return cols, vals

    @functools.partial(jax.jit, static_argnames=("m", "w"))
    def take_sort(table, src, avals, m, w):
        cols, vals = take_only(table, src, avals, m, w)
        return lax.sort((cols, vals), num_keys=1, dimension=1)

    def bench(fn, label, args_list, n=3):
        outs = [fn(*args) for args in args_list]
        for o in outs:
            force_sync(o)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            outs = [fn(*args) for args in args_list]
            for o in outs:
                force_sync(o)
            ts.append(time.perf_counter() - t0)
        print(f"{label:>28}: {min(ts)*1e3:8.1f} ms")
        return min(ts)

    # whole multiply
    t0 = time.perf_counter()
    out = plan.run()
    force_sync(out.c_nnz)
    print(f"full multiply (cold): {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = plan.run()
        force_sync(out.c_nnz)
        print(f"full multiply: {(time.perf_counter()-t0)*1e3:.1f} ms  "
              f"c_nnz={int(out.c_nnz)}", flush=True)

    if "--stages" in sys.argv:
        tbl = plan.table
        big = sorted(sort_buckets,
                     key=lambda bk: -bk.src.shape[0] * bk.m)[:4]
        for bk in big:
            args = [(tbl, bk.src, bk.avals, bk.m, plan.w)]
            lbl = f"m={bk.m} cap={bk.src.shape[0]}"
            bench(take_only, f"take {lbl}", args)
            bench(take_sort, f"take+sort {lbl}", args)
            bench(binned.bucket_multiply, f"full {lbl}",
                  [(tbl, bk.src, bk.avals, bk.m, plan.w, bk.rounds)])


if __name__ == "__main__":
    main()

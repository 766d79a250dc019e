from pem_spgemm_tpu.bench.harness import run_benchmark

__all__ = ["run_benchmark"]

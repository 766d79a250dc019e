from pem_spgemm_tpu.utils.timing import PhaseTimers
from pem_spgemm_tpu.utils.flops import spgemm_flops, compression_ratio

__all__ = ["PhaseTimers", "spgemm_flops", "compression_ratio"]

from pem_spgemm_tpu.models.synthetic import (banded, power_law, rmat,
                                             uniform_random, by_name)

__all__ = ["banded", "power_law", "rmat", "uniform_random", "by_name"]

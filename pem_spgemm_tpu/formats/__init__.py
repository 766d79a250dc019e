from pem_spgemm_tpu.formats.coo import COOMatrix
from pem_spgemm_tpu.formats.tiled import TiledMatrix

__all__ = ["COOMatrix", "TiledMatrix"]

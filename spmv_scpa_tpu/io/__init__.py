from spmv_scpa_tpu.io.loader import load_csr
from spmv_scpa_tpu.io import mmio

__all__ = ["load_csr", "mmio"]

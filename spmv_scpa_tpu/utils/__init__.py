from spmv_scpa_tpu.utils.validation import validate_result, l2_error
from spmv_scpa_tpu.utils.vector import make_x

__all__ = ["validate_result", "l2_error", "make_x"]

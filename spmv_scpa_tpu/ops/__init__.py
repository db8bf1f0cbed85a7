from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.ops.registry import get_strategy, list_strategies, spmv

__all__ = ["spmv_oracle", "get_strategy", "list_strategies", "spmv"]

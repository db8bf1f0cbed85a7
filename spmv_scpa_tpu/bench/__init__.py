from spmv_scpa_tpu.bench.timing import (
    BenchResult,
    compute_gflops,
    time_device_fn,
    time_host_fn,
    time_prepared,
)
from spmv_scpa_tpu.bench.logger import CsvLogger

__all__ = ["BenchResult", "compute_gflops", "time_device_fn",
           "time_host_fn", "time_prepared", "CsvLogger"]

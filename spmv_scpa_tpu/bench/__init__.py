from spmv_scpa_tpu.bench.timing import BenchResult, compute_gflops, time_fn
from spmv_scpa_tpu.bench.logger import CsvLogger

__all__ = ["BenchResult", "compute_gflops", "time_fn", "CsvLogger"]

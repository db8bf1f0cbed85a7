"""Kernel timing + GFLOPS accounting.

Reference semantics to reproduce (SURVEY.md section 5, "tracing"):

* GFLOPS = 2*nnz / (duration_ms * 1e6) — utils.h:70-75;
* on the device backend only the kernel is timed, not host<->device
  transfers (cudaEvent pair around the launch, cuda_csr.cu:224-226).

Under XLA the analog is: prepare() puts matrix data on device and
returns a jitted closure; we warm it up (compile + cache, the analog of
the reference's OMP_WARMUP spin, utils.h:20-30), then time repeated
calls with ``block_until_ready``. Each call includes dispatch overhead,
which is honest: the reference's timed region includes kernel launch
overhead too (that is why its tiny matrices show ~0 GFLOPS).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class BenchResult:
    """Analog of the reference's ``bench`` struct (utils.h:32-36)."""

    duration_ms: float
    gflops: float
    data: np.ndarray | None = None        # result vector y
    reps: int = 1
    all_ms: list = field(default_factory=list)


def compute_gflops(nnz: int, duration_ms: float, ncols: int = 1) -> float:
    """2*nnz flops per matvec column (utils.h:70-75)."""
    if duration_ms <= 0:
        return 0.0
    return 2.0 * nnz * ncols / (duration_ms * 1e6)


def time_fn(fn, x, *, nnz: int, reps: int = 20, warmup: int = 3,
            min_time_s: float = 0.05, agg: str = "median") -> BenchResult:
    """Time ``fn(x)`` (device or host). Warmup runs absorb the XLA
    compile; reps are timed individually and aggregated by median
    (the reference aggregates medians across iterations,
    plots.py:21-53)."""
    import jax

    x = _maybe_device(x)
    y = None
    for _ in range(max(warmup, 1)):
        y = fn(x)
        y = _block(y)

    times = []
    elapsed = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x)
        y = _block(y)
        dt = time.perf_counter() - t0
        times.append(dt * 1e3)
        elapsed += dt
        if elapsed > max(min_time_s * 20, 2.0):
            break
    times_arr = np.asarray(times)
    ms = float(np.median(times_arr) if agg == "median" else times_arr.min())
    ncols = 1 if np.ndim(y) <= 1 else np.shape(y)[-1]
    return BenchResult(duration_ms=ms,
                       gflops=compute_gflops(nnz, ms, ncols),
                       data=np.asarray(y, dtype=np.float64),
                       reps=len(times), all_ms=times)


def _maybe_device(x):
    return x


def _block(y):
    try:
        return y.block_until_ready()
    except AttributeError:
        return y

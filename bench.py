#!/usr/bin/env python
"""Headline benchmark for the driver: SpMV GFLOP/s on the flagship
(ML_Laplace-scale) matrix, best strategy/tuning, real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's best single-matrix CUDA result, ~62.5
GFLOP/s fp64 on ML_Laplace (BASELINE.md; read off
res/plots/cuda/all/spmv/cuda_best_csr_hll.png).

The SuiteSparse files cannot be downloaded here (zero egress), so the
flagship is the ML_Laplace structural stand-in from
spmv_scpa_tpu/testing.py: the ``stencil`` archetype (377k rows, ~23M
nnz, ~60 nnz/row in repeated contiguous runs at fixed offsets —
ML_Laplace is a Laplacian-type FEM matrix whose neighboring rows share
their element neighborhoods, so patterns repeat down the band).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_BEST_GFLOPS = 62.5

# (strategy, params) candidates — the tuned pallas configs plus the
# XLA baseline for safety.
CANDIDATES = [
    ("pallas-pell", {"chunk": 128, "quantum": 16, "window_h": 128,
                     "epilogue_sub": 8}),
    ("pallas-pell", {"chunk": 128, "quantum": 16, "window_h": 128}),
    ("pallas-pell", {"chunk": 64, "quantum": 16, "window_h": 128}),
]


def main() -> int:
    import numpy as np

    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.timing import time_device_fn, warm_compiler
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    A = synth.stencil_csr(377_000, points=6, run_len=12, bandwidth=500,
                          seed=3, name="ml_laplace_like")
    x = make_x(A.n)
    gold = spmv_oracle(A, x)

    best = None
    for name, params in CANDIDATES:
        for attempt in range(2):  # compile service occasionally 500s
            try:
                prep = get_strategy(name).prepare(A, **params)
                r = time_device_fn(prep.raw, x, args=prep.args, nnz=A.nnz)
                validate_result(gold, r.data, what=name)
                break
            except Exception as e:
                print(f"# {name} {params} attempt {attempt}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                time.sleep(10)
                r = None
        if r is None:
            continue
        print(f"# {name} {params}: {r.duration_ms:.4f} ms "
              f"{r.gflops:.2f} GFLOP/s", file=sys.stderr)
        if best is None or r.gflops > best[1]:
            best = (name, r.gflops, r.duration_ms)

    if best is None:
        print(json.dumps({"metric": "spmv_gflops_ml_laplace_like",
                          "value": 0.0, "unit": "GFLOP/s",
                          "vs_baseline": 0.0}))
        return 1

    name, gflops, ms = best
    print(json.dumps({
        "metric": "spmv_gflops_ml_laplace_like",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / REFERENCE_BEST_GFLOPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

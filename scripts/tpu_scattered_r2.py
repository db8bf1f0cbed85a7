#!/usr/bin/env python
"""Scattered-regime battery 2: compacted-PELL tails + delegation +
amazon tuning variants, on the real TPU. One TPU process at a time."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    cases = [
        ("webbase", synth.webbase_csr(m=1_000_000, seed=7),
         [("pallas-hybrid", {}),
          ("pallas-hybrid", {"slots": 8})]),
        ("amazon", synth.amazon_csr(m=262_000, seed=6),
         [("pallas-hybrid", {"slots": 16, "strip_cov": 1.0}),
          ("pallas-hybrid", {"slots": 16, "max_strips": 8}),
          ("pallas-hybrid", {"slots": 24}),
          ("pallas-hybrid", {"slots": 16, "chunk": 128})]),
        ("powerlaw", synth.powerlaw_csr(100_000, 100_000, avg_nnz=8,
                                        seed=5),
         [("pallas-hybrid", {})]),
    ]
    for label, A, strategies in cases:
        x = make_x(A.n)
        gold = spmv_oracle(A, x)
        for name, params in strategies:
            try:
                prep = get_strategy(name).prepare(A, **params)
                r = time_prepared(prep, x)
                validate_result(gold, r.data, what=f"{label}/{name}")
                sol = prep.hbm_bytes / 741.7e9 * 1e3
                mt = prep.meta
                print(f"{label:9s} {params} {r.duration_ms:8.4f} ms "
                      f"{r.gflops:7.2f} GF/s (stream-min {sol:.4f})"
                      f" tail={mt.get('tail_kind')}"
                      f" tail_nnz={mt.get('tail_nnz')}"
                      f" ov={mt.get('ov_slots')}"
                      f" deleg={mt.get('delegated')}", flush=True)
            except Exception as e:
                print(f"{label:9s} {params} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

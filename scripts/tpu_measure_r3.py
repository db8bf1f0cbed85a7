#!/usr/bin/env python
"""Round-3 targeted TPU measurement agenda (run when the axon tunnel
is up; ONE process at a time — .claude/skills/verify/SKILL.md).

Measures the round-3 machinery that was CPU-validated while the
tunnel was down (docs/PERF_LOG.md round 3):

  1. flagship stencil — lane-ELL hybrid (re-confirm 151.5 GF/s / 0.90
     of the stream roofline)
  2. amazon archetype — hybrid with ext gather + chips tail + panel
     merge (VERDICT r2 item 2: target >= 8 GF/s; round 2: 2.8)
  3. webbase archetype — split chips + windowed ext + panel merge
     (projection ~6-8 GF/s; round 2: 1.38)
  4. cant-ish banded + powerlaw — hybrid vs fused PELL head-to-head
  5. pallas-chips standalone on amazon (the CUDA-k3 analog row)

Prints one line per (matrix, strategy): ms / GF/s / vs-roofline.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.roofline import measure_stream_bw
    from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    bw = measure_stream_bw()                       # GB/s
    print(f"# stream roofline: {bw:.1f} GB/s", flush=True)

    # exact suite params (scripts/results.py SYNTH_SUITE)
    cases = [
        ("flagship", synth.stencil_csr(377_000, points=6, run_len=12,
                                       bandwidth=500, seed=3,
                                       name="ml_laplace_like"),
         [("pallas-hybrid", {"idx8": True}), ("pallas-hybrid", {}),
          ("pallas-hybrid-df64", {})]),
        ("amazon", synth.amazon_csr(m=262_000, seed=6),
         [("pallas-hybrid", {"idx8": True}), ("pallas-hybrid", {}),
          ("pallas-chips", {})]),
        ("webbase", synth.webbase_csr(m=1_000_000, seed=7),
         [("pallas-hybrid", {"idx8": True}), ("pallas-hybrid", {})]),
        ("cant", synth.banded_csr(62_000, row_nnz=64, bandwidth=300,
                                  runs=8, seed=2, name="cant_like"),
         [("pallas-hybrid", {}), ("pallas-pell", {})]),
        ("powerlaw", synth.powerlaw_csr(100_000, 100_000, avg_nnz=8,
                                        seed=5),
         [("pallas-hybrid", {}), ("pallas-pell", {})]),
    ]
    for label, A, strategies in cases:
        x = make_x(A.n)
        gold = spmv_oracle(A, x)
        # bandwidth-bound speed of light for 2*nnz flops
        for name, params in strategies:
            try:
                prep = get_strategy(name).prepare(A, **params)
                r = time_prepared(prep, x)
                validate_result(gold, r.data, what=f"{label}/{name}")
                sol_ms = (prep.hbm_bytes / (bw * 1e9) * 1e3
                          if prep.hbm_bytes else float("nan"))
                print(f"{label:9s} {name:14s} {r.duration_ms:8.4f} ms "
                      f"{r.gflops:7.2f} GF/s  "
                      f"vs_roofline={sol_ms / r.duration_ms:.3f}  "
                      f"meta={prep.meta.get('tail_kind', '-')}",
                      flush=True)
            except Exception as e:
                print(f"{label:9s} {name:14s} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

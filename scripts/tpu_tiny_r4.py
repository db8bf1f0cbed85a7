#!/usr/bin/env python
"""Round-4 tiny-matrix (launch-bound) regime study.

The reference publishes cage4/olm1000/west2021 rows at ~0-2 GF/s
(/root/reference/res/plots/cuda/all/spmv/cuda_best_csr_hll.png,
BASELINE.md) — the regime where kernel launch overhead dominates.
This measures our strategies on matching-scale synthetics so
pick_auto's tiny-matrix route is set from data, not guesswork
(VERDICT r3 next-step 5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy, pick_auto
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    rng = np.random.default_rng(7)

    # reference-tiny scale stand-ins (m, nnz approx match)
    cases = [
        ("cage4-ish", synth.random_csr(9, density=0.6, seed=4)),
        ("mhda416-ish", synth.random_csr(416, density=0.05, seed=5)),
        ("olm1000-ish", synth.banded_csr(1000, row_nnz=4, bandwidth=6,
                                         seed=6)),
        ("west2021-ish", synth.random_csr(2021, density=0.0018, seed=7)),
        ("adder-dcop-ish", synth.banded_csr(1813, row_nnz=6,
                                            bandwidth=600, seed=8)),
        ("mid-53k", synth.banded_csr(6000, row_nnz=9, bandwidth=64,
                                     seed=9)),
        ("mid-200k", synth.banded_csr(22000, row_nnz=9, bandwidth=64,
                                      seed=10)),
    ]
    strategies = ["xla-dense", "pallas-pell", "pallas-hybrid",
                  "xla-csr-segsum"]

    for name, A in cases:
        A.name = name
        x = make_x(A.n)
        ref = spmv_oracle(A, x)
        print(f"## {name}: m={A.m} n={A.n} nnz={A.nnz} "
              f"auto={pick_auto(A)}", flush=True)
        for s in strategies:
            try:
                prep = get_strategy(s).prepare(A)
                r = time_prepared(prep, x)
                validate_result(ref, r.data, what=f"{name}/{s}")
                print(f"  {s:16s}: {r.duration_ms * 1e3:9.2f} us  "
                      f"{r.gflops:7.3f} GF/s"
                      + ("  SUSPECT" if r.suspect else ""), flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:100]
                print(f"  {s:16s}: FAILED {type(e).__name__}: {msg}",
                      flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

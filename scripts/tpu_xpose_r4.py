"""On-chip XPOSE measurement for the scattered archetypes (round 4).

Reference anchor: the reference's irregular-matrix CUDA results
(cuda_best_csr_hll.png): webbase-1M ~= 14 GF/s, amazon0302 ~= 37.
Round-3 repo numbers on the (harsher) synthetic stand-ins: webbase
1.95 GF/s, amazon 6.79 (docs/PERF_LOG.md). Targets (VERDICT r3 #1):
webbase >= 5 GF/s, amazon >= 15 GF/s.

Usage: PYTHONPATH=/root/repo python scripts/tpu_xpose_r4.py [--quick]
"""

import sys
import time

import numpy as np

from spmv_scpa_tpu import testing as synth
from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.ops.registry import get_strategy
from spmv_scpa_tpu.ops.xpose import prepare_xpose
from spmv_scpa_tpu.utils.validation import validate_result
from spmv_scpa_tpu.utils.vector import make_x


def main():
    quick = "--quick" in sys.argv
    warm_compiler()
    cases = [
        ("amazon", synth.amazon_csr(m=262_000, seed=6)),
        ("webbase", synth.webbase_csr(m=1_000_000, seed=7)),
    ]
    for name, A in cases:
        A.name = name
        x = make_x(A.n)
        ref = spmv_oracle(A, x)
        t0 = time.time()
        prep = prepare_xpose(A)
        plan_t = time.time() - t0
        print(f"[{name}] plan {plan_t:.1f}s meta={prep.meta} "
              f"hbm={prep.hbm_bytes/1e6:.1f}MB", flush=True)
        r = time_prepared(prep, x)
        validate_result(ref, r.data, what=f"xpose-{name}")
        bw = prep.hbm_bytes / (r.duration_ms * 1e-3) / 1e9
        print(f"[{name}] pallas-xpose: {r.duration_ms:.3f} ms  "
              f"{r.gflops:.2f} GF/s  ~{bw:.0f} GB/s streamed"
              f"{'  SUSPECT' if r.suspect else ''}", flush=True)
        if not quick:
            for sname in ("pallas-hybrid",):
                try:
                    p2 = get_strategy(sname).prepare(A)
                    r2 = time_prepared(p2, x)
                    validate_result(ref, r2.data, what=f"{sname}-{name}")
                    print(f"[{name}] {sname}: {r2.duration_ms:.3f} ms  "
                          f"{r2.gflops:.2f} GF/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"[{name}] {sname}: failed: {e}", flush=True)


if __name__ == "__main__":
    main()

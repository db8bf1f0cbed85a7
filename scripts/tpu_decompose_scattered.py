#!/usr/bin/env python
"""Step-cost decomposition of the hybrid on the scattered archetypes
(webbase/amazon stand-ins) on the real TPU.

Measured context (round 3): webbase 3.64 ms / 1.22 GF/s at
vs_roofline 0.097 — the kernel is ~10x slower than streaming its own
(already padding-bloated) bytes, so the limiter is compute/latency in
one of the stages, not HBM. This script isolates stages via the diag
tokens (results invalid where noted; timings valid):

  full            core + select chains + ext gathers + chips tail
  notail          core + sel + ext            (chips dropped)
  notail,nosel    core + ext                  (select chains dropped)
  notail + ext=False at SAME packing is impossible (packing changes),
  so the ext stages are timed standalone from the prep's own tables.

One TPU process at a time (.claude/skills/verify/SKILL.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    cases = [
        ("amazon", synth.amazon_csr(m=262_000, seed=6)),
        ("webbase", synth.webbase_csr(m=1_000_000, seed=7)),
    ]
    variants = [
        ("full", {}),
        ("notail", {"diag": "notail"}),
        ("notail,nosel", {"diag": "notail,nosel"}),
        ("notail,nosel,nogather", {"diag": "notail,nosel,nogather"}),
    ]
    for label, A in cases:
        x = make_x(A.n)
        for vname, params in variants:
            try:
                prep = get_strategy("pallas-hybrid").prepare(A, **params)
                r = time_prepared(prep, x)
                sol = (prep.hbm_bytes / (741.7e9) * 1e3)
                print(f"{label:9s} {vname:24s} {r.duration_ms:8.4f} ms"
                      f"  (stream-min {sol:.4f} ms)"
                      f"  tail={prep.meta['tail_kind']}", flush=True)
            except Exception as e:
                print(f"{label:9s} {vname:24s} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-4 TPU probes (axon tunnel up; ONE process at a time —
.claude/skills/verify/SKILL.md).

1. **sublane-wise dynamic_gather microbench** — does
   ``jnp.take_along_axis(src, idx, axis=0)`` (operand/indices/output
   all the same (B, 128) shape) lower to a Mosaic vector gather, and
   at what per-element cost vs the one-hot mask-reduce the gather
   pipelines use today (ops/ext_gather.py:_mask_gather)? If ~1 op/el,
   every stage-2 gather can drop from O(3*r_hot) to O(passes) per
   entry (round-4 design note, docs/PERF_LOG.md).
2. **whole-matrix pallas-chips** on the amazon/webbase archetypes —
   the round-4 windowed-x + popularity-split plan (ops/chips_tail.py),
   validated vs the fp64 oracle.
3. hybrid auto vs hybrid+forcechips on the same matrices.

Reference anchor: the irregular rows of
/root/reference/res/plots/cuda/all/spmv/cuda_best_csr_hll.png
(webbase-1M 14 GF/s CSR, amazon0302 37 GF/s HLL; BASELINE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe_sublane_gather(steps: int = 2048, B: int = 512,
                         interpret: bool = False):
    """Per-element cost of same-shape 2D gathers, VMEM-resident (no
    HBM traffic per step) with a serial dependency so Mosaic cannot
    hoist the gather out of the grid loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spmv_scpa_tpu.bench.timing import time_device_fn

    BC = 128
    rng = np.random.default_rng(0)
    src = rng.standard_normal((B, BC)).astype(np.float32)
    idx_s = rng.integers(0, B, (B, BC)).astype(np.int32)
    idx_l = rng.integers(0, BC, (B, BC)).astype(np.int32)

    def make(axis, nsteps):
        def kernel(src_ref, idx_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            carry = src_ref[...] + o_ref[...] * np.float32(1e-30)
            o_ref[...] = jnp.take_along_axis(carry, idx_ref[...],
                                             axis=axis)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(nsteps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, BC), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((B, BC), jnp.float32),
            interpret=interpret)

    Bo = 64          # distinct mask-gathers per one-hot step

    def make_onehot(r_hot, nsteps):
        """today's windowed mask-reduce at reach r_hot."""
        from spmv_scpa_tpu.ops.ext_gather import _mask_gather

        def kernel(src_ref, p_ref, l_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            win = (src_ref[pl.ds(0, r_hot), :]
                   + o_ref[pl.ds(0, r_hot % Bo), :]
                   [:1] * np.float32(1e-30))
            o_ref[...] = jnp.stack(
                [_mask_gather(win, p_ref[c, :], l_ref[c, :])
                 for c in range(Bo)])

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(nsteps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Bo, BC), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((Bo, BC), jnp.float32),
            interpret=interpret)

    for name, fn, nsteps, els_per_step, args in [
        ("lane-wise take_along (axis=1)", make(1, steps), steps,
         B * BC, (jax.device_put(jnp.asarray(idx_l)),)),
        ("sublane take_along (axis=0)", make(0, steps), steps,
         B * BC, (jax.device_put(jnp.asarray(idx_s)),)),
        ("one-hot windowed r_hot=32", make_onehot(32, steps // 8),
         steps // 8, Bo * BC,
         (jax.device_put(jnp.asarray(idx_s[:Bo] % 32)),
          jax.device_put(jnp.asarray(idx_l[:Bo])))),
        ("one-hot windowed r_hot=104", make_onehot(104, steps // 16),
         steps // 16, Bo * BC,
         (jax.device_put(jnp.asarray(idx_s[:Bo] % 104)),
          jax.device_put(jnp.asarray(idx_l[:Bo])))),
    ]:
        try:
            t0 = time.time()
            n_el = nsteps * els_per_step
            r = time_device_fn(fn, src, args=args, nnz=n_el)
            print(f"  {name:32s} {r.duration_ms:8.4f} ms/call "
                  f"({r.duration_ms * 1e6 / n_el:.3f} ns/el over "
                  f"{nsteps} steps; compile+run {time.time() - t0:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"  {name:32s} FAILED: {type(e).__name__}: {msg}",
                  flush=True)


def main() -> int:
    from spmv_scpa_tpu import testing as synth
    from spmv_scpa_tpu.bench.roofline import measure_stream_bw
    from spmv_scpa_tpu.bench.timing import time_prepared, warm_compiler
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x

    warm_compiler()
    print("# probe 1: same-shape 2D gathers", flush=True)
    probe_sublane_gather()

    bw = measure_stream_bw()
    print(f"# stream roofline: {bw:.1f} GB/s", flush=True)

    cases = [
        ("amazon", synth.amazon_csr(m=262_000, seed=6),
         [("pallas-chips", {}),
          ("pallas-hybrid", {"idx8": True}),
          ("pallas-hybrid", {"idx8": True, "diag": "forcechips"})]),
        ("webbase", synth.webbase_csr(m=1_000_000, seed=7),
         [("pallas-chips", {}),
          ("pallas-hybrid", {"idx8": True}),
          ("pallas-hybrid", {"idx8": True, "diag": "forcechips"})]),
    ]
    for label, A, strategies in cases:
        x = make_x(A.n)
        gold = spmv_oracle(A, x)
        for name, params in strategies:
            tag = name + ("+" + params["diag"] if params.get("diag")
                          else "")
            try:
                prep = get_strategy(name).prepare(A, **params)
                r = time_prepared(prep, x)
                validate_result(gold, r.data, what=f"{label}/{tag}")
                sol_ms = (prep.hbm_bytes / (bw * 1e9) * 1e3
                          if prep.hbm_bytes else float("nan"))
                print(f"{label:9s} {tag:28s} {r.duration_ms:8.4f} ms "
                      f"{r.gflops:7.2f} GF/s  "
                      f"vs_roofline={sol_ms / r.duration_ms:.3f}  "
                      f"tail={prep.meta.get('tail_kind', '-')}",
                      flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:200]
                print(f"{label:9s} {tag:28s} FAILED: "
                      f"{type(e).__name__}: {msg}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-4 probe 2: step-overhead amortization + the transposed
lane-gather (TLG) composition.

Probe 1 findings (docs/PERF_LOG.md round 4): Mosaic grid steps cost
~0.3-1 us each; every chips kernel emits 8 rows/step, so whole-matrix
chips plans (3-13k steps) are pure step overhead. Also: lane-wise
take_along_axis is ~free (0.005 ns/el), sublane-wise does NOT compile,
one-hot mask-reduce costs 3*r_hot ops/el.

TLG: out[j, c] = win[sub[c, j], c] via
  transpose(win) -> lane-gather(axis=1, idx=sub) -> transpose back
— an O(1)-per-element 2D gather with the entry's LANE pinned to its
source lane (col % 128), replacing the O(r_hot) one-hot. This probe
measures (a) bare per-step overhead vs rows/step, (b) TLG ns/el,
(c) big-step one-hot for comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spmv_scpa_tpu.bench.timing import time_device_fn, warm_compiler

    warm_compiler()
    BC = 128
    rng = np.random.default_rng(0)

    # ---- (a) bare step overhead: copy kernel, rows/step sweep -------
    print("# (a) per-step overhead (copy kernel)", flush=True)
    for rps in (8, 64, 256):
        steps = 2048 * 8 // rps          # constant total rows
        src = rng.standard_normal((rps, BC)).astype(np.float32)

        def kernel(s_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            o_ref[...] = s_ref[...] + o_ref[...] * np.float32(1e-30)

        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(steps,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rps, BC), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((rps, BC), jnp.float32))
        r = time_device_fn(fn, src, args=(), nnz=steps)
        print(f"  rows/step={rps:4d} steps={steps:5d}: "
              f"{r.duration_ms:8.4f} ms = "
              f"{r.duration_ms * 1e3 / steps:.3f} us/step", flush=True)

    # ---- (b) TLG: transpose -> lane-gather -> transpose -------------
    print("# (b) TLG gather (G rows/step, window R_h=G)", flush=True)
    for G, steps in ((128, 1024), (256, 512)):
        win = rng.standard_normal((G, BC)).astype(np.float32)
        sub = rng.integers(0, G, (steps * BC, G)).astype(np.int32)

        def kernel(w_ref, s_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            wt = (w_ref[...] + o_ref[pl.ds(0, G), :]
                  * np.float32(1e-30)).T          # (BC, G)
            g = jnp.take_along_axis(wt, s_ref[...], axis=1)
            o_ref[...] = g.T                      # (G, BC)

        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(steps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((BC, G), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((G, BC), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((G, BC), jnp.float32))
        try:
            t0 = time.time()
            n_el = steps * G * BC
            r = time_device_fn(fn, win, args=(
                jax.device_put(jnp.asarray(sub)),), nnz=n_el)
            print(f"  G={G:4d}: {r.duration_ms:8.4f} ms = "
                  f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
                  f"({r.duration_ms * 1e3 / steps:.3f} us/step; "
                  f"compile {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"  G={G:4d} FAILED: {type(e).__name__}: {msg}",
                  flush=True)

    # ---- (c) big-step one-hot windowed (64 rows/step) ---------------
    print("# (c) one-hot windowed, 64 rows/step", flush=True)
    from spmv_scpa_tpu.ops.ext_gather import _mask_gather
    for r_hot in (32, 104):
        H = 512
        win = rng.standard_normal((H, BC)).astype(np.float32)
        p = rng.integers(0, r_hot, (64, BC)).astype(np.int32)
        li = rng.integers(0, BC, (64, BC)).astype(np.int32)
        steps = 256

        def kernel(w_ref, p_ref, l_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            wv = w_ref[pl.ds(0, r_hot), :] \
                + o_ref[pl.ds(0, 8), :][:1] * np.float32(1e-30)
            o_ref[...] = jnp.stack(
                [_mask_gather(wv, p_ref[c, :], l_ref[c, :])
                 for c in range(64)])

        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(steps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((64, BC), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((64, BC), jnp.float32))
        n_el = steps * 64 * BC
        try:
            r = time_device_fn(fn, win, args=(
                jax.device_put(jnp.asarray(p)),
                jax.device_put(jnp.asarray(li))), nnz=n_el)
            print(f"  r_hot={r_hot:4d}: {r.duration_ms:8.4f} ms = "
                  f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
                  f"({r.duration_ms * 1e3 / steps:.3f} us/step)",
                  flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"  r_hot={r_hot} FAILED: {type(e).__name__}: {msg}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-4 probe 3b: bisect the S3 Mosaic crash + fix the 2-window
TLG measurement (tpu_probe_r4c.py (a1) had a probe-side shape bug,
(d) crashed the remote compiler with no diagnostics).

Variants build S3 up one op at a time at H=184:
  d1: lane take_along on (184,128)
  d2: + 2-window masked TLG -> (128,128)
  d3: + MXU prefix + end-subtract partials
  d4: + partial TLG route + (64,128) y write   (the full S3)
Each compiles separately so the first failure names the culprit.
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
    H = 184
    b2 = 135
    rng = np.random.default_rng(0)

    def tlg(win, sub):
        wt = win.T
        g = jnp.take_along_axis(wt, sub.T, axis=1)
        return g.T

    LT = np.tril(np.ones((BC, BC), np.float32))
    srcs = rng.standard_normal((b2 * H, BC)).astype(np.float32)
    r1p = rng.integers(0, BC, (b2 * H, BC)).astype(np.uint8)
    subp = rng.integers(0, H, (b2 * BC, BC)).astype(np.uint8)
    prevp = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)
    yr_sub = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)
    yr_lane = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)

    specs = dict(
        grid=(b2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BC, BC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, BC), lambda i: (0, 0),
                               memory_space=pltpu.VMEM))
    args = (jnp.asarray(srcs), jnp.asarray(r1p), jnp.asarray(subp),
            jnp.asarray(prevp), jnp.asarray(yr_sub),
            jnp.asarray(yr_lane))
    n_el = b2 * BC * BC

    def run(name, body):
        def kernel(l_ref, s_ref, r1_ref, sp_ref, pv_ref, ys_ref,
                   yl_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            v = s_ref[...] + o_ref[:1, :] * np.float32(1e-30)
            o_ref[...] = body(l_ref, v, r1_ref, sp_ref, pv_ref,
                              ys_ref, yl_ref)

        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, **specs),
            out_shape=jax.ShapeDtypeStruct((64, BC), jnp.float32))
        try:
            t0 = time.time()
            r = time_device_fn(fn, LT, args=args, nnz=n_el)
            print(f"  {name}: {r.duration_ms:8.4f} ms = "
                  f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
                  f"({r.duration_ms * 1e3 / b2:.3f} us/step; "
                  f"compile {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    def two_win(t1, sp_ref):
        s32 = sp_ref[...].astype(jnp.int32)
        f0 = tlg(t1[:BC], jnp.minimum(s32, BC - 1))
        f1 = tlg(t1[H - BC:], jnp.clip(s32 - (H - BC), 0, BC - 1))
        return jnp.where(s32 < H - BC, f0, f1)

    def d0(l_ref, v, r1_ref, sp_ref, pv_ref, ys_ref, yl_ref):
        return (v[:BC] + v[H - BC:])[:64]

    def d1(l_ref, v, r1_ref, sp_ref, pv_ref, ys_ref, yl_ref):
        t1 = jnp.take_along_axis(v, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        return (t1[:BC] + t1[H - BC:])[:64]

    def d2(l_ref, v, r1_ref, sp_ref, pv_ref, ys_ref, yl_ref):
        t1 = jnp.take_along_axis(v, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        return two_win(t1, sp_ref)[:64]

    def d3(l_ref, v, r1_ref, sp_ref, pv_ref, ys_ref, yl_ref):
        t1 = jnp.take_along_axis(v, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        fin = two_win(t1, sp_ref)
        psum = jax.lax.dot(fin, l_ref[...],
                           precision=jax.lax.Precision.HIGHEST)
        pv = pv_ref[...].astype(jnp.int32)
        part = psum - jnp.where(
            pv < BC - 1,
            jnp.take_along_axis(psum, jnp.minimum(pv, BC - 1), axis=1),
            0.0)
        return part[:64]

    def d4(l_ref, v, r1_ref, sp_ref, pv_ref, ys_ref, yl_ref):
        t1 = jnp.take_along_axis(v, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        fin = two_win(t1, sp_ref)
        psum = jax.lax.dot(fin, l_ref[...],
                           precision=jax.lax.Precision.HIGHEST)
        pv = pv_ref[...].astype(jnp.int32)
        part = psum - jnp.where(
            pv < BC - 1,
            jnp.take_along_axis(psum, jnp.minimum(pv, BC - 1), axis=1),
            0.0)
        ys = tlg(part, ys_ref[...].astype(jnp.int32))
        return jnp.take_along_axis(
            ys, yl_ref[...].astype(jnp.int32), axis=1)[:64]

    print(f"# S3 bisection at H={H}", flush=True)
    for name, body in (("d0 copy(184)", d0),
                       ("d1 lane-gather(184)", d1),
                       ("d2 +2win-TLG", d2),
                       ("d3 +MXU-prefix-part", d3),
                       ("d4 +partial-route (full S3)", d4)):
        run(name, body)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-4 probe 3: XPOSE pipeline primitives.

The XPOSE plan (docs/PERF_LOG.md round 4) breaks the scattered wall
with three stages:
  S1 (Pallas): x-window lane-gather slab -> multiply -> 3-stage
     static route (lane / TLG / lane) -> prod runs grouped by
     out-block, FIXED run size (1 tile-row per (step, out-block)).
  S2 (XLA): major-dim transpose (J1, B2, 128) -> (B2, J1, 128) —
     the all-to-all block shuffle at copy bandwidth.
  S3 (Pallas): per out-block: sequential read -> 2-window TLG route
     to exact row-major slots -> MXU-prefix segmented reduce
     (prod @ lower-tri, gather run ends, subtract) -> partial route
     -> y staging write.

This probe measures each stage's real cost on v5e and retries the
sublane gather at new shapes. All routing planes are random — costs
are data-independent.
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

    try:
        info = pltpu.get_tpu_info()
        print(f"# tpu info: {info}", flush=True)
    except Exception as e:
        print(f"# tpu info unavailable: {type(e).__name__}", flush=True)

    def tlg(win, sub):
        # win (128,128), sub (128,128) int32: out[s,l] = win[sub[s,l],l]
        wt = win.T                          # (l, s)
        g = jnp.take_along_axis(wt, sub.T, axis=1)
        return g.T

    # ---- (a3) sublane take_along retry at (256,128) ------------------
    print("# (a3) sublane take_along_axis(axis=0), src (256,128)",
          flush=True)
    src = rng.standard_normal((256, BC)).astype(np.float32)
    sub = rng.integers(0, 256, (1024 * 256, BC)).astype(np.int32)

    def k_a3(s_ref, i_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        v = s_ref[...] + o_ref[...] * np.float32(1e-30)
        o_ref[...] = jnp.take_along_axis(v, i_ref[...], axis=0)

    fn = pl.pallas_call(
        k_a3,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(1024,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((256, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, BC), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((256, BC), jnp.float32))
    try:
        r = time_device_fn(fn, src, args=(jnp.asarray(sub),),
                           nnz=1024 * 256 * BC)
        print(f"  OK: {r.duration_ms:8.4f} ms = "
              f"{r.duration_ms * 1e6 / (1024 * 256 * BC):.4f} ns/el",
              flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # ---- (a1) masked 2-window TLG route (256,128) -> (128,128) -------
    print("# (a1) 2-window masked TLG route, src (256,128)", flush=True)
    steps = 1024
    sub8 = rng.integers(0, 256, (steps * BC, BC)).astype(np.uint8)

    def k_a1(s_ref, b_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        v = s_ref[...] + o_ref[...] * np.float32(1e-30)
        s32 = b_ref[...].astype(jnp.int32)
        f0 = tlg(v[:BC], jnp.minimum(s32, BC - 1))
        f1 = tlg(v[BC:], jnp.clip(s32 - BC, 0, BC - 1))
        o_ref[...] = jnp.where(s32 < BC, f0, f1)

    fn = pl.pallas_call(
        k_a1,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BC, BC), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((BC, BC), jnp.float32))
    src2 = rng.standard_normal((256, BC)).astype(np.float32)
    n_el = steps * BC * BC
    try:
        r = time_device_fn(fn, src2, args=(jnp.asarray(sub8),), nnz=n_el)
        print(f"  {r.duration_ms:8.4f} ms = "
              f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
              f"({r.duration_ms * 1e3 / steps:.3f} us/step)", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # ---- (e) MXU prefix-sum (128,128) @ lower-tri --------------------
    print("# (e) MXU lane prefix: (128,128) @ LT, HIGHEST", flush=True)
    LT = np.tril(np.ones((BC, BC), np.float32))
    vals = rng.standard_normal((steps * BC, BC)).astype(np.float32)

    def k_e(l_ref, v_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        v = v_ref[...] + o_ref[...] * np.float32(1e-30)
        o_ref[...] = jax.lax.dot(v, l_ref[...],
                                 precision=jax.lax.Precision.HIGHEST)

    fn = pl.pallas_call(
        k_e,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BC, BC), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((BC, BC), jnp.float32))
    r = time_device_fn(fn, LT, args=(jnp.asarray(vals),), nnz=n_el)
    print(f"  {r.duration_ms:8.4f} ms = "
          f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
          f"({r.duration_ms * 1e3 / steps:.3f} us/step)", flush=True)

    # ---- (b) XLA major-dim transpose bandwidth -----------------------
    print("# (b) XLA transpose (J1, B2, 128) -> (B2, J1, 128) f32",
          flush=True)
    for j1, b2 in ((183, 135), (61, 68)):
        p = rng.standard_normal((j1, b2, BC)).astype(np.float32)

        def xp(a):
            return jnp.swapaxes(a, 0, 1)

        slots = j1 * b2 * BC
        r = time_device_fn(xp, p, args=(), nnz=slots)
        gbs = 2 * 4 * slots / (r.duration_ms * 1e6)
        print(f"  ({j1},{b2},128): {r.duration_ms:8.4f} ms = "
              f"{gbs:6.1f} GB/s (rw)", flush=True)

    # ---- (c) S1 mock step --------------------------------------------
    print("# (c) S1 mock: window gather + mul + lane/TLG/lane route",
          flush=True)
    j1 = 183
    W = 61
    xt = rng.standard_normal((BC, W * BC)).astype(np.float32)
    gidx = rng.integers(0, BC, (j1 * BC, BC)).astype(np.uint8)
    asv = rng.standard_normal((j1 * BC, BC)).astype(np.float32)
    r1 = rng.integers(0, BC, (j1 * BC, BC)).astype(np.uint8)
    r2 = rng.integers(0, BC, (j1 * BC, BC)).astype(np.uint8)
    r3 = rng.integers(0, BC, (j1 * BC, BC)).astype(np.uint8)

    def k_c(x_ref, g_ref, a_ref, r1_ref, r2_ref, r3_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xw = x_ref[...] + o_ref[...] * np.float32(1e-30)
        g = jnp.take_along_axis(xw, g_ref[...].astype(jnp.int32), axis=1)
        prod = g * a_ref[...]
        t1 = jnp.take_along_axis(prod, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        t2 = tlg(t1, r2_ref[...].astype(jnp.int32))
        o_ref[...] = jnp.take_along_axis(
            t2, r3_ref[...].astype(jnp.int32), axis=1)

    fn = pl.pallas_call(
        k_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(j1,),
            in_specs=[pl.BlockSpec((BC, BC), lambda i: (0, i % W),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BC, BC), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((BC, BC), jnp.float32))
    n_el = j1 * BC * BC
    try:
        t0 = time.time()
        r = time_device_fn(
            fn, xt, args=(jnp.asarray(gidx), jnp.asarray(asv),
                          jnp.asarray(r1), jnp.asarray(r2),
                          jnp.asarray(r3)), nnz=n_el)
        print(f"  {r.duration_ms:8.4f} ms = "
              f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
              f"({r.duration_ms * 1e3 / j1:.3f} us/step; "
              f"compile {time.time() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # ---- (d) S3 mock step --------------------------------------------
    print("# (d) S3 mock: 2-win TLG route + MXU prefix + partial route",
          flush=True)
    b2 = 135
    H = 184                       # gathered tile-rows per out-block
    srcs = rng.standard_normal((b2 * H, BC)).astype(np.float32)
    subp = rng.integers(0, H, (b2 * BC, BC)).astype(np.uint8)
    r1p = rng.integers(0, BC, (b2 * H, BC)).astype(np.uint8)
    r3p = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)
    ends = np.sort(rng.integers(0, BC, (b2 * BC, BC)), axis=1) \
        .astype(np.uint8)
    yr_sub = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)
    yr_lane = rng.integers(0, BC, (b2 * BC, BC)).astype(np.uint8)

    def k_d(l_ref, s_ref, sp_ref, r1_ref, r3_ref, e_ref, ys_ref,
            yl_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        v = s_ref[...] + o_ref[:1, :1] * np.float32(1e-30)
        t1 = jnp.take_along_axis(v, r1_ref[...].astype(jnp.int32),
                                 axis=1)
        s32 = sp_ref[...].astype(jnp.int32)
        f0 = tlg(t1[:BC], jnp.minimum(s32, BC - 1))
        f1 = tlg(t1[H - BC:], jnp.clip(s32 - (H - BC), 0, BC - 1))
        fin = jnp.where(s32 < H - BC, f0, f1)
        t3 = jnp.take_along_axis(fin, r3_ref[...].astype(jnp.int32),
                                 axis=1)
        psum = jax.lax.dot(t3, l_ref[...],
                           precision=jax.lax.Precision.HIGHEST)
        e32 = e_ref[...].astype(jnp.int32)
        pe = jnp.take_along_axis(psum, e32, axis=1)
        pp = jnp.take_along_axis(
            psum, jnp.maximum(e32 - 1, 0), axis=1)
        part = pe - jnp.where(e32 > 0, pp, 0.0)
        ys = tlg(part, ys_ref[...].astype(jnp.int32))
        o_ref[...] = jnp.take_along_axis(
            ys, yl_ref[...].astype(jnp.int32), axis=1)[:64]

    fn = pl.pallas_call(
        k_d,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(b2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BC, BC), lambda i: (i, 0),
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
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((64, BC), jnp.float32))
    n_el = b2 * BC * BC           # entries ~ final slots
    try:
        t0 = time.time()
        r = time_device_fn(
            fn, LT, args=(jnp.asarray(srcs), jnp.asarray(subp),
                          jnp.asarray(r1p), jnp.asarray(r3p),
                          jnp.asarray(ends), jnp.asarray(yr_sub),
                          jnp.asarray(yr_lane)), nnz=n_el)
        print(f"  {r.duration_ms:8.4f} ms = "
              f"{r.duration_ms * 1e6 / n_el:.4f} ns/el "
              f"({r.duration_ms * 1e3 / b2:.3f} us/step; "
              f"compile {time.time() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())

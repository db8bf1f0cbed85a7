"""XPOSE device pipeline — static-routed transpose SpMV for the
scattered regime.

Reference analog: the reference's irregular-matrix CUDA path
(``cuda_csr.cu:145-178`` texture-cached x + ``cuda_csr.cu:96-140``
block-per-row) whose GPU caches absorb scattered ``x[JA[j]]`` reads.
The TPU rebuild executes the host plan from ``ops/xpose_plan.py``:

  S1  per step: (128,128) x-window lane-gather (Mosaic dynamic_gather,
      ~0.005 ns/el) -> multiply -> TLG+lane static route into
      one-tile-row runs grouped by out-block.  ~0.8 us/step measured
      (scripts/tpu_probe_r4c.py (c)).
  S2  jnp.swapaxes (J1, K1p, 128) -> (K1p, J1, 128): the column-order
      -> row-order all-to-all at copy bandwidth (probe (b)).
  S3  per out-block: windowed TLG + lane route to dense row-major
      slots -> MXU lane-prefix (values @ upper-tri) -> cross-tile-row
      carry prefix (two more MXU ops) -> y[r] = psG[end(r)] -
      psG[end(prev r)] via two 3-stage routed gathers.  ~1.5-2 us/step
      (probe r4c2 (d4)).

All routing planes are uint8 and travel as jit arguments.
"""

from __future__ import annotations

import functools

import numpy as np

from spmv_scpa_tpu.ops.xpose_plan import BC, CCAP, XposePlan, plan_xpose


def _tlg(win, sub):
    """out[s, l] = win[sub[s, l], l] via transpose -> lane dynamic
    gather -> transpose (the only O(1)/element 2D gather Mosaic
    compiles; sublane take_along crashes the backend)."""
    import jax.numpy as jnp
    return jnp.take_along_axis(win.T, sub.T, axis=1).T


def _s1_kernel(W1, K1p):
    import jax.numpy as jnp

    def kernel(win_ref, x_ref, g_ref, a_ref, r2_ref, r3_ref, o_ref):
        xw = x_ref[...]
        g = jnp.take_along_axis(xw, g_ref[...].astype(jnp.int32),
                                axis=1)
        slab = g * a_ref[...]
        outs = []
        for w1 in range(W1):
            r2w = r2_ref[w1 * BC:(w1 + 1) * BC].astype(jnp.int32)
            r3w = r3_ref[w1 * BC:(w1 + 1) * BC].astype(jnp.int32)
            t2 = _tlg(slab, r2w)
            outs.append(jnp.take_along_axis(t2, r3w, axis=1))
        full = outs[0] if W1 == 1 else jnp.concatenate(outs, axis=0)
        o_ref[0] = full[:K1p]

    return kernel


def _s3_kernel(J1, W3):
    import jax
    import jax.numpy as jnp

    def kernel(mid_ref, triu_ref, e127_ref, lts_ref, sub_ref, r3b_ref,
               rp1_ref, ys1_ref, ry1_ref, rp2_ref, ys2_ref, ry2_ref,
               o_ref):
        v = mid_ref[...]                          # (J1, 128)
        if J1 < BC:
            v = jnp.concatenate(
                [v, jnp.zeros((BC - J1, BC), v.dtype)], axis=0)
        s32 = sub_ref[...].astype(jnp.int32)
        t2 = _tlg(v[:BC], jnp.minimum(s32, BC - 1))
        if W3 > 1:
            lo = J1 - BC
            t2b = _tlg(v[lo:lo + BC],
                       jnp.clip(s32 - lo, 0, BC - 1))
            t2 = jnp.where(s32 < BC, t2, t2b)
        fin = jnp.take_along_axis(t2, r3b_ref[...].astype(jnp.int32),
                                  axis=1)
        psum = jax.lax.dot(fin, triu_ref[...],
                           precision=jax.lax.Precision.HIGHEST)
        carry = jax.lax.dot(psum, e127_ref[...],
                            precision=jax.lax.Precision.HIGHEST)
        cpre = jax.lax.dot(lts_ref[...], carry,
                           precision=jax.lax.Precision.HIGHEST)
        psg = psum + cpre

        def ypass(rp_ref, ys_ref, ry_ref):
            h = jnp.take_along_axis(
                psg, rp_ref[...].astype(jnp.int32), axis=1)
            t = _tlg(h, ys_ref[...].astype(jnp.int32))
            r = ry_ref[...].astype(jnp.int32)
            gv = jnp.take_along_axis(t, jnp.minimum(r, BC - 1), axis=1)
            return jnp.where(r < BC, gv, jnp.zeros_like(gv))

        st = (ypass(rp1_ref, ys1_ref, ry1_ref)
              - ypass(rp2_ref, ys2_ref, ry2_ref))
        o_ref[0] = st[:64]

    return kernel


def _mirror_kernel(s_ref, s0_ref, s1_ref, s2_ref, s3_ref, sel_ref,
                   sub_ref, o_ref):
    """Mirror window build: out[s, l] = src[sel[s]][mir_sub[s], l] —
    one TLG (sublane gather within a 128x128 tile) per source window
    (up to 4, scalar-prefetched via msw) + a sublane select."""
    import jax.numpy as jnp
    idx = jnp.broadcast_to(sub_ref[0].astype(jnp.int32).T, (BC, BC))
    sel = jnp.broadcast_to(sel_ref[0].astype(jnp.int32).T, (BC, BC))
    out = _tlg(s0_ref[...], idx)
    for q, r in enumerate((s1_ref, s2_ref, s3_ref), start=1):
        out = jnp.where(sel == q, _tlg(r[...], idx), out)
    o_ref[...] = out


def build_xpose_fns(plan: XposePlan, dtype=None, interpret=False):
    """Compile-ready (raw, args) for an XposePlan. ``raw(x, *args)``
    returns y (m,) in ``dtype`` (f32)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = plan
    dtype = dtype or jnp.float32
    J1, K1p, B2, W1, W3 = p.J1, p.K1p, p.B2, p.W1, p.W3

    mirror = None
    if p.NWm:
        def _src(qi):
            return pl.BlockSpec(
                (BC, BC), lambda i, s, q=qi: (s[i * 4 + q], 0),
                memory_space=pltpu.VMEM)

        mirror = pl.pallas_call(
            _mirror_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(p.NWm,),
                in_specs=[
                    _src(0), _src(1), _src(2), _src(3),
                    # (NWm, 1, BC) so the trailing block dims span the
                    # array (Mosaic rejects a (1, 128) sublane block)
                    pl.BlockSpec((1, 1, BC), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),   # mir_sel
                    pl.BlockSpec((1, 1, BC), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),   # mir_sub
                ],
                out_specs=pl.BlockSpec((BC, BC), lambda i, s: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((p.NWm * BC, BC), dtype),
            interpret=interpret)

    s1 = pl.pallas_call(
        _s1_kernel(W1, K1p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(J1,),
            in_specs=[
                pl.BlockSpec((BC, BC), lambda i, w: (w[i], 0),
                             memory_space=pltpu.VMEM),      # x_ext win
                pl.BlockSpec((BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),      # gidx
                pl.BlockSpec((BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),      # asv
                pl.BlockSpec((W1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),      # r2
                pl.BlockSpec((W1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),      # r3
            ],
            out_specs=pl.BlockSpec((1, K1p, BC), lambda i, w: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((J1, K1p, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (p.NR + p.NWm * BC) * BC * 4 + (8 << 20), 120 << 20)),
        interpret=interpret)

    s3 = pl.pallas_call(
        _s3_kernel(J1, W3),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B2,),
            in_specs=[
                pl.BlockSpec((J1, BC), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),      # mid
                pl.BlockSpec(memory_space=pltpu.VMEM),      # triu
                pl.BlockSpec(memory_space=pltpu.VMEM),      # e127
                pl.BlockSpec(memory_space=pltpu.VMEM),      # lts
            ] + [pl.BlockSpec((BC, BC), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec((1, 64, BC), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((B2, 64, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 << 20),
        interpret=interpret)

    triu = jnp.asarray(np.triu(np.ones((BC, BC), np.float32)), dtype)
    e127 = jnp.asarray(
        (np.arange(BC)[:, None] == CCAP).astype(np.float32)
        * np.ones((1, BC), np.float32), dtype)
    lts = jnp.asarray(
        (np.arange(BC)[:, None] > np.arange(BC)[None, :])
        .astype(np.float32), dtype)

    dev = jax.device_put
    args = (
        dev(jnp.asarray(p.win_of_step)),
        dev(jnp.asarray(p.gidx)), dev(jnp.asarray(p.asv, dtype)),
        dev(jnp.asarray(p.r2)), dev(jnp.asarray(p.r3)),
        dev(jnp.asarray(p.sub)), dev(jnp.asarray(p.r3b)),
        dev(jnp.asarray(p.rpre1)), dev(jnp.asarray(p.ys1)),
        dev(jnp.asarray(p.r3y1)),
        dev(jnp.asarray(p.rpre2)), dev(jnp.asarray(p.ys2)),
        dev(jnp.asarray(p.r3y2)),
        dev(jnp.asarray(p.msw)),
        dev(jnp.asarray(p.mir_sel)[:, None, :]),
        dev(jnp.asarray(p.mir_sub)[:, None, :]),
        dev(jnp.asarray(p.v_row)),
        triu, e127, lts,
    )
    m, m2, n, NR, NWm = p.m, p.m2, p.n, p.NR, p.NWm
    n_virt = int(p.v_row.size)

    def raw(x, win_of, gidx, asv, r2, r3, sub, r3b,
            rp1, ys1, ry1, rp2, ys2, ry2, msw, mir_sel, mir_sub,
            v_row, triu_a, e127_a, lts_a):
        xf = jnp.concatenate(
            [x.astype(dtype), jnp.zeros(NR * BC - n, dtype)])
        x_ext = xf.reshape(NR, BC)
        if NWm:
            x_ext = jnp.concatenate(
                [x_ext,
                 mirror(msw, x_ext, x_ext, x_ext, x_ext,
                        mir_sel, mir_sub)], axis=0)
        prod = s1(win_of, x_ext, gidx, asv, r2, r3)
        mid = jnp.swapaxes(prod, 0, 1).reshape(K1p * J1, BC)
        stage = s3(mid, triu_a, e127_a, lts_a, sub, r3b,
                   rp1, ys1, ry1, rp2, ys2, ry2)
        # strided blocks: global row = b + ri*B2 -> one XLA transpose
        y_all = jnp.swapaxes(stage.reshape(B2, 64 * BC), 0, 1) \
            .reshape(-1)[:m2]
        if n_virt:
            # virtual (split-row) sums land back on their real rows;
            # duplicates accumulate (a few thousand elements)
            return y_all[:m].at[v_row].add(
                y_all[m:], mode="promise_in_bounds")
        return y_all[:m]

    return raw, args


def prepare_xpose(A, dtype=None, interpret=False, Prepared=None, **_):
    import jax.numpy as jnp

    from spmv_scpa_tpu.ops.registry import Prepared as _P
    from spmv_scpa_tpu.ops.registry import bind
    Prepared = Prepared or _P
    dtype = dtype or jnp.float32

    plan = plan_xpose(A)
    if plan is None:
        raise ValueError(
            "pallas-xpose: matrix outside the v1 planning envelope "
            "(concentrated (window, block) cells, >4M entries, or a "
            ">16k-entry row); use pallas-hybrid/pallas-pell")
    raw, args = build_xpose_fns(plan, dtype=dtype, interpret=interpret)
    hbm = plan.plan_bytes + 2 * plan.J1 * plan.K1p * BC * 4
    return Prepared(
        "pallas-xpose", A.name, bind(raw, args), on_device=True,
        nnz=A.nnz, raw=raw, args=args, hbm_bytes=int(hbm),
        meta={"J1": plan.J1, "B2": plan.B2, "W1": plan.W1,
              "W3": plan.W3, "NWm": plan.NWm,
              "fill": A.nnz / max(plan.J1 * CCAP * BC, 1)})


def register_xpose(register, StrategySpec, Prepared):
    register(StrategySpec(
        "pallas-xpose", "XPOSE", "pallas",
        "cuda_csr.cu:145-178 (texture-cached x for scattered reads) "
        "rebuilt as a static-routed transpose: gather in column "
        "order, XLA block transpose, reduce in row order",
        prepare=functools.partial(prepare_xpose, Prepared=Prepared)))

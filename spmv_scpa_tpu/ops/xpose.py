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

STEP BATCHING (round 4): probe 1 measured ~1-1.6 us of grid-step
overhead per step — at 250 steps that dwarfed the actual VPU/MXU work.
All three kernels therefore process G=8 logical sub-steps per grid
step: x_ext sits whole in VMEM as a (NWin, 128, 128) window table
(webbase: ~12 MB of the 128 MB VMEM) and each sub-step picks its
window with one dynamic leading-dim load instead of per-step BlockSpec
indexing. Grid lengths drop 8x; the unrolled sub-step bodies pipeline
back-to-back inside one kernel invocation.

All routing planes are uint8 and travel as jit arguments.
"""

from __future__ import annotations

import functools

import numpy as np

from spmv_scpa_tpu.ops.xpose_plan import (BC, CCAP, X_EXT_BUDGET,
                                          XposePlan, plan_xpose)

G_SUB = 8                    # logical sub-steps per grid step
# x_ext window-table VMEM residency cap, DERIVED from the planner's
# X_EXT_BUDGET (which it enforces via _reject, so callers fall back)
# plus the worst-case G_SUB mirror-window padding this module adds —
# the two bounds cannot drift apart (ADVICE r4 item 1).
X_VMEM_CAP = X_EXT_BUDGET + (G_SUB - 1) * BC * BC * 4


def _tlg(win, sub):
    """out[s, l] = win[sub[s, l], l] via transpose -> lane dynamic
    gather -> transpose (the only O(1)/element 2D gather Mosaic
    compiles; sublane take_along crashes the backend)."""
    import jax.numpy as jnp
    return jnp.take_along_axis(win.T, sub.T, axis=1).T


def _s1_kernel(W1, K1p, G1):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(win_ref, x_ref, g_ref, a_ref, r2_ref, r3_ref, o_ref):
        i = pl.program_id(0)
        for g in range(G1):
            xw = x_ref[win_ref[i * G1 + g]]
            gv = jnp.take_along_axis(
                xw, g_ref[g * BC:(g + 1) * BC].astype(jnp.int32),
                axis=1)
            slab = gv * a_ref[g * BC:(g + 1) * BC]
            outs = []
            for w1 in range(W1):
                o = (g * W1 + w1) * BC
                r2w = r2_ref[o:o + BC].astype(jnp.int32)
                r3w = r3_ref[o:o + BC].astype(jnp.int32)
                t2 = _tlg(slab, r2w)
                outs.append(jnp.take_along_axis(t2, r3w, axis=1))
            full = outs[0] if W1 == 1 else jnp.concatenate(outs, axis=0)
            o_ref[g] = full[:K1p]

    return kernel


def _s3_kernel(J1, W3, G3):
    import jax
    import jax.numpy as jnp

    def kernel(mid_ref, triu_ref, e127_ref, lts_ref, sub_ref, r3b_ref,
               rp1_ref, ys1_ref, ry1_ref, rp2_ref, ys2_ref, ry2_ref,
               o_ref):
        for g in range(G3):
            v = mid_ref[g * J1:(g + 1) * J1]          # (J1, 128)
            if J1 < BC:
                v = jnp.concatenate(
                    [v, jnp.zeros((BC - J1, BC), v.dtype)], axis=0)
            gb = slice(g * BC, (g + 1) * BC)
            s32 = sub_ref[gb].astype(jnp.int32)
            t2 = _tlg(v[:BC], jnp.minimum(s32, BC - 1))
            if W3 > 1:
                lo = J1 - BC
                t2b = _tlg(v[lo:lo + BC],
                           jnp.clip(s32 - lo, 0, BC - 1))
                t2 = jnp.where(s32 < BC, t2, t2b)
            fin = jnp.take_along_axis(
                t2, r3b_ref[gb].astype(jnp.int32), axis=1)
            psum = jax.lax.dot(fin, triu_ref[...],
                               precision=jax.lax.Precision.HIGHEST)
            carry = jax.lax.dot(psum, e127_ref[...],
                                precision=jax.lax.Precision.HIGHEST)
            cpre = jax.lax.dot(lts_ref[...], carry,
                               precision=jax.lax.Precision.HIGHEST)
            psg = psum + cpre

            def ypass(rp_ref, ys_ref, ry_ref):
                h = jnp.take_along_axis(
                    psg, rp_ref[gb].astype(jnp.int32), axis=1)
                t = _tlg(h, ys_ref[gb].astype(jnp.int32))
                r = ry_ref[gb].astype(jnp.int32)
                gvv = jnp.take_along_axis(
                    t, jnp.minimum(r, BC - 1), axis=1)
                return jnp.where(r < BC, gvv, jnp.zeros_like(gvv))

            st = (ypass(rp1_ref, ys1_ref, ry1_ref)
                  - ypass(rp2_ref, ys2_ref, ry2_ref))
            o_ref[g] = st[:64]

    return kernel


def _mirror_kernel(Gm):
    """Mirror window build: out[s, l] = src[sel[s]][mir_sub[s], l] —
    one TLG (sublane gather within a 128x128 tile) per source window
    (up to 4, picked by a dynamic leading-dim load from the resident
    window table) + a sublane select; Gm windows per grid step."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(msw_ref, x_ref, sel_ref, sub_ref, o_ref):
        i = pl.program_id(0)
        for g in range(Gm):
            j = i * Gm + g
            # [g] keeps the (1, BC) axis so .T yields the (BC, 1)
            # sublane column (a 1-D .T is a no-op and routes by lane)
            idx = jnp.broadcast_to(
                sub_ref[g].astype(jnp.int32).T, (BC, BC))
            sel = jnp.broadcast_to(
                sel_ref[g].astype(jnp.int32).T, (BC, BC))
            out = _tlg(x_ref[msw_ref[j * 4]], idx)
            for q in range(1, 4):
                out = jnp.where(sel == q,
                                _tlg(x_ref[msw_ref[j * 4 + q]], idx),
                                out)
            o_ref[g * BC:(g + 1) * BC] = out

    return kernel


def _pad_rows(a, blocks_from, blocks_to, fill):
    """Pad a (blocks_from*BC, BC) plane to blocks_to blocks."""
    if blocks_to == blocks_from:
        return a
    ext = np.full(((blocks_to - blocks_from) * BC, BC), fill, a.dtype)
    return np.concatenate([a, ext], axis=0)


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

    # --- batching geometry -------------------------------------------
    Gm = G_SUB
    NWmp = -(-p.NWm // Gm) * Gm if p.NWm else 0
    NWin = p.NR // BC + NWmp               # resident window-table len
    x_bytes = NWin * BC * BC * 4
    if x_bytes > X_VMEM_CAP:
        raise ValueError(
            f"pallas-xpose: x_ext window table {x_bytes} B exceeds the "
            f"VMEM residency cap {X_VMEM_CAP} B")
    G1 = G_SUB                             # J1 is always a multiple of 8
    G3 = G_SUB                             # S3 runs K1p/8 steps

    msw = np.zeros(max(NWmp, 1) * 4, np.int32)
    msw[:p.NWm * 4] = p.msw[:p.NWm * 4]
    mir_sel = np.zeros((max(NWmp, 1), BC), np.uint8)
    mir_sel[:p.NWm] = p.mir_sel[:p.NWm]
    mir_sub = np.zeros((max(NWmp, 1), BC), np.uint8)
    mir_sub[:p.NWm] = p.mir_sub[:p.NWm]

    mirror = None
    if p.NWm:
        mirror = pl.pallas_call(
            _mirror_kernel(Gm),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NWmp // Gm,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # x table
                    pl.BlockSpec((Gm, 1, BC), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),  # mir_sel
                    pl.BlockSpec((Gm, 1, BC), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),  # mir_sub
                ],
                out_specs=pl.BlockSpec((Gm * BC, BC),
                                       lambda i, s: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((NWmp * BC, BC), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    p.NR * BC * 4 + (16 << 20), 120 << 20)),
            interpret=interpret)

    s1 = pl.pallas_call(
        _s1_kernel(W1, K1p, G1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(J1 // G1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),    # x_ext table
                pl.BlockSpec((G1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),    # gidx
                pl.BlockSpec((G1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),    # asv
                pl.BlockSpec((G1 * W1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),    # r2
                pl.BlockSpec((G1 * W1 * BC, BC), lambda i, w: (i, 0),
                             memory_space=pltpu.VMEM),    # r3
            ],
            out_specs=pl.BlockSpec((G1, K1p, BC), lambda i, w: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((J1, K1p, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(x_bytes + (24 << 20), 126 << 20)),
        interpret=interpret)

    # S3 runs K1p/G3 steps over K1p-padded planes; pad blocks carry the
    # init fills (sub 0, r3b CCAP, r3y 255) so they emit exact zeros.
    sub_p = _pad_rows(p.sub, B2, K1p, 0)
    r3b_p = _pad_rows(p.r3b, B2, K1p, CCAP)
    rp1_p = _pad_rows(p.rpre1, B2, K1p, 0)
    ys1_p = _pad_rows(p.ys1, B2, K1p, 0)
    ry1_p = _pad_rows(p.r3y1, B2, K1p, 255)
    rp2_p = _pad_rows(p.rpre2, B2, K1p, 0)
    ys2_p = _pad_rows(p.ys2, B2, K1p, 0)
    ry2_p = _pad_rows(p.r3y2, B2, K1p, 255)

    s3 = pl.pallas_call(
        _s3_kernel(J1, W3, G3),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(K1p // G3,),
            in_specs=[
                pl.BlockSpec((G3 * J1, BC), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),      # mid
                pl.BlockSpec(memory_space=pltpu.VMEM),      # triu
                pl.BlockSpec(memory_space=pltpu.VMEM),      # e127
                pl.BlockSpec(memory_space=pltpu.VMEM),      # lts
            ] + [pl.BlockSpec((G3 * BC, BC), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec((G3, 64, BC), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((K1p, 64, BC), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
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
        dev(jnp.asarray(sub_p)), dev(jnp.asarray(r3b_p)),
        dev(jnp.asarray(rp1_p)), dev(jnp.asarray(ys1_p)),
        dev(jnp.asarray(ry1_p)),
        dev(jnp.asarray(rp2_p)), dev(jnp.asarray(ys2_p)),
        dev(jnp.asarray(ry2_p)),
        dev(jnp.asarray(msw)),
        dev(jnp.asarray(mir_sel)[:, None, :]),
        dev(jnp.asarray(mir_sub)[:, None, :]),
        dev(jnp.asarray(p.v_row)),
        triu, e127, lts,
    )
    m, m2, n, NR, NWm = p.m, p.m2, p.n, p.NR, p.NWm
    n_virt = int(p.v_row.size)

    def raw(x, win_of, gidx, asv, r2, r3, sub, r3b,
            rp1, ys1, ry1, rp2, ys2, ry2, msw_a, mir_sel_a, mir_sub_a,
            v_row, triu_a, e127_a, lts_a):
        xf = jnp.concatenate(
            [x.astype(dtype), jnp.zeros(NR * BC - n, dtype)])
        x_ext = xf.reshape(NR, BC)
        if NWm:
            xtab = x_ext.reshape(NR // BC, BC, BC)
            mirr = mirror(msw_a, xtab, mir_sel_a, mir_sub_a)
            x_ext = jnp.concatenate([x_ext, mirr], axis=0)
        xwin = x_ext.reshape(-1, BC, BC)
        prod = s1(win_of, xwin, gidx, asv, r2, r3)
        mid = jnp.swapaxes(prod, 0, 1).reshape(K1p * J1, BC)
        stage = s3(mid, triu_a, e127_a, lts_a, sub, r3b,
                   rp1, ys1, ry1, rp2, ys2, ry2)[:B2]
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


def prepare_xpose(A, dtype=None, interpret=None, Prepared=None, **_):
    import jax.numpy as jnp

    from spmv_scpa_tpu.ops.registry import Prepared as _P
    from spmv_scpa_tpu.ops.registry import bind
    from spmv_scpa_tpu.utils.platform import is_tpu
    Prepared = Prepared or _P
    dtype = dtype or jnp.float32
    if interpret is None:
        interpret = not is_tpu()

    plan = plan_xpose(A)
    if plan is None:
        raise ValueError(
            "pallas-xpose: matrix outside the v1 planning envelope "
            "(concentrated (window, block) cells, >4M entries, or a "
            ">16k-entry row); use pallas-hybrid/pallas-pell")
    raw, args = build_xpose_fns(plan, dtype=dtype, interpret=interpret)
    # Honest per-call HBM traffic (ADVICE r4 item 3): routing planes
    # (S3's padded to K1p blocks), the mid write+read around the S2
    # transpose, the (K1p, 64, 128) S3 staging, and the VMEM-resident
    # x window table (read from HBM once per call).
    NWmp = -(-plan.NWm // G_SUB) * G_SUB if plan.NWm else 0
    x_bytes = (plan.NR // BC + NWmp) * BC * BC * 4
    hbm = (plan.plan_bytes
           + 8 * (plan.K1p - plan.B2) * BC * BC        # S3 plane pad
           + 2 * plan.J1 * plan.K1p * BC * 4           # mid w+r
           + plan.K1p * 64 * BC * 4                    # S3 staging
           + x_bytes)
    return Prepared(
        "pallas-xpose", A.name, bind(raw, args), on_device=True,
        nnz=A.nnz, raw=raw, args=args, hbm_bytes=int(hbm),
        meta={"J1": plan.J1, "B2": plan.B2, "W1": plan.W1,
              "W3": plan.W3, "NWm": plan.NWm, "x_bytes": int(x_bytes),
              "fill": A.nnz / max(plan.J1 * CCAP * BC, 1)})


def register_xpose(register, StrategySpec, Prepared):
    register(StrategySpec(
        "pallas-xpose", "XPOSE", "pallas",
        "cuda_csr.cu:145-178 (texture-cached x for scattered reads) "
        "rebuilt as a static-routed transpose: gather in column "
        "order, XLA block transpose, reduce in row order",
        prepare=functools.partial(prepare_xpose, Prepared=Prepared),
        tunable=False))  # geometry is plan-derived; no chunk axis

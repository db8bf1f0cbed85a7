"""Pallas/Mosaic TPU SpMV kernels.

Design (see SURVEY.md section 7 and the format docstrings):

* **x is VMEM-resident** as a ``(P, 128)`` panel view — the TPU analog
  of the reference's texture-cached x (cuda_csr.cu:145-178, its fastest
  CSR variant). A column panel is one dynamically-sliced sublane row.
* **Matrix tiles stream HBM → VMEM** through the Pallas grid pipeline
  (double-buffered by Mosaic), the analog of the coalesced global-memory
  reads the reference engineers by hand (cuda_hll.cu:49-72).
* **Gather is panel-local**: ``tpu.dynamic_gather`` (via
  ``jnp.take_along_axis``) only supports same-shape tiles, so PELL
  stores lane-local column indices (< 128). BCSR needs no gather at
  all (dense tiles).
* **No scatter**: each tile quantum emits an 8-row partial; the
  windowed one-hot MXU segment-sum kernel (ops/segsum_kernel.py)
  assembles y. The partial traffic is ``T*8*nq*4 B`` ≈ vals/quantum.
* **Chunked grid**: each grid step streams ``chunk`` tiles; the kernel
  body is vectorized over the whole chunk (one gather, one multiply,
  one MXU reduction) — per-tile small VPU ops, not HBM bandwidth, were
  the bottleneck in a naive per-tile loop.

The ``chunk`` and ``quantum`` parameters are the tuning axes mirroring
the reference's warps_per_block sweep (main.c:265-269) and
thread/warp/halfwarp-per-row strategy family (cuda_csr.cu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_scpa_tpu.formats.bcsr import csr_to_bcsr
from spmv_scpa_tpu.formats.csr import CSR
from spmv_scpa_tpu.formats.panel_ell import (BC, BR, DEFAULT_QUANTUM,
                                             DEFAULT_WINDOW_H, csr_to_pell)
from spmv_scpa_tpu.ops.segsum_kernel import (_dot_passes,
                                             _dot_passes_ncat,
                                             make_span_segsum,
                                             make_visit_masks,
                                             make_window_segsum)

DEFAULT_CHUNK = 64           # tiles per grid step (tunable sweep axis)
X_VMEM_BUDGET = 12 << 20     # max bytes of x kept resident in VMEM


def _auto_interpret() -> bool:
    from spmv_scpa_tpu.utils.platform import is_tpu
    return not is_tpu()


def _pad_tiles(arr: np.ndarray, t_pad: int, fill=0):
    if arr.shape[0] == t_pad:
        return arr
    pad = [(0, t_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def _tile_kernel(chunk: int, gathered: bool, nq: int,
                 precision_passes: int = 3, dedup_u: int = 0):
    """Kernel body: process ``chunk`` tiles of (8,128) slots.

    refs (dedup_u == 0):  pan (SMEM (8,chunk): 8 steps of panel ids per
    block), x (P,128) VMEM whole, vals (chunk*8,128),
    [lcol (chunk*8,128) int8 if gathered], out (chunk*8,nq),
    xg (chunk,128) VMEM scratch.

    refs (dedup_u == U > 0): pan is replaced by pdict (SMEM (8,U): the
    step's <=U DISTINCT panel ids) plus plidx (VMEM (8,chunk): each
    tile's index into the dict).

    1. x-panel assembly — either one dynamic sublane slice PER TILE
       (chunk small ops/step: the round-1 per-step bottleneck,
       docs/PERF_LOG.md), or with dedup U slices + a one-hot MXU
       distribute: ohT[u,c] = (plidx[c]==u), xv_c = ohT^T @ xg[:U]
       (bf16x3 split of xg: ~2^-25 rel — below f32 noise);
    2. ONE sublane-broadcast reshape to (chunk*8,128) for the chunk;
    3. one same-shape lane gather over the whole chunk (PELL only);
    4. one (chunk*8,128) multiply;
    5. one MXU matmul against the (128,nq) quantum-segment matrix,
       f32-grade via a manual bf16 split (``precision_passes``).
    """
    q = BC // nq
    dn0 = (((0,), (0,)), ((), ()))
    dn1 = (((1,), (0,)), ((), ()))

    def kernel(pan_ref, *rest):
        if dedup_u:
            plidx_ref, x_ref, vals_ref, *rest = rest
        else:
            x_ref, vals_ref, *rest = rest
        if gathered:
            lcol_ref, out_ref, xg_ref = rest
        else:
            out_ref, xg_ref = rest
        # pan_ref: (8, chunk|U) SMEM block covering 8 grid steps (a
        # whole-array scalar prefetch overflows the ~1 MB SMEM once
        # tile counts pass ~256k — hit on webbase-scale matrices)
        i = pl.program_id(0)

        if dedup_u:
            for u in range(dedup_u):  # unrolled: u is static
                xg_ref[u:u + 1, :] = x_ref[pl.ds(pan_ref[i % 8, u], 1), :]
            pl_row = plidx_ref[pl.ds(i % 8, 1), :]        # (1, chunk)
            su = jax.lax.broadcasted_iota(jnp.int32, (dedup_u, chunk), 0)
            ohT = (su == pl_row).astype(jnp.bfloat16)     # (U, chunk)
            xgu = xg_ref[0:dedup_u, :]                    # (U, 128)
            b1 = xgu.astype(jnp.bfloat16)
            r1 = xgu - b1.astype(jnp.float32)
            b2 = r1.astype(jnp.bfloat16)
            b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
            xv_c = None
            for b in (b1, b2, b3):
                t = jax.lax.dot_general(
                    ohT, b, dimension_numbers=dn0,
                    preferred_element_type=jnp.float32)
                xv_c = t if xv_c is None else xv_c + t    # (chunk, 128)
        else:
            for c in range(chunk):  # unrolled: c is static
                xg_ref[c:c + 1, :] = x_ref[pl.ds(pan_ref[i % 8, c], 1), :]
            xv_c = xg_ref[:]
        # (chunk,128) panel rows -> (chunk*8,128): one sublane-broadcast
        # reshape instead of chunk per-tile broadcasts
        xv = jnp.broadcast_to(xv_c[:, None, :],
                              (chunk, BR, BC)).reshape(chunk * BR, BC)
        if gathered:
            # dynamic_gather accepts int8 indices directly (probed)
            xv = jnp.take_along_axis(xv, lcol_ref[:], axis=1)
        prod = vals_ref[:] * xv
        lane = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 0)
        seg = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 1)
        seg_mat = (lane // q == seg).astype(jnp.bfloat16)  # 0/1: exact
        # f32-grade MXU reduction via manual bf16x3 split of the
        # products (the default f32 path is one bf16 pass ~1.7e-3 rel
        # err; Precision.HIGHEST costs 6 passes; this costs 3 —
        # see ops/segsum_kernel.dot_f32_via_bf16x3).

        def dot(x):
            return jax.lax.dot_general(
                x, seg_mat, dimension_numbers=dn1,
                preferred_element_type=jnp.float32)

        acc = None
        rem = prod
        for _ in range(precision_passes):
            hi = rem.astype(jnp.bfloat16)
            term = dot(hi)
            acc = term if acc is None else acc + term
            rem = rem - hi.astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def _window_pad_tiles(vals, panel, rowblk, window_h: int, chunk: int,
                      min_chunk: int | None = None,
                      num_win: int | None = None):
    """Insert dummy tiles so each row-block window's tile count is a
    multiple of ``chunk`` (tiles must already be in row-block order —
    true for BCSR); ``chunk`` shrinks by powers of two toward
    ``min_chunk`` while padding waste exceeds ~10%.

    ``num_win`` must be ceil(num_row_blocks / window_h): every window,
    including EMPTY leading/interior/trailing ones, gets at least one
    chunk of sentinel tiles so the windowed epilogue visits (and
    zero-initializes) every output block.
    Returns (vals, panel, window, rbl, chunk)."""
    T = vals.shape[0]
    if rowblk.ndim == 1:
        rowblk = rowblk[:, None]
    nq = rowblk.shape[1]
    win_of = rowblk[:, 0] // window_h
    if num_win is None:
        num_win = int(win_of.max(initial=0)) + 1
    counts = np.zeros(num_win, dtype=np.int64)
    np.add.at(counts, win_of, 1)
    min_chunk = min_chunk or chunk
    while chunk > min_chunk:
        waste = int((-(-counts // chunk) * chunk - counts).sum())
        if waste <= 0.1 * max(T, 1):
            break
        chunk //= 2
    chunk = max(chunk, min_chunk)
    counts_pad = np.maximum(-(-counts // chunk) * chunk, chunk)
    base = np.zeros(num_win, dtype=np.int64)
    np.cumsum(counts_pad[:-1], out=base[1:])
    t_new = int(counts_pad.sum())
    # position of each old tile in the padded layout
    within = np.arange(T) - (np.cumsum(counts) - counts)[win_of]
    pos = base[win_of] + within
    out_vals = np.zeros((t_new,) + vals.shape[1:], dtype=vals.dtype)
    out_panel = np.zeros(t_new, dtype=np.int32)
    out_rbl = np.full((t_new, nq), window_h, dtype=np.int32)
    out_vals[pos] = vals
    out_panel[pos] = panel
    out_rbl[pos] = rowblk - (win_of * window_h)[:, None]
    window = np.repeat(np.arange(num_win, dtype=np.int32), counts_pad)
    return out_vals, out_panel, window, out_rbl, chunk


def _make_tile_spmv(*, name: str, m: int, n: int, vals: np.ndarray,
                    lcol: np.ndarray | None, panel: np.ndarray,
                    rbl: np.ndarray, window: np.ndarray, window_h: int,
                    dtype, chunk: int, interpret: bool | None,
                    epilogue_sub: int = 8, idx_dtype=None,
                    precision_passes: int = 3, scheme: str = "pure",
                    epilogue_passes: int = 3, dedup_max: int = 0):
    """Shared driver for PELL (gathered) and BCSR (dense) tile kernels.

    Builds a raw traceable ``fn(x[n], *args) -> y[m]``: the Pallas tile
    pass produces per-quantum 8-row partials, and a one-hot MXU
    segment-sum kernel (ops/segsum_kernel.py) reduces them into y — no
    XLA gather/scatter anywhere (both are near-scalar on TPU).

    Two epilogue schemes:

    * ``"pure"`` — every ``chunk`` consecutive tiles must share a
      window (packers pad each window to a chunk multiple; guaranteed
      window-pure grid steps; round-1 behavior).
    * ``"span"`` — epilogue steps may straddle ONE window boundary
      (``make_span_segsum``): the packer runs with chunk_align=1, so
      no per-window tile padding at all — the round-1 fill loss
      (~25% on the flagship, docs/PERF_LOG.md) disappears. Requires
      every ``chunk*epilogue_sub`` tile group to touch at most 2
      windows (checked; ``_span_of`` lets callers pre-check).

    ``rbl`` holds window-local 8-row block ids with ``window_h`` as the
    padding sentinel; ``window`` is non-decreasing per tile.
    """
    if interpret is None:
        interpret = _auto_interpret()
    if rbl.ndim == 1:
        rbl = rbl[:, None]
    nq = rbl.shape[1]
    mb = (m + BR - 1) // BR
    # num_win derives from m, NOT from window.max(): trailing empty
    # windows must still exist (and be visited) or y comes back short
    num_win = max(1, -(-mb // window_h))

    if scheme == "span":
        # one GLOBAL pad to a multiple of chunk*epilogue_sub (no
        # per-window padding); appended sentinel tiles keep the last
        # window id so `window` stays non-decreasing
        group = chunk * epilogue_sub
        T = vals.shape[0]
        t_pad = -(-T // group) * group
        if t_pad != T:
            vals = _pad_tiles(vals, t_pad)
            if lcol is not None:
                lcol = _pad_tiles(lcol, t_pad)
            panel = _pad_tiles(panel, t_pad)
            rbl = _pad_tiles(rbl, t_pad, fill=window_h)
            window = _pad_tiles(window, t_pad,
                                fill=int(window.max(initial=0)))
    T = vals.shape[0]
    assert T % chunk == 0, (name, T, chunk)
    if scheme == "pure":
        assert int(window.max(initial=0)) + 1 == num_win, \
            (name, "window ids must cover every window",
             window.max(), num_win)
    p_rows = max(1, -(-n // BC))

    x_bytes = p_rows * BC * jnp.dtype(dtype).itemsize
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"{name}: x ({x_bytes} B) exceeds VMEM budget {X_VMEM_BUDGET} B;"
            " use an XLA strategy for this matrix")

    if scheme == "span":
        group = chunk * epilogue_sub
        base = window[::group].astype(np.int64)
        span = int((window.reshape(-1, group)[:, -1] - base).max(
            initial=0)) + 1
        # ship GLOBAL row-block ids: rel = rbl_g - base*h in the kernel.
        # The window_h sentinel maps to (w+1)*h — possibly a real row of
        # the next window, but sentinel quanta carry all-zero vals so
        # their contribution is exactly 0.0 either way.
        rbl_ship = window[:, None].astype(np.int64) * window_h + rbl
    else:
        win_of_step = window[::chunk]
        assert (window.reshape(-1, chunk) ==
                win_of_step[:, None]).all(), f"{name}: steps not window-pure"
        rbl_ship = rbl

    gathered = lcol is not None
    steps = T // chunk
    steps_pad = -(-steps // 8) * 8
    vals_d = jax.device_put(
        jnp.asarray(vals.reshape(T * BR, BC), dtype))
    rbl_d = jax.device_put(jnp.asarray(rbl_ship.reshape(-1), jnp.int32))

    # Panel-dedup decision: when every grid step touches few DISTINCT
    # x panels (banded/stencil matrices — tiles are packed in
    # (window, panel-group) order so same-panel tiles are consecutive),
    # slice U panels and distribute them with one one-hot MXU matmul
    # instead of `chunk` per-tile dynamic slices.
    pan_steps = panel.reshape(steps, chunk).astype(np.int32)
    dedup_u = 0
    if dedup_max and chunk >= 16:
        srt = np.sort(pan_steps, axis=1)
        distinct = 1 + (srt[:, 1:] != srt[:, :-1]).sum(axis=1)
        need = int(distinct.max(initial=1))
        if need <= min(dedup_max, chunk // 2):
            dedup_u = max(8, -(-need // 8) * 8)

    if dedup_u:
        pdict = np.zeros((steps_pad, dedup_u), np.int32)
        plidx = np.zeros((steps_pad, chunk), np.int32)
        for s in range(steps):
            u, inv = np.unique(pan_steps[s], return_inverse=True)
            pdict[s, :len(u)] = u
            plidx[s] = inv
        pan_d = jax.device_put(jnp.asarray(pdict))
        plidx_d = jax.device_put(jnp.asarray(plidx))
    else:
        pan2 = np.zeros((steps_pad, chunk), np.int32)
        pan2[:steps] = pan_steps
        pan_d = jax.device_put(jnp.asarray(pan2))

    tile_map = lambda i: (i, 0)  # noqa: E731
    inputs = [vals_d]
    in_specs = [
        # panel ids / dedup dict: 8 steps of metadata per SMEM block
        pl.BlockSpec((8, dedup_u or chunk), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    if dedup_u:
        in_specs.append(pl.BlockSpec((8, chunk), lambda i: (i // 8, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),      # x, whole array
        pl.BlockSpec((chunk * BR, BC), tile_map,
                     memory_space=pltpu.VMEM),
    ]
    if gathered:
        # panel-local columns fit int8 (0..127): 5 B/slot instead of 8.
        # int8 sublane tiling is 32, so the block sublane count
        # (chunk*8) must divide by 32 — fall back to int32 otherwise.
        idx_dt = idx_dtype or (
            jnp.int8 if (chunk * BR) % 32 == 0 and not interpret
            else jnp.int32)
        lcol_d = jax.device_put(
            jnp.asarray(lcol.reshape(T * BR, BC), idx_dt))
        inputs.append(lcol_d)
        in_specs.append(pl.BlockSpec((chunk * BR, BC), tile_map,
                                     memory_space=pltpu.VMEM))


    vmem_limit = min(
        int(x_bytes + 4 * chunk * BR * BC * 8 + (3 << 20)), 100 << 20)
    call = pl.pallas_call(
        _tile_kernel(chunk, gathered, nq, precision_passes, dedup_u),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk * BR, nq), tile_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * BR, nq), dtype),
        scratch_shapes=[pltpu.VMEM((chunk, BC), dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * BR * BC,
            bytes_accessed=int(vals_d.size * (8 if gathered else 4)
                               + x_bytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if scheme == "span":
        segsum, seg_args = make_span_segsum(
            base_of_step=base.astype(np.int32), num_windows=num_win,
            h=window_h, rows_per_step=group * BR, nq=nq,
            total_tile_rows=T * BR, span=span, dtype=dtype,
            interpret=interpret, passes=epilogue_passes)
    else:
        # The epilogue kernel can stream several SpMV-grid-steps worth
        # of partials per step (bigger blocks, fewer steps) as long as
        # its steps stay window-pure: shrink the factor until it
        # divides the window-pure step pattern.
        sub = epilogue_sub
        while sub > 1 and (
                len(win_of_step) % sub != 0
                or not (win_of_step.reshape(-1, sub)
                        == win_of_step.reshape(-1, sub)[:, :1]).all()):
            sub //= 2
        segsum, seg_args = make_window_segsum(
            win_of_step=win_of_step[::sub], num_windows=num_win,
            h=window_h, rows_per_step=sub * chunk * BR, nq=nq,
            total_tile_rows=T * BR, dtype=dtype, interpret=interpret)

    nseg = len(seg_args)

    if dedup_u:
        def raw(x, pan, plidx_a, rbl_a, *rest):
            tiles, sa = rest[:len(rest) - nseg], rest[len(rest) - nseg:]
            xp = jnp.zeros((p_rows * BC,), dtype)
            xp = xp.at[:n].set(x.astype(dtype)).reshape(p_rows, BC)
            partials = call(pan, plidx_a, xp, *tiles)    # (T*8, nq)
            y = segsum(partials, rbl_a, *sa)             # (num_win*h, 8)
            return y.reshape(-1)[:m]

        return raw, (pan_d, plidx_d, rbl_d, *inputs, *seg_args)

    def raw(x, pan, rbl_a, *rest):
        tiles, sa = rest[:len(rest) - nseg], rest[len(rest) - nseg:]
        xp = jnp.zeros((p_rows * BC,), dtype)
        xp = xp.at[:n].set(x.astype(dtype)).reshape(p_rows, BC)
        partials = call(pan, xp, *tiles)             # (T*8, nq)
        y = segsum(partials, rbl_a, *sa)             # (num_win*h, 8)
        return y.reshape(-1)[:m]

    return raw, (pan_d, rbl_d, *inputs, *seg_args)


def _fused_kernel(chunk: int, gathered: bool, nq: int, h: int, W: int,
                  precision_passes: int, epilogue_passes: int,
                  panel_w: int = 1, wide: bool = False,
                  epilogue_ncat: bool = False, diag: str = ""):
    """Single-pass SpMV: tile MACs + windowed segment-sum in ONE grid
    step — per-quantum partials never round-trip through HBM and the
    epilogue's grid overhead disappears (measured 0.37 ms of 0.84 ms
    on the flagship as a separate kernel).

    refs: base (scalar-prefetch: window of the step's first tile),
    pan (SMEM (8,chunk)), rbl (VMEM (8,g) GLOBAL row-block per
    quantum), x (P,128) whole, vals (chunk*8,128), [lcol int8,
    [strip int8]], outs[k] (h,8) k=0..W-1 at block base+k
    (revisit-accumulated), xg (chunk*panel_w,128) scratch.

    ``panel_w > 1``: a tile's x reach is ``panel_w`` consecutive
    128-col panels (the superpanel); lcol holds the low 7 index bits
    and strip the panel-within-superpanel. The gather runs once per
    strip with a select — dynamic_gather reach stays 128 lanes.
    """
    q = BC // nq
    g = chunk * nq
    pw = panel_w
    dn1 = (((1,), (0,)), ((), ()))

    def kernel(base_ref, pan_ref, rbl_ref, x_ref, vals_ref, *rest):
        if gathered and pw > 1:
            lcol_ref, strip_ref, *outs, xg_ref = rest
        elif gathered:
            lcol_ref, *outs, xg_ref = rest
        else:
            *outs, xg_ref = rest
        i = pl.program_id(0)

        if pw > 1:
            # ONE contiguous (pw, 128) slice per tile (a superpanel's
            # strips are consecutive x rows) — pw separate 1-row slices
            # measured ~2x the per-step cost at pw=8
            for c in range(chunk):  # unrolled: c is static
                xg_ref[c * pw:(c + 1) * pw, :] = \
                    x_ref[pl.ds(pan_ref[i % 8, c] * pw, pw), :]
        else:
            for c in range(chunk):
                xg_ref[c:c + 1, :] = x_ref[pl.ds(pan_ref[i % 8, c], 1), :]
        if gathered and pw > 1:
            # tile-major → strip-major: one static sublane transpose
            xga = jnp.transpose(xg_ref[:].reshape(chunk, pw, BC),
                                (1, 0, 2))
            lc = lcol_ref[:]
            # int8 loads are fine (the gather-index path) but Mosaic
            # cannot COMPARE int8 (or bf16) vectors — widen to int32
            # before the strip select loop
            st = strip_ref[:].astype(jnp.int32)
            xv = None
            for w in range(pw):
                xw = jnp.broadcast_to(
                    xga[w][:, None, :],
                    (chunk, BR, BC)).reshape(chunk * BR, BC)
                gw = jnp.take_along_axis(xw, lc, axis=1)
                xv = gw if xv is None else jnp.where(st == w, gw, xv)
        else:
            xv = jnp.broadcast_to(xg_ref[:][:, None, :],
                                  (chunk, BR, BC)).reshape(chunk * BR, BC)
            if gathered and "nogather" not in diag:
                xv = jnp.take_along_axis(xv, lcol_ref[:], axis=1)
        prod = vals_ref[:] * xv
        if nq == BC:
            # quantum=1: the segment matrix is the identity — the
            # partials ARE the products. Skip the reduce dot; values
            # stay f32 (the epilogue's own passes do the bf16 split).
            acc = prod
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 0)
            seg = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 1)
            seg_mat = (lane // q == seg).astype(jnp.bfloat16)

            def dot(x):
                return jax.lax.dot_general(
                    x, seg_mat, dimension_numbers=dn1,
                    preferred_element_type=jnp.float32)

            if "nomac" in diag:     # ablation: MAC seg-reduce dot cost
                acc = prod[:, :nq]
            else:
                acc = None
                rem = prod
                for _ in range(precision_passes):
                    hi = rem.astype(jnp.bfloat16)
                    term = dot(hi)
                    acc = term if acc is None else acc + term
                    rem = rem - hi.astype(jnp.float32)

        # ---- fused windowed segment-sum (ops/segsum_kernel.py) ----
        b = base_ref[i]
        if wide:
            # Wide orientation: (8, g) @ (g, W*h) — the one-hot's block
            # axis rides the MXU's 128-lane output dim. At q=1 the
            # narrow form's N=8 output wastes ~94% of the MXU; wide is
            # the only orientation that scales to nq=128.
            part = acc.reshape(chunk, BR, nq)
            part = jnp.transpose(part, (1, 0, 2)).reshape(BR, g)
            rel = (rbl_ref[pl.ds(i % 8, 1), :] - b * h).reshape(g, 1)
            hh = jax.lax.broadcasted_iota(jnp.int32, (g, W * h), 1)
            oh = (hh == rel).astype(jnp.bfloat16)
            acc2 = None
            rem = part
            for _ in range(epilogue_passes):
                hi = rem.astype(jnp.bfloat16)
                term = jax.lax.dot_general(
                    hi, oh, dimension_numbers=dn1,
                    preferred_element_type=jnp.float32)
                acc2 = term if acc2 is None else acc2 + term
                rem = rem - hi.astype(jnp.float32)
        else:
            if "notrans" in diag:   # ablation: partial-transpose cost
                part = acc.reshape(g, BR)
            else:
                part = acc.reshape(chunk, BR, nq)
                part = jnp.transpose(part, (0, 2, 1)).reshape(g, BR)
            rel = rbl_ref[pl.ds(i % 8, 1), :] - b * h        # (1, g)
            if "constoh" in diag:   # ablation: one-hot build cost
                rel = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1) % (W * h)
            hh = jax.lax.broadcasted_iota(jnp.int32, (W * h, g), 0)
            oh = (hh == rel).astype(jnp.bfloat16)
            if "noepi" in diag:     # ablation: whole epilogue dot cost
                acc2 = jnp.broadcast_to(
                    jnp.sum(part, axis=0, keepdims=True), (W * h, BR))
            else:
                dp = _dot_passes_ncat if epilogue_ncat else _dot_passes
                acc2 = dp(oh, part, epilogue_passes, jnp.float32)

        prev = base_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, b != prev)

        @pl.when(is_first)
        def _():
            for o in outs:
                o[:] = jnp.zeros_like(o)

        for k, o in enumerate(outs):
            if "noout" in diag and k > 0:
                continue
            if wide:
                o[:] += acc2[:, k * h:(k + 1) * h].astype(o.dtype)
            else:
                o[:] += acc2[k * h:(k + 1) * h].astype(o.dtype)

    return kernel


def _make_fused_spmv(*, name: str, m: int, n: int, vals: np.ndarray,
                     lcol: np.ndarray | None, panel: np.ndarray,
                     rbl: np.ndarray, window: np.ndarray, window_h: int,
                     dtype, chunk: int, interpret: bool | None,
                     idx_dtype=None, precision_passes: int = 3,
                     epilogue_passes: int = 3,
                     force_span: int | None = None,
                     force_tiles: int | None = None,
                     panel_w: int = 1, wide: bool | None = None,
                     epilogue_ncat: bool = False, diag: str = ""):
    """Single-kernel SpMV driver (see _fused_kernel). Input layout is
    the chunk_align=1 PELL/BCSR packing (window non-decreasing, NO
    per-window tile padding).

    ``force_span``/``force_tiles`` pin the one-hot span W and the padded
    tile count so different matrices (e.g. SPMD shards) compile to ONE
    identical program — the distributed path stacks per-shard args
    under shard_map (parallel/distributed.py)."""
    if interpret is None:
        interpret = _auto_interpret()
    if rbl.ndim == 1:
        rbl = rbl[:, None]
    nq = rbl.shape[1]
    # the pw=1 broadcast branch of _fused_kernel cannot handle a
    # superpanel packing without lane indices (ADVICE r2 item 3)
    assert panel_w == 1 or lcol is not None, \
        f"{name}: panel_w={panel_w} requires a gathered (lcol) packing"
    if wide is None:
        # wide out blocks are (8, h): Mosaic needs the lane dim to be a
        # multiple of 128 (or the full array)
        wide = nq == BC and window_h % BC == 0
    mb = (m + BR - 1) // BR
    num_win = max(1, -(-mb // window_h))
    h = window_h
    strip = None
    if panel_w > 1 and lcol is not None:
        strip = (lcol // BC).astype(np.int8)
        lcol = lcol % BC

    T = vals.shape[0]
    t_pad = -(-T // chunk) * chunk
    if force_tiles is not None:
        assert force_tiles >= t_pad and force_tiles % chunk == 0
        t_pad = force_tiles
    if t_pad != T:
        vals = _pad_tiles(vals, t_pad)
        if lcol is not None:
            lcol = _pad_tiles(lcol, t_pad)
        if strip is not None:
            strip = _pad_tiles(strip, t_pad)
        panel = _pad_tiles(panel, t_pad)
        rbl = _pad_tiles(rbl, t_pad, fill=window_h)
        window = _pad_tiles(window, t_pad,
                            fill=int(window.max(initial=0)))
        T = t_pad

    p_rows = max(1, -(-(-(-n // BC)) // panel_w) * panel_w)
    x_bytes = p_rows * BC * jnp.dtype(dtype).itemsize
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"{name}: x ({x_bytes} B) exceeds VMEM budget {X_VMEM_BUDGET} B;"
            " use an XLA strategy for this matrix")

    steps = T // chunk
    steps_pad = -(-steps // 8) * 8
    g = chunk * nq
    base = window[::chunk].astype(np.int64)
    W = int((window.reshape(-1, chunk)[:, -1] - base).max(initial=0)) + 1
    if force_span is not None:
        assert force_span >= W, (name, force_span, W)
        W = force_span

    rbl_glob = window[:, None].astype(np.int64) * window_h + rbl
    rbl2 = np.zeros((steps_pad, g), np.int32)
    rbl2[:steps] = rbl_glob.reshape(steps, g)
    pan2 = np.zeros((steps_pad, chunk), np.int32)
    pan2[:steps] = panel.reshape(steps, chunk)

    vals_d = jax.device_put(jnp.asarray(vals.reshape(T * BR, BC), dtype))
    pan_d = jax.device_put(jnp.asarray(pan2))
    rbl_d = jax.device_put(jnp.asarray(rbl2))
    base_d = jax.device_put(jnp.asarray(base, jnp.int32))

    # masks travel as a jit ARGUMENT (stacked (W, num_win*h, 1)) so
    # SPMD shards can carry per-shard visit patterns through one program
    mask_rep = make_visit_masks(base, num_win, W, h)
    mask_d = jax.device_put(jnp.asarray(
        mask_rep[:, None, :] if wide else mask_rep[:, :, None]))

    gathered = lcol is not None
    tile_map = lambda i, base: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, chunk), lambda i, base: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, g), lambda i, base: (i // 8, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),      # x, whole array
        pl.BlockSpec((chunk * BR, BC), tile_map,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [vals_d]
    if gathered:
        idx_dt = idx_dtype or (
            jnp.int8 if (chunk * BR) % 32 == 0 and not interpret
            else jnp.int32)
        lcol_d = jax.device_put(
            jnp.asarray(lcol.reshape(T * BR, BC), idx_dt))
        inputs.append(lcol_d)
        in_specs.append(pl.BlockSpec((chunk * BR, BC), tile_map,
                                     memory_space=pltpu.VMEM))
        if strip is not None:
            strip_d = jax.device_put(jnp.asarray(
                strip.reshape(T * BR, BC),
                jnp.int8 if idx_dt == jnp.int8 else jnp.int32))
            inputs.append(strip_d)
            in_specs.append(pl.BlockSpec((chunk * BR, BC), tile_map,
                                         memory_space=pltpu.VMEM))

    def out_map(k):
        if wide:
            return lambda i, base: (0, base[i] + k)
        return lambda i, base: (base[i] + k, 0)

    out_blk = (BR, h) if wide else (h, BR)
    out_sh = ((BR, (num_win + W - 1) * h) if wide
              else ((num_win + W - 1) * h, BR))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(out_blk, out_map(k),
                                memory_space=pltpu.VMEM)
                   for k in range(W)],
        scratch_shapes=[pltpu.VMEM((chunk * panel_w, BC), dtype)],
    )
    # per-slot streamed bytes: f32 vals + the ACTUAL index plane width
    # (int8 when the sublane tiling allows, else int32 — ADVICE r2
    # item 4: hardcoding 1 B underestimated VMEM by ~3 MB at chunk=256)
    idx_bytes = jnp.dtype(idx_dt).itemsize if gathered else 0
    slot_bytes = (4 + idx_bytes
                  + (idx_bytes if strip is not None else 0))
    vmem_limit = min(
        int(x_bytes                                # resident x
            + 2 * chunk * BR * BC * 2 * slot_bytes  # dbl-buffered tiles
            + W * h * g * 2                          # epilogue one-hot
            + g * BR * 4 * 4                         # part/acc temps
            + chunk * panel_w * BC * 4               # xg scratch
            + W * h * BR * 4 * 2                     # out blocks
            + (4 << 20)), 100 << 20)
    call = pl.pallas_call(
        _fused_kernel(chunk, gathered, nq, h, W,
                      precision_passes, epilogue_passes,
                      panel_w=panel_w, wide=wide,
                      epilogue_ncat=epilogue_ncat, diag=diag),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(out_sh, dtype)
                   for _ in range(W)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * BR * BC + 2 * steps * W * h * g * BR,
            bytes_accessed=int(vals_d.size * slot_bytes + x_bytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def raw(x, base_a, pan, rbl_a, mask_a, *tiles):
        xp = jnp.zeros((p_rows * BC,), dtype)
        xp = xp.at[:n].set(x.astype(dtype)).reshape(p_rows, BC)
        outs = call(base_a, pan, rbl_a, xp, *tiles)
        zero = jnp.zeros((), dtype)
        y = None
        for k in range(W):
            ok = (outs[k][:, :num_win * h] if wide
                  else outs[k][:num_win * h])
            t = jnp.where(mask_a[k], ok, zero)
            y = t if y is None else y + t
        if wide:
            y = y.T                      # (num_win*h, 8): rows major
        return y.reshape(-1)[:m]

    return raw, (base_d, pan_d, rbl_d, mask_d, *inputs)


# ---------------------------------------------------------------------------
# df64 fused PELL — fp64-grade SpMV as exact fixed-point MXU arithmetic
# ---------------------------------------------------------------------------

DF64_PLANES = 8          # 7-bit digit planes: 56 bits below the scale
# (the magic-constant rounding trick is unusable here: XLA folds it)


def _fused_kernel_df64(chunk: int, nq: int, h: int, W: int, planes: int,
                       p_rows: int):
    """fp64-grade single-pass SpMV (VERDICT r2 item 4 — the reference
    computes natively in fp64, include/csr.h:12; TPUs have no fp64).

    Why not df64 pairs through the MXU: the one-hot reduction
    accumulates in f32, whose rounding (~K*2^-24) caps any pair scheme
    at ~1e-6. Instead every Dekker product pair (p, e) — exact to
    ~2^-48 rel — is sliced into ``planes`` signed 7-bit integer digit
    planes on a power-of-two scale E (host |A|max x runtime |x|max):

        p = sum_k d_k * E * 2^-7(k+1),   |d_k| <= 129

    Integers this small ride the existing machinery EXACTLY: digits
    are bf16-exact (< 256), the (128, nq) segment dot and the windowed
    one-hot dot accumulate integers < 2^24 in f32 without rounding, and
    the W staggered output buffers accumulate exactly too. The planes
    recombine in real float64 on the HOST (Prepared.post) — the device
    never rounds. Digit extraction (the magic-constant round and the
    exact residual subtraction) is standard fixed-point float slicing;
    each subtraction is exact because E is a power of two.

    Per-term error sources: Dekker pair ~2^-48|p|, plane truncation
    2^(E-56), low-part join rounding 2^(E-45) — all orders below the
    1e-9 gate on suite-scale matrices (prepare guards row slot counts
    so digit sums stay < 2^24).
    """
    q = BC // nq
    g = chunk * nq
    dn1 = (((1,), (0,)), ((), ()))

    def kernel(base_ref, pan_ref, rbl_ref, sc_ref, x_ref,
               vh_ref, vl_ref, lcol_ref, *rest):
        *outs, xg_ref = rest
        i = pl.program_id(0)

        for c in range(chunk):  # unrolled: c is static
            p = pan_ref[i % 8, c]
            xg_ref[c:c + 1, :] = x_ref[pl.ds(p, 1), :]
            xg_ref[chunk + c:chunk + c + 1, :] = \
                x_ref[pl.ds(p_rows + p, 1), :]
        lc = lcol_ref[:]
        xh = jnp.broadcast_to(xg_ref[0:chunk][:, None, :],
                              (chunk, BR, BC)).reshape(chunk * BR, BC)
        xl = jnp.broadcast_to(xg_ref[chunk:2 * chunk][:, None, :],
                              (chunk, BR, BC)).reshape(chunk * BR, BC)
        xh = jnp.take_along_axis(xh, lc, axis=1)
        xl = jnp.take_along_axis(xl, lc, axis=1)
        vh = vh_ref[:]
        vl = vl_ref[:]

        # Dekker product: vh*xh = ph + err exactly (12-bit splits; no
        # FMA primitive in Mosaic), cross terms fold into the low word
        ph = vh * xh
        t = jnp.float32(4097.0) * vh
        v1 = t - (t - vh)
        v2 = vh - v1
        t = jnp.float32(4097.0) * xh
        u1 = t - (t - xh)
        u2 = xh - u1
        err = ((v1 * u1 - ph) + v1 * u2 + v2 * u1) + v2 * u2
        plo = err + vh * xl + vl * xh

        # digit-plane extraction on scale E (power of two, SMEM)
        E = sc_ref[0, 0]
        invE = jnp.float32(1.0) / E
        r = ph
        lane = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 0)
        seg = jax.lax.broadcasted_iota(jnp.int32, (BC, nq), 1)
        seg_mat = (lane // q == seg).astype(jnp.bfloat16)
        rel = rbl_ref[pl.ds(i % 8, 1), :] - base_ref[i] * h   # (1, g)
        hh = jax.lax.broadcasted_iota(jnp.int32, (W * h, g), 0)
        oh = (hh == rel).astype(jnp.bfloat16)

        prev = base_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, base_ref[i] != prev)

        @pl.when(is_first)
        def _():
            for o in outs:
                o[:] = jnp.zeros_like(o)

        for k in range(planes):
            sk = invE * jnp.float32(2.0 ** (7 * (k + 1)))
            ik = E * jnp.float32(2.0 ** (-7 * (k + 1)))
            # NOTE: the classic (x + 1.5*2^23) - 1.5*2^23 rounding
            # trick gets algebraically simplified away by XLA — use the
            # explicit round op (exactness of the residual subtraction
            # needs a true integer d)
            d = jnp.round(r * sk)             # nearest int, |d| <= 129
            r = r - d * ik                    # exact (power-of-2 grid)
            if k == 2:
                # resolution reached the low word's magnitude (2^-24 E)
                r = r + plo
            if nq == BC:
                acc = d
            else:
                acc = jax.lax.dot_general(
                    d.astype(jnp.bfloat16), seg_mat,
                    dimension_numbers=dn1,
                    preferred_element_type=jnp.float32)
            part = acc.reshape(chunk, BR, nq)
            part = jnp.transpose(part, (0, 2, 1)).reshape(g, BR)
            # level-1 sums are integers < 2^16: 2 bf16 passes are EXACT
            acc2 = _dot_passes(oh, part, 2, jnp.float32)
            for w, o in enumerate(outs[k::planes]):
                o[:] += acc2[w * h:(w + 1) * h].astype(o.dtype)

    return kernel


def _make_fused_spmv_df64(*, name: str, m: int, n: int, amax: float,
                          vals: np.ndarray, lcol: np.ndarray,
                          panel: np.ndarray, rbl: np.ndarray,
                          window: np.ndarray, window_h: int, chunk: int,
                          interpret: bool | None,
                          planes: int = DF64_PLANES):
    """Driver for the df64 digit-plane kernel (see _fused_kernel_df64).
    Returns (raw, args, prep_x, post): x enters as a host-split
    (2, n) hi/lo f32 pair, y leaves as (planes, m) scaled digit planes
    summed in float64 on the host."""
    if interpret is None:
        interpret = _auto_interpret()
    if rbl.ndim == 1:
        rbl = rbl[:, None]
    nq = rbl.shape[1]
    dtype = jnp.float32
    mb = (m + BR - 1) // BR
    num_win = max(1, -(-mb // window_h))
    h = window_h

    T = vals.shape[0]
    t_pad = -(-T // chunk) * chunk
    if t_pad != T:
        vals = _pad_tiles(vals, t_pad)
        lcol = _pad_tiles(lcol, t_pad)
        panel = _pad_tiles(panel, t_pad)
        rbl = _pad_tiles(rbl, t_pad, fill=window_h)
        window = _pad_tiles(window, t_pad,
                            fill=int(window.max(initial=0)))
        T = t_pad

    p_rows = max(1, -(-n // BC))
    x_bytes = 2 * p_rows * BC * 4
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"{name}: x pair ({x_bytes} B) exceeds VMEM budget; use "
            "xla-ell-df64 for this matrix")

    steps = T // chunk
    steps_pad = -(-steps // 8) * 8
    g = chunk * nq
    base = window[::chunk].astype(np.int64)
    W = int((window.reshape(-1, chunk)[:, -1] - base).max(initial=0)) + 1

    rbl_glob = window[:, None].astype(np.int64) * window_h + rbl
    rbl2 = np.zeros((steps_pad, g), np.int32)
    rbl2[:steps] = rbl_glob.reshape(steps, g)
    pan2 = np.zeros((steps_pad, chunk), np.int32)
    pan2[:steps] = panel.reshape(steps, chunk)

    vals_hi = vals.astype(np.float32)
    vals_lo = (vals - vals_hi.astype(np.float64)).astype(np.float32)
    vh_d = jax.device_put(jnp.asarray(vals_hi.reshape(T * BR, BC)))
    vl_d = jax.device_put(jnp.asarray(vals_lo.reshape(T * BR, BC)))
    idx_dt = (jnp.int8 if (chunk * BR) % 32 == 0 and not interpret
              else jnp.int32)
    lcol_d = jax.device_put(jnp.asarray(lcol.reshape(T * BR, BC), idx_dt))
    pan_d = jax.device_put(jnp.asarray(pan2))
    rbl_d = jax.device_put(jnp.asarray(rbl2))
    base_d = jax.device_put(jnp.asarray(base, jnp.int32))
    mask_rep = make_visit_masks(base, num_win, W, h)
    mask_d = jax.device_put(jnp.asarray(mask_rep[:, :, None]))

    tile_map = lambda i, base: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, chunk), lambda i, base: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, g), lambda i, base: (i // 8, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),      # E scale (1,1)
        pl.BlockSpec(memory_space=pltpu.VMEM),      # x pair, whole
        pl.BlockSpec((chunk * BR, BC), tile_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk * BR, BC), tile_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk * BR, BC), tile_map, memory_space=pltpu.VMEM),
    ]

    def out_map(k):
        return lambda i, base: (base[i] + k, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=in_specs,
        # ordering: k-major, plane-minor (outs[k*planes + p])
        out_specs=[pl.BlockSpec((h, BR), out_map(k),
                                memory_space=pltpu.VMEM)
                   for k in range(W) for _ in range(planes)],
        scratch_shapes=[pltpu.VMEM((2 * chunk, BC), dtype)],
    )
    vmem_limit = min(
        int(x_bytes + 2 * chunk * BR * BC * 2 * 9
            + W * h * g * 2 + g * BR * 4 * (planes + 2)
            + 2 * chunk * BC * 4 + W * planes * h * BR * 4 * 2
            + (6 << 20)), 110 << 20)
    call = pl.pallas_call(
        _fused_kernel_df64(chunk, nq, h, W, planes, p_rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(((num_win + W - 1) * h, BR),
                                        dtype)
                   for _ in range(W * planes)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * planes * (T * BR * BC + steps * W * h * g * BR),
            bytes_accessed=int(T * BR * BC * 9 + x_bytes),
            transcendentals=0),
        interpret=interpret,
    )

    amax_c = float(max(amax, np.finfo(np.float32).tiny))

    def raw(x2, base_a, pan, rbl_a, mask_a, vh, vl, lc):
        xh, xl = x2[0], x2[1]
        xmax = jnp.max(jnp.abs(xh))
        xmax = jnp.maximum(xmax, jnp.float32(1e-30))
        # EXACT power-of-two bound with one guard bit (xh
        # underestimates |x| by <= 2^-24 rel), built by exponent-bit
        # surgery — NOT jnp.exp2, which XLA lowers to a polynomial
        # (measured exp2(33.0) != 2^33): a non-power-of-two E silently
        # de-aligns every digit grid. Also keeps E*2^-56 normal (TPU
        # flushes f32 denormals).
        from spmv_scpa_tpu.ops.lane_ell import pow2_bound
        E = pow2_bound(jnp.float32(amax_c) * xmax)
        xp = jnp.zeros((2 * p_rows * BC,), dtype)
        xp = xp.at[:n].set(xh)
        xp = xp.at[p_rows * BC:p_rows * BC + n].set(xl)
        xp = xp.reshape(2 * p_rows, BC)
        outs = call(base_a, pan, rbl_a, E.reshape(1, 1), xp, vh, vl, lc)
        zero = jnp.zeros((), dtype)
        ys = []
        for p in range(planes):
            y = None
            for k in range(W):
                t = jnp.where(mask_a[k],
                              outs[k * planes + p][:num_win * h], zero)
                y = t if y is None else y + t
            # exact: integer plane times a power-of-two scale
            ys.append(y.reshape(-1)[:m]
                      * (E * jnp.float32(2.0 ** (-7 * (p + 1)))))
        return jnp.stack(ys)                          # (planes, m)

    def prep_x(x):
        x = np.asarray(x, np.float64)
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        return jax.device_put(jnp.stack([hi, lo]))

    def post(yp):
        return np.asarray(yp, np.float64).sum(axis=0)

    return raw, (base_d, pan_d, rbl_d, mask_d, vh_d, vl_d, lcol_d), \
        prep_x, post


def prepare_pell_df64(A: CSR, chunk: int = DEFAULT_CHUNK,
                      quantum: int | str = "auto",
                      window_h: int | str = "auto", span_max: int = 8,
                      planes: int = DF64_PLANES,
                      interpret: bool | None = None, Prepared=None, **_):
    """fp64-grade fused PELL strategy (reference computes natively in
    fp64 everywhere, include/csr.h:12): the digit-plane kernel above,
    validated at rel <= 1e-9. Supersedes xla-ell-df64 as the USABLE
    fp64 path (that one is a correctness knob built on an XLA
    fori_loop, ops/xla.py:186-232)."""
    auto = auto_pell_params(A, quantum=quantum, window_h=window_h,
                            panel_w=1, row_sort=False, chunk=chunk)
    quantum, wh0, chunk = auto["quantum"], auto["window_h"], auto["chunk"]
    # digit sums per output row must stay < 2^24 (f32 integer
    # exactness): each slot contributes <= ~129 per plane
    max_row = int(np.diff(A.irp).max(initial=0))
    if (max_row + quantum) * 130 * 2 >= 1 << 24:
        raise ValueError(
            f"pallas-pell-df64: max row length {max_row} overflows the "
            "2^24 exact-integer budget; use xla-ell-df64")
    span = span_max + 1
    P = None
    for wh_try in (wh0, 2 * wh0, 4 * wh0):
        P = csr_to_pell(A, quantum=quantum, window_h=wh_try,
                        chunk_align=1, min_chunk_align=1)
        span = _span_of(P.window, chunk)
        if span <= span_max:
            break
    wh_used = P.window_h
    amax = float(np.abs(A.as_).max(initial=0.0))
    raw, args, prep_x, post = _make_fused_spmv_df64(
        name="pallas-pell-df64", m=A.m, n=A.n, amax=amax, vals=P.vals,
        lcol=P.lcol, panel=P.panel, rbl=P.rbl, window=P.window,
        window_h=wh_used, chunk=chunk, interpret=interpret,
        planes=planes)
    from spmv_scpa_tpu.ops.registry import bind
    return Prepared("pallas-pell-df64", A.name,
                    bind(raw, args, prep_x, post),
                    on_device=True, nnz=A.nnz, raw=raw, args=args,
                    prep_x=prep_x, post=post,
                    hbm_bytes=P.num_tiles * BR * BC * 9,
                    meta={"num_blocks": P.num_tiles, "fill": P.fill,
                          "chunk": chunk, "quantum": quantum,
                          "window_h": wh_used, "rtol": 1e-9,
                          "planes": planes})


# ---------------------------------------------------------------------------
# BCSR SpMM (multi-vector) — the MXU path (BASELINE.json config 3)
# ---------------------------------------------------------------------------

def _spmm_kernel(chunk: int, cc: int, h: int, W: int):
    """Fused BCSR SpMM step: ``chunk`` MXU matmuls (8,128)@(128,cc)
    plus the in-step windowed block reduction.

    X is VMEM-resident flattened to (P*128, cc) so a column panel is a
    contiguous 128-sublane slice — SpMV's (P,128) panel view widened to
    cc right-hand sides. The matrix tile streams once and feeds cc
    columns: the arithmetic-intensity regime the MXU exists for.

    The per-tile (8, cc) partials are reduced to window row-blocks the
    same way as the fused SpMV (one-hot over a W*h range, staggered
    outputs) — round 1 used jax.ops.segment_sum here, the primitive
    this repo measured at ~0.1-0.3 GFLOP/s on TPU (VERDICT r1 weak 7).
    One-hot granularity: (row-block, sublane) pairs ride as 8h rows so
    Y keeps its (rows, cc) layout.
    """
    # pan_ref: (8, chunk) SMEM (blocked — whole-array scalar prefetch
    # overflows SMEM past ~256k tiles; ADVICE r1 item 2)

    def kernel(base_ref, pan_ref, rbl_ref, xt_ref, vals_ref, *outs):
        i = pl.program_id(0)
        parts = []
        for c in range(chunk):
            p = pan_ref[i % 8, c]
            xp = xt_ref[pl.ds(p * BC, BC), :]          # (128, cc)
            parts.append(jax.lax.dot_general(
                vals_ref[c * BR:(c + 1) * BR, :], xp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        part = jnp.concatenate(parts, axis=0)          # (chunk*8, cc)

        b = base_ref[i]
        prev = base_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, b != prev)

        @pl.when(is_first)
        def _():
            for o in outs:
                o[:] = jnp.zeros_like(o)

        # one-hot over (window-local block, sublane) rows: source row
        # (c, s') goes to output row (rbl[c]-b*h)*8 + s'. rbl_ref ships
        # the combined global index rowblk[c]*8 + s' per SOURCE row
        # (precomputed host-side), so one iota compare suffices.
        want = rbl_ref[pl.ds(i % 8, 1), :] - b * (h * BR)  # (1, chunk*8)
        sub = jax.lax.broadcasted_iota(jnp.int32, (W * h * BR, chunk * BR),
                                       0)
        oh = (sub == want).astype(jnp.bfloat16)
        acc = _dot_passes(oh, part, 2, jnp.float32)   # (W*h*8, cc)
        for k, o in enumerate(outs):
            o[:] += acc[k * h * BR:(k + 1) * h * BR].astype(o.dtype)

    return kernel


def make_bcsr_spmm(A: CSR, cols: int, dtype=jnp.float32,
                   chunk: int = DEFAULT_CHUNK, window_h: int = 32,
                   interpret: bool | None = None):
    """Raw traceable ``fn(X[n, cols], *args) -> Y[m, cols]`` over BCSR
    tiles through the MXU, with the fused windowed block reduction
    (see _spmm_kernel)."""
    if interpret is None:
        interpret = _auto_interpret()
    B = csr_to_bcsr(A, br=BR, bc=BC)
    rowblk = np.repeat(np.arange(B.num_block_rows, dtype=np.int32),
                       np.diff(B.rowptr))
    T = B.num_tiles
    t_pad = max(chunk, -(-T // chunk) * chunk)
    m, n = A.m, A.n
    mb = (m + BR - 1) // BR
    h = window_h
    num_win = max(1, -(-mb // h))
    p_rows = max(1, -(-n // BC))

    x_bytes = p_rows * BC * cols * jnp.dtype(dtype).itemsize
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"bcsr-spmm: X ({x_bytes} B) exceeds VMEM budget; reduce cols"
            " or matrix size")

    steps = t_pad // chunk
    steps_pad = -(-steps // 8) * 8
    rowblk_p = _pad_tiles(rowblk, t_pad, fill=mb)
    window = np.minimum(rowblk_p // h, num_win - 1)
    base = window[::chunk].astype(np.int64)
    W = int((window.reshape(-1, chunk)[:, -1] - base).max(initial=0)) + 1

    mask_d = jax.device_put(jnp.asarray(
        make_visit_masks(base, num_win, W, h * BR)[:, :, None]))

    pan2 = np.zeros((steps_pad, chunk), np.int32)
    pan2[:steps] = _pad_tiles(B.col_panel, t_pad).reshape(steps, chunk)
    # combined (global block)*8 + sublane index per SOURCE row
    wglob = (np.repeat(rowblk_p, BR).astype(np.int64) * BR
             + np.tile(np.arange(BR), t_pad))
    rbl2 = np.zeros((steps_pad, chunk * BR), np.int32)
    rbl2[:steps] = wglob.reshape(steps, chunk * BR)

    vals_d = jax.device_put(jnp.asarray(
        _pad_tiles(B.vals, t_pad).reshape(t_pad * BR, BC), dtype))
    pan_d = jax.device_put(jnp.asarray(pan2))
    rbl_d = jax.device_put(jnp.asarray(rbl2))
    base_d = jax.device_put(jnp.asarray(base, jnp.int32))

    tile_map = lambda i, base: (i, 0)  # noqa: E731

    def out_map(k):
        return lambda i, base: (base[i] + k, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec((8, chunk), lambda i, base: (i // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, chunk * BR),
                               lambda i, base: (i // 8, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk * BR, BC), tile_map,
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((h * BR, cols), out_map(k),
                                memory_space=pltpu.VMEM)
                   for k in range(W)],
    )
    call = pl.pallas_call(
        _spmm_kernel(chunk, cols, h, W),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(((num_win + W - 1) * h * BR,
                                         cols), dtype)
                   for _ in range(W)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(x_bytes) + (12 << 20), 100 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * BR * BC * cols,
            bytes_accessed=int(vals_d.size * 4 + x_bytes),
            transcendentals=0),
        interpret=interpret,
    )

    def raw(X, base_a, pan, rbl_a, mask_a, vals):
        Xp = jnp.zeros((p_rows * BC, cols), dtype)
        Xp = Xp.at[:n].set(X.astype(dtype))
        outs = call(base_a, pan, rbl_a, Xp, vals)
        zero = jnp.zeros((), dtype)
        y = None
        for k in range(W):
            t = jnp.where(mask_a[k], outs[k][:num_win * h * BR], zero)
            y = t if y is None else y + t
        return y[:m]

    return raw, (base_d, pan_d, rbl_d, mask_d, vals_d), B


def prepare_bcsr_spmm(A: CSR, cols: int = 8, dtype=jnp.float32,
                      chunk: int = DEFAULT_CHUNK, window_h: int = 32,
                      interpret: bool | None = None, Prepared=None, **_):
    from spmv_scpa_tpu.ops.registry import bind
    raw, args, B = make_bcsr_spmm(A, cols, dtype, chunk,
                                  window_h=window_h, interpret=interpret)
    return Prepared("pallas-bcsr-spmm", A.name, bind(raw, args),
                    on_device=True, nnz=A.nnz, raw=raw, args=args,
                    hbm_bytes=B.padded_bytes,
                    meta={"num_blocks": B.num_tiles, "fill": B.fill,
                          "chunk": chunk, "cols": cols})


# ---------------------------------------------------------------------------
# Strategy prepare() implementations
# ---------------------------------------------------------------------------

def _dual_grid_remap(A: CSR):
    """Relabel contiguous column runs that straddle a 128-column panel
    boundary into a second, 64-column-shifted panel grid appended past
    n — when the run fits a shifted panel whole.

    Why: PELL buckets are (8-row block, panel); a run crossing a panel
    boundary becomes two buckets padded to two quanta. At run time x is
    extended with its own 64-shifted copy — one slice+pad, no gather.

    Measured: on diagonal-stencil matrices this is a NO-OP for fill
    (default off) — run offsets shift with the diagonal, so rows of one
    8-row block choose different grids, fragmenting buckets by exactly
    as much as de-splitting saves. A useful version must choose the
    grid per (8-row block, run-group), not per run.

    Returns (remapped CSR, extra_cols) with extra_cols the width of the
    shifted region appended after ceil(n/128)*128.
    """
    if A.n <= 64 or A.nnz == 0:
        return A, 0
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    # contiguous runs within a row (CSR order: cols ascending per row)
    brk = np.ones(A.nnz, dtype=bool)
    brk[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1] + 1)
    run_id = np.cumsum(brk) - 1
    nruns = int(run_id[-1]) + 1
    c0 = np.full(nruns, np.iinfo(np.int64).max)
    c1 = np.zeros(nruns, dtype=np.int64)
    np.minimum.at(c0, run_id, cols)
    np.maximum.at(c1, run_id, cols)
    r_row = np.zeros(nruns, dtype=np.int64)
    np.maximum.at(r_row, run_id, rows)

    # The grid must be chosen per (8-row block, run GROUP), not per
    # run: in stencil/FEM matrices run starts shift with the diagonal,
    # so a per-run choice lands rows of one block in different grids
    # and fragments buckets (measured fill-neutral). Cluster runs by
    # (block, diagonal-normalized 64-bucket of the start column) —
    # block-constant for stencils, approximate elsewhere.
    gkey = (r_row // BR) * (2 * (A.n // 64 + 2)) \
        + (c0 - (r_row % BR)) // 64 + 1
    guniq, g_of = np.unique(gkey, return_inverse=True)
    ng = guniq.shape[0]
    gmin = np.full(ng, np.iinfo(np.int64).max)
    gmax = np.zeros(ng, dtype=np.int64)
    np.minimum.at(gmin, g_of, c0)
    np.maximum.at(gmax, g_of, c1)
    g_crosses = (gmin // BC) != (gmax // BC)
    g_fits = (gmin >= 64) & (((gmin - 64) // BC) == ((gmax - 64) // BC))
    move = (g_crosses & g_fits)[g_of]
    if not move.any():
        return A, 0
    n_pad = -(-A.n // BC) * BC
    sel = move[run_id]
    new_cols = cols.copy()
    new_cols[sel] = n_pad + (cols[sel] - 64)
    extra = A.n - 64
    A2 = CSR.from_coo(A.name, A.m, n_pad + extra, rows, new_cols, A.as_)
    return A2, extra


def _hot_column_remap(A: CSR, hot_cols: int, quantum: int):
    """Relabel the ``hot_cols`` most frequent columns into *virtual
    panels* appended past n (the power-law fix, BASELINE config 4):
    hub columns otherwise scatter one nonzero into thousands of
    (row, panel) buckets, each padded to a full quantum. Concentrated
    into a few shared panels, they pack densely. At run time x is
    extended with a small gather ``x[hot_idx]`` (K elements — cheap
    even through XLA's scalar gather). y is unaffected.

    Returns (remapped CSR, n_eff, hot_idx or None)."""
    counts = np.zeros(A.n, dtype=np.int64)
    np.add.at(counts, A.ja, 1)
    k = min(hot_cols, A.n)
    k = max((k // BC) * BC, 0)
    if k == 0:
        return A, A.n, None
    hot_idx = np.argpartition(counts, -k)[-k:]
    hot_idx = hot_idx[np.argsort(-counts[hot_idx], kind="stable")]
    if counts[hot_idx[-1]] < 2 * quantum:  # trim the useless tail
        keep = counts[hot_idx] >= 2 * quantum
        k = max((int(keep.sum()) // BC) * BC, 0)
        if k == 0:
            return A, A.n, None
        hot_idx = hot_idx[:k]
    n_pad = -(-A.n // BC) * BC
    col_map = np.arange(A.n, dtype=np.int64)
    col_map[hot_idx] = n_pad + np.arange(k)
    A2 = CSR.from_coo(A.name, A.m, n_pad + k, A.row_ids(),
                      col_map[A.ja], A.as_)
    return A2, n_pad + k, hot_idx.astype(np.int32)


def _prepare_pell_striped(A: CSR, *, dtype, x_vmem_budget, Prepared,
                          **kw):
    """Column-striped PELL for matrices whose x exceeds the VMEM
    budget (n > ~3M at f32): split the columns into stripes that fit,
    run the fused PELL kernel per stripe on a static slice of x, and
    sum the per-stripe y vectors — all inside one jit program.

    This replaces round 1's behavior of falling off a cliff to the XLA
    segment-sum (~0.13 GF/s on TPU) for large-n matrices. The analog
    capability in the reference is simply that CSR has no column
    limit (csr.c:201-216); the TPU-native answer to 'x too big for
    fast memory' is column blocking, the same trick the reference's
    k4 texture kernel plays at cache granularity (cuda_csr.cu:145-178).
    """
    import jax

    # half the budget per stripe: leave room for tiles + double buffers
    ws = max(BC, (x_vmem_budget // 2 // jnp.dtype(dtype).itemsize
                  // BC) * BC)
    n_stripes = -(-A.n // ws)
    rows = A.row_ids()
    parts = []   # (raw, nargs, c0, c1, args)
    total_bytes = 0
    num_tiles = 0
    nnz_seen = 0
    wh0 = kw.get("window_h", DEFAULT_WINDOW_H)
    if not isinstance(wh0, int):
        wh0 = DEFAULT_WINDOW_H
    chunk = kw.get("chunk", DEFAULT_CHUNK)
    span_max = kw.get("span_max", 8)
    mb = (A.m + BR - 1) // BR
    wh_useds = []
    for s in range(n_stripes):
        c0, c1 = s * ws, min((s + 1) * ws, A.n)
        sel = (A.ja >= c0) & (A.ja < c1)
        if not sel.any():
            continue
        # restrict the stripe to its ACTIVE row-block range: for
        # banded/local matrices a column stripe touches only nearby
        # rows, and packing the full row space would pad every empty
        # window with sentinel tiles (span + VMEM blowup)
        rsel = rows[sel]
        rb0 = int(rsel.min()) // BR
        rb1 = int(rsel.max()) // BR + 1
        m_loc = (rb1 - rb0) * BR
        S = CSR.from_coo(f"{A.name}[c{c0}:{c1}]", m_loc, c1 - c0,
                         rsel - rb0 * BR, A.ja[sel] - c0, A.as_[sel])
        nnz_seen += S.nnz
        # a stripe's nnz spread thin over the row windows can still
        # make a grid step straddle many windows — escalate window_h
        # until the epilogue span is bounded
        mb_loc = rb1 - rb0
        p = None
        wh_used = wh0
        for mult in (1, 2, 4, 8, 16, 0):
            wh_used = mb_loc if mult == 0 else min(wh0 * mult, mb_loc)
            p = csr_to_pell(S, quantum=kw.get("quantum", DEFAULT_QUANTUM),
                            window_h=wh_used,
                            chunk_align=1, min_chunk_align=1)
            if (_span_of(p.window, chunk) <= span_max
                    or wh_used >= mb_loc):
                break
        raw, args = _make_fused_spmv(
            name=f"pell-stripe{s}", m=m_loc, n=S.n, vals=p.vals,
            lcol=p.lcol, panel=p.panel, rbl=p.rbl, window=p.window,
            window_h=wh_used, dtype=dtype,
            chunk=chunk,
            interpret=kw.get("interpret"),
            precision_passes=kw.get("precision_passes", 3),
            epilogue_passes=kw.get("epilogue_passes", 3))
        num_tiles += p.num_tiles
        total_bytes += p.num_tiles * BR * BC * 5
        wh_useds.append(wh_used)
        parts.append((raw, len(args), c0, c1, args, rb0 * BR, m_loc))
    assert nnz_seen == A.nnz

    flat_args = tuple(a for part in parts for a in part[4])
    metas = [(p[0], p[1], p[2], p[3], p[5], p[6]) for p in parts]
    m = A.m

    def raw_all(x, *flat):
        y = jnp.zeros((m,), dtype)
        ofs = 0
        for r, nargs, c0, c1, row0, m_loc in metas:
            t = r(x[c0:c1], *flat[ofs:ofs + nargs])
            ofs += nargs
            keep = min(m_loc, m - row0)
            y = y.at[row0:row0 + keep].add(t[:keep])
        return y

    from spmv_scpa_tpu.ops.registry import bind
    return Prepared("pallas-pell", A.name, bind(raw_all, flat_args),
                    on_device=True, nnz=A.nnz, raw=raw_all,
                    args=flat_args, hbm_bytes=total_bytes,
                    meta={"num_blocks": num_tiles,
                          "fill": A.nnz / max(num_tiles * BR * BC, 1),
                          "stripes": len(metas), "scheme": "fused",
                          "chunk": chunk,
                          "quantum": kw.get("quantum", DEFAULT_QUANTUM),
                          # the ACTUAL per-stripe escalated window_h
                          # (max over stripes), not the requested one
                          "window_h": max(wh_useds, default=wh0),
                          "hot_cols": 0})


SORT_WIN = 128   # 8-row blocks per row-sort window (1024 rows)


def _rank_sort_sigma(A: CSR):
    """Per-lane rank-sort permutation for scattered matrices.

    Power-law matrices put ~1 row per (8-row block, panel) bucket, so
    7/8 of every quantum's sublanes are padding (measured fill 0.05,
    docs/PERF_LOG.md). Clustering similar rows into blocks densifies
    buckets — but an arbitrary row permutation cannot be undone on TPU
    (scatter). Constraint that makes it undoable: a row may only move
    to positions with its own residue mod 8 (its LANE). Then, per
    1024-row window and per lane i, sort the window's lane-i rows by
    (ceil-log2 length, median column); new block j takes the j-th
    ranked row of each lane. Blocks get 8 similar-rank rows (fill
    0.0545 -> 0.113 measured on the powerlaw archetype) and the
    un-permutation is a per-lane BLOCK permutation — one small one-hot
    MXU pass (_make_unpermute).

    Returns (sigma, bsrc) with sigma[old_row] = new_row and
    bsrc[b, i] = window-local source block for destination (b, i).
    """
    m = A.m
    mb_pad = -(-max(m, 1) // (SORT_WIN * BR)) * SORT_WIN
    m_pad = mb_pad * BR
    lens = np.zeros(m_pad, np.int64)
    lens[:m] = np.diff(A.irp)
    lenclass = np.zeros(m_pad, np.int64)
    nz = lens > 0
    lenclass[nz] = np.ceil(np.log2(lens[nz] + 1)).astype(np.int64)
    med = np.zeros(m_pad, np.int64)
    mid = np.minimum(A.irp[:-1] + np.maximum(lens[:m] // 2, 0),
                     np.maximum(A.irp[1:] - 1, A.irp[:-1]))
    if A.nnz:
        med[:m] = np.where(lens[:m] > 0,
                           A.ja[np.minimum(mid, A.nnz - 1)], 0)
    key = -lenclass * (1 << 34) + med
    k3 = key.reshape(-1, SORT_WIN, BR)            # (nwin, 128, 8)
    order = np.argsort(k3, axis=1, kind="stable") # old block of rank j
    nwin = k3.shape[0]
    # sigma: old (w, order[w,j,i], i) -> new (w, j, i)
    w_ix = np.arange(nwin)[:, None, None]
    i_ix = np.arange(BR)[None, None, :]
    old_rows = (w_ix * SORT_WIN + order) * BR + i_ix
    new_rows = (w_ix * SORT_WIN
                + np.arange(SORT_WIN)[None, :, None]) * BR + i_ix
    sigma = np.empty(m_pad, np.int64)
    sigma[old_rows.reshape(-1)] = new_rows.reshape(-1)
    # unpermute: y_old[w, b, i] = y_new[w, bsrc[w,b,i], i] where
    # bsrc[w, order[w,j,i], i] = j
    bsrc = np.empty((nwin, SORT_WIN, BR), np.int32)
    j_ix = np.broadcast_to(np.arange(SORT_WIN)[None, :, None],
                           order.shape)
    np.put_along_axis(bsrc, order, j_ix.astype(np.int32), axis=1)
    return sigma[:m], bsrc.reshape(nwin * SORT_WIN, BR)


def _make_unpermute(bsrc: np.ndarray, dtype, interpret: bool,
                    wins_per_step: int = 8):
    """Pallas pass applying the per-lane block un-permutation:
    y[b, i] = y'[bsrc[b, i] (window-local), i] via 8 one-hot MXU
    matmuls per 128-block window (~16k iota compares each — for a
    1M-row matrix the whole pass is ~13M compares, <2% of the SpMV).

    Returns (fn(y' (mbp,8), bsrc_dev) -> y (mbp,8), bsrc_dev).
    """
    mbp = bsrc.shape[0]
    nwin = mbp // SORT_WIN
    while nwin % wins_per_step:
        wins_per_step //= 2
    rows_blk = SORT_WIN * wins_per_step

    def kernel(y_ref, bs_ref, out_ref):
        cm = jax.lax.broadcasted_iota(jnp.int32, (SORT_WIN, BR), 1)
        for w in range(wins_per_step):
            yw = y_ref[w * SORT_WIN:(w + 1) * SORT_WIN, :]
            bs = bs_ref[w * SORT_WIN:(w + 1) * SORT_WIN, :]
            jota = jax.lax.broadcasted_iota(
                jnp.int32, (SORT_WIN, SORT_WIN), 1)
            acc = None
            for i in range(BR):
                oh = (jota == bs[:, i:i + 1]).astype(jnp.bfloat16)
                t = _dot_passes(oh, yw, 2, jnp.float32)  # (128, 8)
                t = jnp.where(cm == i, t, 0.0)
                acc = t if acc is None else acc + t
            out_ref[w * SORT_WIN:(w + 1) * SORT_WIN, :] = \
                acc.astype(out_ref.dtype)

    call = pl.pallas_call(
        kernel,
        grid=(nwin // wins_per_step,),
        in_specs=[pl.BlockSpec((rows_blk, BR), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows_blk, BR), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_blk, BR), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mbp, BR), dtype),
        interpret=interpret,
    )
    bsrc_d = jax.device_put(jnp.asarray(bsrc))
    return call, bsrc_d


def _span_of(window: np.ndarray, group: int) -> int:
    """Max number of windows any ``group``-tile epilogue step touches
    (the make_span_segsum W; epilogue cost scales with W*h)."""
    T = window.shape[0]
    if T == 0:
        return 1
    t_pad = -(-T // group) * group
    w = np.pad(window, (0, t_pad - T),
               constant_values=int(window.max(initial=0)))
    base = w[::group].astype(np.int64)
    return int((w.reshape(-1, group)[:, -1] - base).max(initial=0)) + 1


def auto_pell_params(A: CSR, *, quantum: int | str = "auto",
                     window_h: int | str = "auto",
                     panel_w: int | str = "auto",
                     row_sort: bool | str = "auto",
                     g_max: int | None = None,
                     chunk: int | str = "auto") -> dict:
    """Resolve the PELL tuning axes from (8-row block, 128-col panel)
    bucket statistics — shared by the single-chip ``prepare_pell`` and
    the distributed path (VERDICT r2 item 3: shards must inherit the
    same tuning). Explicit values pass through untouched.

    Heuristics (all measured, docs/PERF_LOG.md round 2): dense buckets
    (banded/FEM, avg >= 8 nnz/bucket) keep quantum=16 / panel_w=1 and
    small windows (wh=48: 82.9 vs 76.6 GF/s on the flagship); thin
    buckets (power-law scatter) get q=8 + panel_w=4 superpanels +
    row_sort clustering + g_max=4096 (enabling chunk=256: 13.10 vs
    12.63 GF/s on the powerlaw archetype).
    """
    avg_bucket = None
    if A.nnz and (quantum == "auto" or panel_w == "auto"
                  or row_sort == "auto" or window_h == "auto"
                  or g_max is None):
        npan1 = max(1, -(-A.n // BC))
        bkey = ((A.row_ids().astype(np.int64) // BR) * npan1
                + A.ja // BC)
        nb = np.unique(bkey).shape[0]
        avg_bucket = A.nnz / max(nb, 1)
    if quantum == "auto":
        quantum = (DEFAULT_QUANTUM if avg_bucket is None
                   or avg_bucket >= 8 else 8)
    if panel_w == "auto":
        panel_w = (1 if avg_bucket is None
                   or avg_bucket >= 2 * quantum else 4)
    if g_max is None:
        # scattered regime: epilogue window span W stays small (tiles
        # cluster after row_sort), so a larger per-step one-hot is
        # cheap and chunk=256 amortizes fixed step costs. An explicit
        # g_max always wins.
        g_max = (4096 if avg_bucket is not None and avg_bucket < 8
                 else 2048)
    if window_h == "auto":
        window_h = (48 if avg_bucket is not None and avg_bucket >= 8
                    else DEFAULT_WINDOW_H)
    if row_sort == "auto":
        # sort when quantum-level fill would land under ~0.2
        row_sort = (avg_bucket is not None
                    and avg_bucket < 1.6 * max(quantum, 8))
    if chunk == "auto":
        # scattered regime: chunk=256 amortizes fixed per-step costs
        # (measured: 12.5 vs 10.0 GF/s on the powerlaw archetype with
        # row_sort); dense buckets keep the wider-window default.
        chunk = (256 if avg_bucket is not None and avg_bucket < 8
                 else 2 * DEFAULT_CHUNK)
    # Large nq (small quantum) inflates the per-step one-hot (W*h, g):
    # cap the chunk so g = chunk*nq stays MXU/VMEM-friendly.
    chunk = min(chunk, max(8, g_max // (BC // quantum)))
    return dict(quantum=quantum, window_h=window_h, panel_w=panel_w,
                row_sort=row_sort, g_max=g_max, chunk=chunk,
                avg_bucket=avg_bucket)


def prepare_pell(A: CSR, dtype=jnp.float32,
                 chunk: int | str = "auto",
                 quantum: int | str = "auto",
                 window_h: int | str = "auto",
                 epilogue_sub: int = 4, idx_dtype=None,
                 precision_passes: int = 2, hot_cols: int = 0,
                 split_shift: bool = False, scheme: str = "auto",
                 epilogue_passes: int = 2, dedup_max: int = 0,
                 epilogue_ncat: bool = False, diag: str = "",
                 span_max: int = 8, x_vmem_budget: int = X_VMEM_BUDGET,
                 row_sort: bool | str = "auto",
                 panel_w: int | str = "auto", g_max: int | None = None,
                 interpret: bool | None = None, Prepared=None, **_):
    auto = auto_pell_params(A, quantum=quantum, window_h=window_h,
                            panel_w=panel_w, row_sort=row_sort,
                            g_max=g_max, chunk=chunk)
    quantum, window_h = auto["quantum"], auto["window_h"]
    panel_w, row_sort = auto["panel_w"], auto["row_sort"]
    # x too big for VMEM → column-striped fused kernels (one jit
    # program summing per-stripe y) instead of the XLA cliff.
    # p_rows is padded to a panel_w multiple (<= 8) inside
    # _make_fused_spmv, so the trigger uses the padded bound — a
    # near-boundary n must stripe, not raise.
    p_rows_pad = -(-(-(-A.n // BC)) // 8) * 8   # ceil(ceil(n/128)/8)*8
    if p_rows_pad * BC * jnp.dtype(dtype).itemsize > x_vmem_budget:
        return _prepare_pell_striped(
            A, dtype=dtype, x_vmem_budget=x_vmem_budget,
            Prepared=Prepared, chunk=auto["chunk"], quantum=quantum,
            window_h=window_h, precision_passes=precision_passes,
            epilogue_passes=epilogue_passes, interpret=interpret,
            span_max=span_max)
    # Row-space transform: rank-sort clustering for scattered matrices
    # (undone on device by the _make_unpermute one-hot pass);
    # enabled by auto_pell_params when buckets are thin.
    m_orig = A.m
    bsrc = None
    if row_sort:
        sigma, bsrc = _rank_sort_sigma(A)
        m_pad = bsrc.shape[0] * BR
        A = CSR.from_coo(A.name, m_pad, A.n, sigma[A.row_ids()],
                         A.ja, A.as_)

    # column-space transforms: each relabels columns into a region
    # appended past ceil(n/128)*128 and records how to extend x at run
    # time (order matters — later transforms see the extended space)
    extenders = []  # (n_before, hot_idx-or-None)
    if split_shift and 2 * 4 * (A.n + BC) < X_VMEM_BUDGET:
        n_before = A.n
        A, extra = _dual_grid_remap(A)
        if extra:
            extenders.append((n_before, None))
    if hot_cols:
        n_before = A.n
        A, _, hot_idx = _hot_column_remap(A, hot_cols, quantum)
        if hot_idx is not None:
            extenders.append((n_before, jax.device_put(
                jnp.asarray(hot_idx))))
    n_hot = 0 if not extenders or extenders[-1][1] is None \
        else int(extenders[-1][1].shape[0])

    # Scheme choice. "fused"/"span" pack with chunk_align=1 (NO
    # per-window tile padding — the round-1 ~25% fill loss) as long as
    # every grid-step tile group touches <= span_max windows;
    # otherwise the window-pure scheme pads each window to a chunk
    # multiple. "fused" (the default) computes the windowed segment-sum
    # inside the tile kernel itself — partials never touch HBM.
    # auto_pell_params capped the chunk so g = chunk*nq stays
    # MXU/VMEM-friendly.
    chunk = auto["chunk"]

    P = None
    use_scheme = scheme
    use_wh = window_h
    if scheme == "span" and panel_w != 1:
        # the span scheme's tile kernel (_make_tile_spmv) has no
        # superpanel support — silently mis-gathers if handed a
        # panel_w>1 packing
        panel_w = 1
    if scheme in ("auto", "fused", "span"):
        # pw>1 requires the fused kernel; escalate window_h (coarser
        # windows → smaller span) before giving up the superpanels
        span = span_max + 1
        for wh_try in (window_h, 2 * window_h, 4 * window_h):
            P = csr_to_pell(A, quantum=quantum, window_h=wh_try,
                            chunk_align=1, min_chunk_align=1,
                            panel_w=panel_w)
            group = chunk if scheme != "span" else chunk * epilogue_sub
            span = _span_of(P.window, group)
            if span <= span_max:
                use_scheme = ("fused" if scheme in ("auto", "fused")
                              else "span")
                use_wh = wh_try
                break
        if span > span_max:
            if scheme != "auto":
                raise ValueError(
                    f"pallas-pell: a grid step would span {span} > "
                    f"{span_max} windows; use scheme='pure', a larger "
                    "window_h, or raise span_max")
            use_scheme, P, panel_w = "pure", None, 1
    if P is None:
        panel_w = 1
        P = csr_to_pell(A, quantum=quantum, window_h=window_h,
                        chunk_align=chunk * epilogue_sub,
                        min_chunk_align=chunk)
    from spmv_scpa_tpu.ops.registry import bind
    if use_scheme == "fused":
        raw, args = _make_fused_spmv(
            name="pallas-pell", m=A.m, n=A.n, vals=P.vals, lcol=P.lcol,
            panel=P.panel, rbl=P.rbl, window=P.window,
            window_h=use_wh, dtype=dtype, chunk=chunk,
            interpret=interpret, idx_dtype=idx_dtype,
            precision_passes=precision_passes,
            epilogue_passes=epilogue_passes, panel_w=P.panel_w,
            epilogue_ncat=epilogue_ncat, diag=diag)
    else:
        raw, args = _make_tile_spmv(
            name="pallas-pell", m=A.m, n=A.n, vals=P.vals, lcol=P.lcol,
            panel=P.panel, rbl=P.rbl, window=P.window,
            window_h=use_wh if use_scheme == "span" else window_h,
            dtype=dtype, chunk=chunk,
            interpret=interpret, epilogue_sub=epilogue_sub,
            idx_dtype=idx_dtype, precision_passes=precision_passes,
            scheme=use_scheme, epilogue_passes=epilogue_passes,
            dedup_max=dedup_max)
    if extenders:
        inner_raw = raw
        specs = [(nb, -(-nb // BC) * BC, hot is not None)
                 for nb, hot in extenders]
        # hot-column index vectors travel as jit ARGUMENTS (repo
        # convention: never closure/trace constants)
        hot_args = tuple(jax.device_put(jnp.asarray(hot))
                         for _, hot in extenders if hot is not None)
        n_hot_args = len(hot_args)  # index VECTORS, not hot-col count

        def raw(x, *a):
            hots, inner = a[:n_hot_args], a[n_hot_args:]
            xe = x.astype(dtype)
            hi = 0
            for n_before, n_pad, has_hot in specs:
                if has_hot:
                    tail = jnp.take(xe, hots[hi])
                    hi += 1
                else:
                    tail = xe[64:n_before]
                xe = jnp.concatenate(
                    [xe, jnp.zeros((n_pad - n_before,), dtype), tail])
            return inner_raw(xe, *inner)

        args = (*hot_args, *args)

    if bsrc is not None:
        unperm_call, bsrc_d = _make_unpermute(
            bsrc, dtype,
            interpret if interpret is not None else _auto_interpret())
        mbp = bsrc.shape[0]
        sorted_raw = raw

        def raw(x, bsrc_a, *a):  # noqa: F811
            y = sorted_raw(x, *a)                    # (m_pad,) sorted
            y2 = unperm_call(y.reshape(mbp, BR), bsrc_a)
            return y2.reshape(-1)[:m_orig]

        args = (bsrc_d, *args)

    lcol_bytes = 1 if (chunk * BR) % 32 == 0 and idx_dtype is None else 4
    if P.panel_w > 1:
        lcol_bytes += 1 if lcol_bytes == 1 else 4   # strip plane
    return Prepared("pallas-pell", A.name, bind(raw, args), on_device=True,
                    nnz=A.nnz, raw=raw, args=args,
                    hbm_bytes=P.num_tiles * BR * BC * (4 + lcol_bytes),
                    meta={"num_blocks": P.num_tiles, "fill": P.fill,
                          "chunk": chunk, "quantum": quantum,
                          "window_h": use_wh, "hot_cols": n_hot,
                          "panel_w": P.panel_w,
                          "scheme": use_scheme,
                          "row_sort": bsrc is not None,
                          "split_shift": bool(
                              extenders and extenders[0][1] is None)})


def prepare_bcsr(A: CSR, dtype=jnp.float32, chunk: int = DEFAULT_CHUNK,
                 window_h: int = DEFAULT_WINDOW_H,
                 max_padded_bytes: int = 2 << 30,
                 interpret: bool | None = None, Prepared=None, **_):
    # scattered matrices put ~1 nnz per 4KB tile — refuse before the
    # dense tile stack explodes (host AND device)
    est_tiles = np.unique(
        (A.row_ids().astype(np.int64) // BR) * ((A.n + BC - 1) // BC)
        + A.ja // BC).shape[0]
    if est_tiles * BR * BC * 4 > max_padded_bytes:
        raise ValueError(
            f"bcsr: {est_tiles} tiles would need "
            f"{est_tiles * BR * BC * 4} B; matrix too scattered for "
            "dense tiles — use pallas-pell")
    B = csr_to_bcsr(A, br=BR, bc=BC)
    rowblk = np.repeat(np.arange(B.num_block_rows, dtype=np.int32),
                       np.diff(B.rowptr))
    vals, panel, window, rbl, _ = _window_pad_tiles(
        B.vals, B.col_panel, rowblk, window_h, chunk * 4, min_chunk=chunk,
        num_win=max(1, -(-B.num_block_rows // window_h)))
    from spmv_scpa_tpu.ops.registry import bind
    raw, args = _make_tile_spmv(name="pallas-bcsr", m=A.m, n=A.n,
                                vals=vals, lcol=None, panel=panel,
                                rbl=rbl, window=window, window_h=window_h,
                                dtype=dtype, chunk=chunk,
                                interpret=interpret, epilogue_sub=4)
    return Prepared("pallas-bcsr", A.name, bind(raw, args), on_device=True,
                    nnz=A.nnz, raw=raw, args=args,
                    hbm_bytes=vals.shape[0] * BR * BC * 4,
                    meta={"num_blocks": B.num_tiles, "fill": B.fill,
                          "chunk": chunk, "window_h": window_h})


def register_all(register, StrategySpec, Prepared):
    register(StrategySpec(
        "pallas-pell", "PELL", "pallas",
        "cuda_hll.cu:80-104 (warp-per-block) + cuda_csr.cu:145-178 "
        "(texture-resident x); quantum axis ~ halfwarp/warp width "
        "(cuda_csr.cu:62-90)",
        prepare=functools.partial(prepare_pell, Prepared=Prepared)))
    register(StrategySpec(
        "pallas-bcsr", "BCSR", "pallas",
        "cuda_csr.cu:96-140 (block-per-row cooperative tiles)",
        prepare=functools.partial(prepare_bcsr, Prepared=Prepared)))
    register(StrategySpec(
        "pallas-bcsr-spmm", "BCSR", "pallas",
        "no reference analog (single-vector only); BASELINE.json "
        "config 3: multi-vector SpMM through the MXU",
        prepare=functools.partial(prepare_bcsr_spmm, Prepared=Prepared),
        spmm=True, spmm_only=True))
    register(StrategySpec(
        "pallas-pell-df64", "PELL", "pallas",
        "fp64-grade fused kernel (reference computes natively in fp64, "
        "include/csr.h:12); digit-plane exact fixed-point MXU reduction",
        prepare=functools.partial(prepare_pell_df64, Prepared=Prepared)))
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_hybrid
    register(StrategySpec(
        "pallas-hybrid", "LELL", "pallas",
        "cuda_hll.cu:49-72 (k1 thread-per-row, coalesced col-major = "
        "rows-as-lanes) + cuda_csr.cu:145-178 (texture x ~ VMEM window) "
        "+ SURVEY section 7 hard part 3 (hybrid hub/tail split)",
        prepare=functools.partial(prepare_lane_ell_hybrid,
                                  Prepared=Prepared)))
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_df64
    register(StrategySpec(
        "pallas-hybrid-df64", "LELL", "pallas",
        "fp64-grade lane-ELL core (reference computes natively in "
        "fp64, include/csr.h:12): Dekker TwoProd + exact digit-plane "
        "accumulation on the rows-as-lanes slot chain (TwoSum pairs "
        "are not compiler-stable under XLA FMA contraction)",
        prepare=functools.partial(prepare_lane_ell_df64,
                                  Prepared=Prepared)))
    from spmv_scpa_tpu.ops.chips_tail import prepare_chips_strategy
    register(StrategySpec(
        "pallas-chips", "CHIPS", "pallas",
        "cuda_csr.cu:96-140 (k3 block-per-row cooperative reduce) as "
        "two-stage Pallas gather + MXU one-hot row reduction",
        prepare=functools.partial(prepare_chips_strategy,
                                  Prepared=Prepared)))

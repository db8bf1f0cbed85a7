"""Windowed one-hot segment-sum — a Pallas replacement for XLA's
scatter-based ``segment_sum``.

Why: on TPU, XLA lowers both gather and scatter to near-scalar loops; a
single ``segment_sum`` epilogue over per-quantum partials cost 6 ms on
the ML_Laplace archetype while the SpMV kernel itself took 1.85 ms
(measured; see git history and docs/PERF_LOG.md). The reference's
analog is the final per-row write of each CUDA kernel — effectively
free there, so it must be effectively free here too.

Idea: rows of ``y`` are grouped into contiguous *windows* of
``H`` 8-row blocks. The partial stream is produced window-grouped (the
format packers guarantee it; each grid step's partials belong to one
window). Per step the kernel:

1. transposes the native (rows, nq) partial block to quantum-major
   (fused — a separate XLA transpose pass cost 2.2 ms),
2. builds a one-hot matrix ``OH[h, g] = (rbl[g] == h)`` from an iota
   comparison (exact in bf16),
3. accumulates ``y_window += OH @ partials`` with bf16x3 MXU matmuls —
   a manual 3-pass f32 emulation (measured as accurate as and 1.5x
   faster than Precision.HIGHEST's 6 passes; Mosaic does not lower
   Precision.HIGH).

Segment reduction as matrix multiply: no gather or scatter anywhere.
Padding rows carry ``rbl = H`` (matches no one-hot row → zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 8  # partial row width (f32 sublane count of the SpMV tiles)


def dot_f32_via_bf16x3(a_exact, b_f32, out_dtype=jnp.float32):
    """``a @ b`` where ``a`` is exactly representable in bf16 (0/1
    one-hots, segment masks): split ``b`` into three bf16 terms and run
    three DEFAULT-precision MXU passes — f32-grade accuracy at half the
    cost of Precision.HIGHEST (which Mosaic implements as 6 passes)."""
    b1 = b_f32.astype(jnp.bfloat16)
    r1 = b_f32 - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    a = a_exact.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    return (dot(a, b1) + dot(a, b2) + dot(a, b3)).astype(out_dtype)



def make_visit_masks(base_of_step, num_windows: int, span: int,
                     rep: int) -> np.ndarray:
    """Visit masks for staggered-window outputs: ``masks[k]`` is True
    (repeated ``rep`` x per window) where some grid step writes window
    ``base+k`` — the final y assembly sums ``where(mask[k], out_k, 0)``
    so unvisited staggered buffers contribute nothing. Shared by the
    fused SpMV kernel, the span epilogue, and the fused SpMM.
    Returns bool (span, num_windows*rep)."""
    vis = np.unique(base_of_step)
    masks = np.zeros((span, num_windows), dtype=bool)
    for k in range(span):
        vk = vis + k
        masks[k, vk[vk < num_windows]] = True
    return np.repeat(masks, rep, axis=1)


def make_span_segsum(*, base_of_step: np.ndarray, num_windows: int,
                     h: int, rows_per_step: int, nq: int,
                     total_tile_rows: int, span: int = 2,
                     dtype=jnp.float32, interpret: bool = False,
                     passes: int = 3):
    """Bounded-span variant of the windowed segment-sum: a grid step
    may straddle up to ``span-1`` window boundaries, which frees the
    SpMV tile packer from padding every window's tile count to a grid
    multiple — the measured ~25% fill loss of round 1
    (docs/PERF_LOG.md).

    Per step s with base window ``b = base_of_step[s]`` (the window of
    the step's first tile, non-decreasing):

    1. transpose the native (rows, nq) partial block to (g, 8),
    2. one-hot ``OH[j, q] = (rowblk[q] - b*h == j)`` over a span*h
       range,
    3. ``acc = OH @ partials`` (span*h, 8) via bf16 split passes,
    4. accumulate acc[k*h:(k+1)*h] into block ``b+k`` of the k-th of
       ``span`` staggered outputs (Pallas revisit-accumulated).

    y = sum_k where(mask_k, out_k): output block b+k of out_k holds
    window b+k's rows, so window w sits at rows [w*h,(w+1)*h) of every
    output; mask_k marks blocks some step actually visited (unvisited
    blocks are uninitialized VMEM — where, not multiply: 0*NaN=NaN).
    ``rowblk`` is the GLOBAL row-block id per quantum; padding quanta
    may hold any value since their partials are exactly 0.0.

    Returns ``fn(partials, rowblk) -> y (num_windows*h, 8)``.
    """
    steps = total_tile_rows // rows_per_step
    assert base_of_step.shape == (steps,), (base_of_step.shape, steps)
    tiles_per_step = rows_per_step // BR
    g = tiles_per_step * nq
    W = span
    base_d = jax.device_put(jnp.asarray(base_of_step, jnp.int32))
    steps_pad = -(-steps // 8) * 8

    # base/mask travel as jit ARGUMENTS (CLAUDE.md: closure constants
    # get baked into the executable and re-shipped per compile)
    mask_d = jax.device_put(jnp.asarray(
        make_visit_masks(base_of_step, num_windows, W, h)[:, :, None]))

    def kernel(base_ref, rbl_ref, part_ref, *out_refs):
        i = pl.program_id(0)
        b = base_ref[i]
        prev = base_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, b != prev)

        @pl.when(is_first)
        def _():
            for o in out_refs:
                o[:] = jnp.zeros_like(o)

        part = part_ref[:].reshape(tiles_per_step, BR, nq)
        part = jnp.transpose(part, (0, 2, 1)).reshape(g, BR)

        rel = rbl_ref[pl.ds(i % 8, 1), :] - b * h            # (1, g)
        hh = jax.lax.broadcasted_iota(jnp.int32, (W * h, g), 0)
        oh = (hh == rel).astype(jnp.bfloat16)
        acc = _dot_passes(oh, part, passes, jnp.float32)     # (W*h, 8)
        for k, o in enumerate(out_refs):
            o[:] += acc[k * h:(k + 1) * h].astype(o.dtype)

    def out_map(k):
        return lambda i, base: (base[i] + k, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, g), lambda i, base: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, nq), lambda i, base: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((h, BR), out_map(k),
                                memory_space=pltpu.VMEM)
                   for k in range(W)],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(((num_windows + W - 1) * h, BR),
                                        dtype) for _ in range(W)],
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * W * h * g * BR,
            bytes_accessed=total_tile_rows * nq * 4
            + W * num_windows * h * BR * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def fn(partials, rowblk, base_a, mask_a):
        rbl2 = rowblk.reshape(steps, g)
        if steps_pad != steps:
            rbl2 = jnp.pad(rbl2, ((0, steps_pad - steps), (0, 0)))
        outs = call(base_a, rbl2, partials)
        zero = jnp.zeros((), dtype)
        y = None
        for k in range(W):
            t = jnp.where(mask_a[k], outs[k][:num_windows * h], zero)
            y = t if y is None else y + t
        return y

    return fn, (base_d, mask_d)


def _dot_passes(a_exact, b_f32, passes: int, out_dtype):
    """``a @ b`` with ``a`` bf16-exact and ``b`` f32 split into
    ``passes`` bf16 terms (3 = f32-grade; 2 ≈ 1.5e-5 rel)."""
    dn = (((1,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    a = a_exact.astype(jnp.bfloat16)
    acc = None
    rem = b_f32
    for _ in range(passes):
        hi = rem.astype(jnp.bfloat16)
        term = dot(a, hi)
        acc = term if acc is None else acc + term
        rem = rem - hi.astype(jnp.float32)
    return acc.astype(out_dtype)


def _dot_passes_ncat(a_exact, b_f32, passes: int, out_dtype):
    """Same math as ``_dot_passes`` but as ONE MXU dot: the bf16 split
    terms of ``b`` concatenate along N, so an N=8 epilogue (which runs
    the MXU at ~6% utilization) issues a single N=8*passes dot instead
    of ``passes`` back-to-back narrow dots. The bf16 terms have no dot
    dependency (each is an elementwise residual), so the concat is
    legal; the (K, 8*passes) materialization is a few KB."""
    if passes <= 1:
        return _dot_passes(a_exact, b_f32, passes, out_dtype)
    dn = (((1,), (0,)), ((), ()))
    terms = []
    rem = b_f32
    for _ in range(passes):
        hi = rem.astype(jnp.bfloat16)
        terms.append(hi)
        rem = rem - hi.astype(jnp.float32)
    cat = jnp.concatenate(terms, axis=1)
    out = jax.lax.dot_general(a_exact.astype(jnp.bfloat16), cat,
                              dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    n = b_f32.shape[1]
    acc = None
    for k in range(passes):
        t = out[:, k * n:(k + 1) * n]
        acc = t if acc is None else acc + t
    return acc.astype(out_dtype)


def make_window_segsum(*, win_of_step: np.ndarray, num_windows: int,
                       h: int, rows_per_step: int, nq: int,
                       total_tile_rows: int, dtype=jnp.float32,
                       interpret: bool = False):
    """Build ``fn(partials, rbl) -> y`` where

    * ``partials`` (total_tile_rows, nq) — the SpMV kernel's native
      per-(tile-row, quantum) partial layout, window-grouped,
    * ``rbl`` (total_tile_rows//8 * nq,) int32 — window-local row-block
      ids in (tile, quantum) order (value ``h`` == padding),
    * ``y`` (num_windows * h, BR).

    ``rows_per_step``: tile rows consumed per grid step (= sub * chunk
    * 8); the per-step quantum count is ``rows_per_step//8*nq``.
    ``win_of_step`` (steps,) gives each step's window (non-decreasing).
    """
    steps = total_tile_rows // rows_per_step
    assert win_of_step.shape == (steps,), (win_of_step.shape, steps)
    tiles_per_step = rows_per_step // BR
    g = tiles_per_step * nq                        # quanta per step
    win_d = jax.device_put(jnp.asarray(win_of_step, jnp.int32))
    # Mosaic block tiling requires the sublane dim be a multiple of 8
    # (or the whole array): rbl ships 8 steps of metadata per block.
    steps_pad = -(-steps // 8) * 8

    def kernel(win_ref, rbl_ref, part_ref, out_ref):
        i = pl.program_id(0)
        w = win_ref[i]
        prev = win_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, w != prev)

        @pl.when(is_first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # fused transpose: (tiles*8, nq) -> (tiles*nq, 8)
        part = part_ref[:].reshape(tiles_per_step, BR, nq)
        part = jnp.transpose(part, (0, 2, 1)).reshape(g, BR)

        rbl = rbl_ref[pl.ds(i % 8, 1), :]                    # (1, g)
        hh = jax.lax.broadcasted_iota(jnp.int32, (h, g), 0)
        oh = (hh == rbl).astype(jnp.float32)                 # (h, g)
        out_ref[:] += dot_f32_via_bf16x3(oh, part, out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, g), lambda i, win: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, nq), lambda i, win: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (h, BR), lambda i, win: (win[i], 0),
            memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * h, BR), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * h * g * BR,
            bytes_accessed=total_tile_rows * nq * 4
            + num_windows * h * BR * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def fn(partials, rbl, win_a):
        rbl2 = rbl.reshape(steps, g)
        if steps_pad != steps:
            rbl2 = jnp.pad(rbl2, ((0, steps_pad - steps), (0, 0)))
        return call(win_a, rbl2, partials)

    return fn, (win_d,)

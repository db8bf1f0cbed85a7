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

    def fn(partials, rbl):
        rbl2 = rbl.reshape(steps, g)
        if steps_pad != steps:
            rbl2 = jnp.pad(rbl2, ((0, steps_pad - steps), (0, 0)))
        return call(win_d, rbl2, partials)

    return fn

"""Windowed one-hot segment-sum — a Pallas replacement for XLA's
scatter-based ``segment_sum``.

Why: on TPU, XLA lowers both gather and scatter to near-scalar loops; a
single ``segment_sum`` epilogue over per-quantum partials cost 6 ms on
the ML_Laplace archetype while the SpMV kernel itself took 1.85 ms
(measured; see git history). The reference's analog is the final
per-row write of each CUDA kernel — effectively free there, so it must
be effectively free here too.

Idea: rows of ``y`` are grouped into contiguous *windows* of
``H`` 8-row blocks. The partial stream is produced window-grouped (the
format packers guarantee it; each grid step's partials belong to one
window). Per step the kernel builds a one-hot matrix
``OH[h, g] = (rbl[g] == h)`` on the VPU from an iota comparison and
accumulates ``y_window += OH @ partials`` with a single MXU matmul —
segment reduction as matrix multiply, no scatter anywhere. The output
block revisits the same window across steps (zeroed on window change)
and flushes when the window advances.

Padding rows carry ``rbl = H`` (matches no one-hot row → contributes
zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 8  # partial row width (f32 sublane count of the SpMV tiles)


def make_window_segsum(*, win_of_step: np.ndarray, num_windows: int,
                       h: int, chunk_rows: int, total_rows: int,
                       dtype=jnp.float32, interpret: bool = False):
    """Build ``fn(partials, rbl) -> y`` where

    * ``partials``  (total_rows, BR) — window-grouped partial sums,
    * ``rbl``       (total_rows,) int32 — window-local row-block ids
      (value ``h`` == padding), laid out as (steps, chunk_rows),
    * ``y``         (num_windows * h, BR).

    ``win_of_step`` (steps,) gives each step's window (non-decreasing).
    """
    steps = total_rows // chunk_rows
    assert win_of_step.shape == (steps,)
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

        rbl = rbl_ref[pl.ds(i % 8, 1), :]                    # (1, G)
        hh = jax.lax.broadcasted_iota(jnp.int32, (h, chunk_rows), 0)
        oh = (hh == rbl).astype(part_ref.dtype)              # (h, G)
        out_ref[:] += jax.lax.dot_general(
            oh, part_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, chunk_rows), lambda i, win: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, BR), lambda i, win: (i, 0),
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
            flops=2 * steps * h * chunk_rows * BR,
            bytes_accessed=total_rows * BR * 4 + num_windows * h * BR * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def fn(partials, rbl):
        rbl2 = rbl.reshape(steps, chunk_rows)
        if steps_pad != steps:
            rbl2 = jnp.pad(rbl2, ((0, steps_pad - steps), (0, 0)))
        return call(win_d, rbl2, partials)

    return fn

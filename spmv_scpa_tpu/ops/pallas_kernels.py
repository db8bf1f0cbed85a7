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
* **No scatter**: each tile emits an 8-row partial; a tiny XLA
  segment-sum over the (sorted) tile row-block ids finishes y. The
  partial traffic is ``T*8*4 B`` ≈ vals/128 — negligible.

Per-tile work in the kernel body: 2 dynamic slices, one lane gather,
one multiply, one lane reduction — all VPU; the kernel is HBM-bandwidth
bound by construction, which is the roofline the benchmark targets
(BASELINE.md).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_scpa_tpu.formats.bcsr import csr_to_bcsr
from spmv_scpa_tpu.formats.csr import CSR
from spmv_scpa_tpu.formats.panel_ell import BC, BR, csr_to_pell

DEFAULT_CHUNK = 16           # tiles per grid step (tunable sweep axis)
X_VMEM_BUDGET = 12 << 20     # max bytes of x kept resident in VMEM


def _auto_interpret() -> bool:
    from spmv_scpa_tpu.utils.platform import is_tpu
    return not is_tpu()


def _pad_tiles(arr: np.ndarray, t_pad: int, fill=0):
    if arr.shape[0] == t_pad:
        return arr
    pad = [(0, t_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def _tile_kernel(chunk: int, gathered: bool):
    """Kernel body: process ``chunk`` tiles of (8,128) slots.

    refs: pan (SMEM, prefetched), x (P,128) VMEM, vals (chunk*8,128),
    [lcol (chunk*8,128) if gathered], out (chunk*8,1).
    """

    def kernel(pan_ref, x_ref, vals_ref, *rest):
        if gathered:
            lcol_ref, out_ref = rest
        else:
            (out_ref,) = rest
        t0 = pl.program_id(0) * chunk

        def body(c, _):
            v = vals_ref[pl.ds(c * BR, BR), :]
            p = pan_ref[t0 + c]
            xp = jnp.broadcast_to(x_ref[pl.ds(p, 1), :], (BR, BC))
            if gathered:
                li = lcol_ref[pl.ds(c * BR, BR), :]
                xp = jnp.take_along_axis(xp, li, axis=1)
            out_ref[pl.ds(c * BR, BR), :] = jnp.sum(
                v * xp, axis=1, keepdims=True)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=True)

    return kernel


def _make_tile_spmv(*, name: str, m: int, n: int, vals: np.ndarray,
                    lcol: np.ndarray | None, panel: np.ndarray,
                    rowblk: np.ndarray, dtype, chunk: int,
                    interpret: bool | None):
    """Shared driver for PELL (gathered) and BCSR (dense) tile kernels.

    Builds a raw traceable ``fn(x[n]) -> y[m]``: Pallas tile pass producing
    per-tile 8-row partials, then an XLA segment-sum epilogue over the
    sorted row-block ids.
    """
    if interpret is None:
        interpret = _auto_interpret()
    T = vals.shape[0]
    t_pad = max(chunk, -(-T // chunk) * chunk)
    mb = (m + BR - 1) // BR
    p_rows = max(1, -(-n // BC))

    x_bytes = p_rows * BC * jnp.dtype(dtype).itemsize
    if x_bytes > X_VMEM_BUDGET:
        raise ValueError(
            f"{name}: x ({x_bytes} B) exceeds VMEM budget {X_VMEM_BUDGET} B;"
            " use an XLA strategy for this matrix")

    gathered = lcol is not None
    vals_d = jax.device_put(
        jnp.asarray(_pad_tiles(vals, t_pad).reshape(t_pad * BR, BC), dtype))
    pan_d = jax.device_put(jnp.asarray(_pad_tiles(panel, t_pad), jnp.int32))
    rb_d = jax.device_put(jnp.asarray(
        _pad_tiles(rowblk, t_pad, fill=mb), jnp.int32))
    # index maps take (grid idx, *prefetched scalar refs)
    tile_map = lambda i, pan: (i, 0)  # noqa: E731
    inputs = [vals_d]
    in_specs = [pl.BlockSpec((chunk * BR, BC), tile_map,
                             memory_space=pltpu.VMEM)]
    if gathered:
        lcol_d = jax.device_put(
            jnp.asarray(_pad_tiles(lcol, t_pad).reshape(t_pad * BR, BC),
                        jnp.int32))
        inputs.append(lcol_d)
        in_specs.append(pl.BlockSpec((chunk * BR, BC), tile_map,
                                     memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_pad // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((chunk * BR, 1), tile_map,
                               memory_space=pltpu.VMEM),
    )
    vmem_limit = min(
        int(x_bytes + 4 * chunk * BR * BC * 8 + (2 << 20)), 100 << 20)
    call = pl.pallas_call(
        _tile_kernel(chunk, gathered),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad * BR, 1), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * BR * BC,
            bytes_accessed=int(vals_d.size * (8 if gathered else 4)
                               + x_bytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def raw(x, pan, rb, *tiles):
        xp = jnp.zeros((p_rows * BC,), dtype)
        xp = xp.at[:n].set(x.astype(dtype)).reshape(p_rows, BC)
        partials = call(pan, xp, *tiles)             # (t_pad*8, 1)
        y = jax.ops.segment_sum(partials.reshape(t_pad, BR), rb,
                                num_segments=mb + 1,
                                indices_are_sorted=True)
        return y[:mb].reshape(-1)[:m]

    return raw, (pan_d, rb_d, *inputs)


# ---------------------------------------------------------------------------
# Strategy prepare() implementations
# ---------------------------------------------------------------------------

def prepare_pell(A: CSR, dtype=jnp.float32, chunk: int = DEFAULT_CHUNK,
                 interpret: bool | None = None, Prepared=None, **_):
    P = csr_to_pell(A)
    from spmv_scpa_tpu.ops.registry import bind
    raw, args = _make_tile_spmv(name="pallas-pell", m=A.m, n=A.n,
                                vals=P.vals, lcol=P.lcol, panel=P.panel,
                                rowblk=P.rowblk, dtype=dtype, chunk=chunk,
                                interpret=interpret)
    return Prepared("pallas-pell", A.name, bind(raw, args), on_device=True,
                    nnz=A.nnz, raw=raw, args=args,
                    hbm_bytes=P.hbm_bytes,
                    meta={"num_blocks": P.num_tiles, "fill": P.fill,
                          "chunk": chunk})


def prepare_bcsr(A: CSR, dtype=jnp.float32, chunk: int = DEFAULT_CHUNK,
                 interpret: bool | None = None, Prepared=None, **_):
    B = csr_to_bcsr(A, br=BR, bc=BC)
    rowblk = np.repeat(np.arange(B.num_block_rows, dtype=np.int32),
                       np.diff(B.rowptr))
    from spmv_scpa_tpu.ops.registry import bind
    raw, args = _make_tile_spmv(name="pallas-bcsr", m=A.m, n=A.n,
                                vals=B.vals, lcol=None, panel=B.col_panel,
                                rowblk=rowblk, dtype=dtype, chunk=chunk,
                                interpret=interpret)
    return Prepared("pallas-bcsr", A.name, bind(raw, args), on_device=True,
                    nnz=A.nnz, raw=raw, args=args,
                    hbm_bytes=B.padded_bytes,
                    meta={"num_blocks": B.num_tiles, "fill": B.fill,
                          "chunk": chunk})


def register_all(register, StrategySpec, Prepared):
    register(StrategySpec(
        "pallas-pell", "PELL", "pallas",
        "cuda_hll.cu:80-104 (warp-per-block) + cuda_csr.cu:145-178 "
        "(texture-resident x)",
        prepare=functools.partial(prepare_pell, Prepared=Prepared)))
    register(StrategySpec(
        "pallas-bcsr", "BCSR", "pallas",
        "cuda_csr.cu:96-140 (block-per-row cooperative tiles)",
        prepare=functools.partial(prepare_bcsr, Prepared=Prepared)))

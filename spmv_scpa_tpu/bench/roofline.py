"""HBM-bandwidth roofline accounting.

The BASELINE.json target is expressed as a fraction of the
STREAM-derived HBM roofline on 2*nnz flops: an SpMV kernel is
bandwidth-bound, so its speed-of-light time is

    t_min = bytes_streamed / BW_stream

where ``bytes_streamed`` counts the matrix layout bytes plus one pass
over x and y. ``roofline_fraction = t_min / t_measured``. The reference
implicitly ran at its roofline too (~62 GFLOPS fp64 on a ~400 GB/s
Turing part, BASELINE.md), so %-roofline is the hardware-neutral way to
compare.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

_STREAM_CACHE: dict = {}

# TPU v5e MXU peak (bf16 per-pass FLOPs) — SpMM context only: an
# f32-grade result via k bf16 passes tops out at peak/k. Published
# v5e figure: 197 TFLOP/s bf16.
MXU_PEAK_BF16_GFLOPS = 197_000.0


def measure_stream_bw(n_tiles: int = 16384, chunk: int = 256) -> float:
    """Pure-Pallas read-stream probe: stream a 64 MB array through VMEM
    in (chunk*8, 128) blocks, reducing each block to (8,128). This is
    the REAL per-chip HBM ceiling an SpMV kernel competes against
    (~738 GB/s measured on this v5e) — an XLA fori_loop triad reports
    only ~275 GB/s and would make roofline fractions read >1.
    Returns GB/s; falls back to a jnp copy probe off-TPU."""
    if "bw" in _STREAM_CACHE:
        return _STREAM_CACHE["bw"]
    import jax
    import jax.numpy as jnp

    from spmv_scpa_tpu.bench.timing import time_device_fn, warm_compiler
    from spmv_scpa_tpu.utils.platform import is_tpu
    warm_compiler()

    if not is_tpu():
        # CI / CPU: any positive number keeps reports well-defined
        _STREAM_CACHE["bw"] = 50.0
        return _STREAM_CACHE["bw"]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    big = jax.device_put(jnp.ones((n_tiles * 8, 128), jnp.float32))

    # the loop-carried scalar must flow INTO the pallas call, or the
    # timing loop's XLA can hoist the (loop-invariant) call and measure
    # only the trailing add
    def kern(xs_ref, in_ref, out_ref):
        out_ref[:] = (jnp.sum(in_ref[:].reshape(chunk, 8, 128), axis=0)
                      + xs_ref[0, 0])

    call = pl.pallas_call(
        kern,
        grid=(n_tiles // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((chunk * 8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))

    def raw(x, big):
        return call(x[:1].reshape(1, 1), big).ravel()[:1]

    r = time_device_fn(raw, np.ones(4, np.float32), args=(big,), nnz=1)
    bw = n_tiles * 8 * 128 * 4 / (r.duration_ms * 1e-3) / 1e9
    _STREAM_CACHE["bw"] = bw
    return bw


@dataclass
class RooflineReport:
    stream_bw_gbs: float
    bytes_streamed: int
    t_min_ms: float
    t_measured_ms: float
    fraction: float
    gflops: float
    gflops_at_roofline: float
    fraction_ideal: float = 0.0   # vs the format-free 6 B/nnz minimum


def roofline(prep, duration_ms: float, gflops: float,
             x_bytes: int = 0, y_bytes: int = 0) -> RooflineReport:
    """Roofline report for a measured Prepared strategy run.

    ``fraction`` is against the kernel's ACTUAL streamed bytes
    (``prep.hbm_bytes`` — how close the kernel runs to the stream BW
    on what it moves); ``fraction_ideal`` is against the format-free
    minimum (6 B/nnz: f32 value + panel-local int16 index, plus one x
    and y pass) — the honest ceiling a zero-padding layout could
    reach. actual/ideal ratio = layout padding overhead.
    """
    bw = measure_stream_bw()
    total = prep.hbm_bytes + x_bytes + y_bytes
    t_min_ms = total / (bw * 1e9) * 1e3
    frac = t_min_ms / duration_ms if duration_ms > 0 else 0.0
    ideal = getattr(prep, "nnz", 0) * 6 + x_bytes + y_bytes
    t_ideal_ms = ideal / (bw * 1e9) * 1e3
    return RooflineReport(
        stream_bw_gbs=bw, bytes_streamed=total, t_min_ms=t_min_ms,
        t_measured_ms=duration_ms, fraction=frac, gflops=gflops,
        gflops_at_roofline=gflops / frac if frac > 0 else 0.0,
        fraction_ideal=(t_ideal_ms / duration_ms
                        if duration_ms > 0 else 0.0))

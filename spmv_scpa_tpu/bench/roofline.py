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


def measure_stream_bw(elems: int = 32 << 20, iters_hi: int = 32,
                      iters_lo: int = 8) -> float:
    """Triad-style bandwidth probe (read 2N + write N per iteration),
    two-point difference to cancel dispatch overhead. Returns GB/s."""
    if "bw" in _STREAM_CACHE:
        return _STREAM_CACHE["bw"]
    import jax
    import jax.numpy as jnp

    from spmv_scpa_tpu.bench.timing import warm_compiler
    warm_compiler()

    a = jax.device_put(jnp.ones((elems,), jnp.float32))
    b = jax.device_put(jnp.full((elems,), 2.0, jnp.float32))

    @jax.jit
    def triad(a, b, k):
        def body(i, c):
            y, a_prev = c
            return (a_prev + 0.5 * y, y)
        return jax.lax.fori_loop(0, k, body, (a, b))[0].ravel()[:1]

    np.asarray(triad(a, b, 1))

    def wall(k):
        t0 = time.perf_counter()
        np.asarray(triad(a, b, k))
        return time.perf_counter() - t0

    w_lo, w_hi = wall(iters_lo), wall(iters_hi)
    bw = (iters_hi - iters_lo) * 3 * elems * 4 / max(w_hi - w_lo, 1e-9) / 1e9
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


def roofline(prep, duration_ms: float, gflops: float,
             x_bytes: int = 0, y_bytes: int = 0) -> RooflineReport:
    """Roofline report for a measured Prepared strategy run."""
    bw = measure_stream_bw()
    total = prep.hbm_bytes + x_bytes + y_bytes
    t_min_ms = total / (bw * 1e9) * 1e3
    frac = t_min_ms / duration_ms if duration_ms > 0 else 0.0
    return RooflineReport(
        stream_bw_gbs=bw, bytes_streamed=total, t_min_ms=t_min_ms,
        t_measured_ms=duration_ms, fraction=frac, gflops=gflops,
        gflops_at_roofline=gflops / frac if frac > 0 else 0.0)

"""Strategy registry — the kernel-strategy axis of the framework.

The reference enumerates (backend x format x work-assignment)
strategies via function-pointer dispatch (``compute_benchmark_csr``,
csr.c:182-199; kernel lists in main.c:259-263, 310-315). Here each
strategy is a named entry with a ``prepare`` step (host preprocessing →
device arrays) and a jitted ``fn(x) -> y``, so benchmarks measure only
the kernel, like the reference's cudaEvent timing of the bare launch
(cuda_csr.cu:224-226).

Strategy-name mapping to the reference (SURVEY.md section 2 table):

=====================  =====================================================
 name                   reference analog
=====================  =====================================================
 oracle-csr             serial CSR golden (csr.c:201-216)
 oracle-ell             serial HLL golden (hll.c:127-150)
 xla-csr-segsum         OMP guided / CUDA k0 thread-per-row: flat nnz
                        stream, dynamic balance (csr.c:286-293,
                        cuda_csr.cu:19-31)
 xla-ell-rm             CUDA HLL k0 thread-per-row row-major
                        (cuda_hll.cu:19-43)
 xla-ell-cm             CUDA HLL k1 thread-per-row col-major, the
                        coalesced/lane-contiguous layout
                        (cuda_hll.cu:49-72)
 xla-dense              tiny-matrix regime (launch-bound, SURVEY 6)
 pallas-bcsr            CUDA CSR k3 block-per-row: cooperative dense
                        row-tiles, here 8x128 MXU tiles
                        (cuda_csr.cu:96-140)
 pallas-pell            CUDA HLL k2 warp-per-block + k4 texture-x:
                        panel-local ELL slots, x resident in VMEM
                        (cuda_hll.cu:80-104, cuda_csr.cu:145-178)
 xla-ell-df64           fp64-equivalence via double-float arithmetic
                        (the reference computes natively in fp64)
 pallas-bcsr-spmm       multi-vector SpMM through the MXU (no reference
                        analog; BASELINE.json config 3)
=====================  =====================================================
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

from spmv_scpa_tpu.formats.csr import CSR


@dataclass
class Prepared:
    """A strategy instantiated for one matrix: device-ready closure plus
    bookkeeping for roofline/CSV reporting."""

    strategy: str
    matrix: str
    fn: Callable[[Any], Any]          # fn(x) -> y (jitted+bound or host)
    on_device: bool
    nnz: int
    # Raw traceable fn(x, *args) + the device-array args, for device
    # strategies. Arrays travel as jit ARGUMENTS (baking them in as
    # closure constants re-ships gigabytes per compile); the bench
    # layer embeds raw in an in-jit timing loop (bench/timing.py).
    raw: Callable[..., Any] | None = None
    args: tuple = ()
    # Optional input packer (host x -> device input, e.g. df64 hi/lo
    # stacking) and output post-processor (device out -> np y).
    prep_x: Callable[[Any], Any] | None = None
    post: Callable[[Any], Any] | None = None
    # Bytes the kernel must stream from HBM per call (matrix data only,
    # excluding x/y), for roofline accounting. 0 if unknown.
    hbm_bytes: int = 0
    meta: dict = field(default_factory=dict)


@dataclass(frozen=True)
class StrategySpec:
    name: str
    fmt: str                          # CSR | HLL | BCSR | PELL | DENSE
    backend: str                      # host | xla | pallas
    cite: str                         # reference file:line analog
    prepare: Callable[..., Prepared] = None
    spmm: bool = False                # supports multi-column x
    spmm_only: bool = False           # REQUIRES 2-D (n, cols) input
    tunable: bool = True              # has the chunk tuning axis (the
                                      # warps_per_block analog); False
                                      # = one sweep cell per matrix


_REGISTRY: dict[str, StrategySpec] = {}


def register(spec: StrategySpec) -> StrategySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate strategy {spec.name!r}")
    _REGISTRY[spec.name] = spec
    return spec


def get_strategy(name: str) -> StrategySpec:
    _ensure_builtin()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown strategy {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def list_strategies(backend: str | None = None,
                    fmt: str | None = None) -> list[str]:
    _ensure_builtin()
    return sorted(
        n for n, s in _REGISTRY.items()
        if (backend is None or s.backend == backend)
        and (fmt is None or s.fmt == fmt)
    )


def spmv(A: CSR, x, strategy: str = "auto", **params) -> np.ndarray:
    """One-shot convenience: prepare + run a strategy on (A, x).

    SpMM-only strategies (``spmm_only``, e.g. ``pallas-bcsr-spmm``)
    accept a 1-D x too: it rides column 0 of a (n, cols) block and the
    matching y column is returned, so every ``list_strategies()`` entry
    is drivable through this one entry point.
    """
    auto = strategy == "auto"
    if auto:
        strategy = pick_auto(A)
    spec = get_strategy(strategy)
    x = np.asarray(x)
    squeeze = False
    if spec.spmm_only and x.ndim == 1:
        X = np.zeros((x.shape[0], params.get("cols", 8)), x.dtype)
        X[:, 0] = x
        x, squeeze = X, True
    try:
        prep = spec.prepare(A, **params)
    except ValueError:
        if not auto:
            raise
        # auto fallback chain: pick_auto uses cheap necessary-condition
        # checks (e.g. quick_envelope_ok for pallas-xpose), so prepare
        # may still refuse mid-plan — fall back rather than surface the
        # refusal to a user who asked for "auto" (VERDICT r4 item 7).
        for fb in ("pallas-hybrid", "pallas-pell", "xla-csr-segsum"):
            if fb == strategy:
                continue
            try:
                spec = get_strategy(fb)
                prep = spec.prepare(A, **params)
                break
            except ValueError:
                continue
        else:
            raise
    y = np.asarray(prep.fn(x), dtype=np.float64)
    return y[:, 0] if squeeze else y


def bind(raw, args, prep_x=None, post=None):
    """jit ``raw`` and bind its device-array args → ``fn(x)``."""
    import jax
    jitted = jax.jit(raw)

    def fn(x):
        xin = prep_x(x) if prep_x else x
        out = jitted(xin, *args)
        return post(out) if post else out

    return fn


def pick_auto(A: CSR) -> str:
    """Heuristic strategy choice. On TPU the Pallas paths are the only
    performant ones (XLA gather/scatter lower to near-scalar loops —
    measured ~0.1-0.3 GFLOPS). The lane-ELL hybrid wins whenever the
    matrix has enough diagonal locality for its sliding VMEM window
    (flagship: 151.5 vs 82.9 GF/s; docs/PERF_LOG.md round 3) and the
    resident x fits VMEM; otherwise PELL (column-striped fused path
    for large n, windowed one-hot epilogue for pure scatter). On CPU
    backends XLA segment-sum is fine.

    Tiny-matrix (launch-bound) regime: below ~0.5M dense elements the
    dense matvec beats every sparse path — measured on v5e
    (scripts/tpu_tiny_r4.py, docs/PERF_LOG.md round 4): cage4-ish
    0.76 us dense vs 1.7-9.4 us sparse; mhda416-ish 14.9 GF/s dense
    vs 5.2 best-sparse; by olm1000-ish (1M dense elements) the
    hybrid already wins. Matches the reference's launch-bound rows
    (cuda_best_csr_hll.png, ~0-2 GF/s on cage4/olm1000/west2021).

    Scattered short-row regime (round 5): ``pallas-xpose`` (the
    static-routed transpose) wins when rows are too short to amortize
    the hybrid's lane-slot padding — measured on v5e
    (docs/PERF_LOG.md round 5): webbase archetype (3.1 nnz/row,
    80% local) xpose 6.21 vs hybrid 1.96 GF/s; amazon archetype
    (3.8-4.7 nnz/row, tight locality + hubs) hybrid 6.91 vs xpose
    5.42. Both archetypes sit at locality ~0.82-0.84, so the measured
    discriminator is row length: truly banded (locality ~1) or
    locality >= 0.5 with >= 3 nnz/row -> hybrid (enough work per row
    to amortize lane-slot padding); otherwise xpose when the cheap
    envelope check passes. quick_envelope_ok is a necessary condition
    only — spmv()'s auto path keeps a fallback chain for mid-plan
    rejections."""
    from spmv_scpa_tpu.utils.platform import is_tpu
    if not is_tpu():
        return "xla-csr-segsum"
    if A.m * A.n <= 500_000:
        return "xla-dense"
    if A.nnz:
        # resident-x bound of the hybrid (lane_ell.X_VMEM_BUDGET):
        # ~2.5M padded columns/rows of f32
        g_pad = -(-A.m // 128)
        fits = ((g_pad + 65) * 128 * 4 <= 10 << 20
                and A.n <= (10 << 20) // 4)
        if fits:
            avg = A.nnz / max(A.m, 1)
            d = np.abs(A.ja.astype(np.int64) - A.row_ids())
            loc = float(np.mean(d <= 4096))
            if loc >= 0.98 or (loc >= 0.5 and avg >= 3.0):
                return "pallas-hybrid"
        from spmv_scpa_tpu.ops.xpose_plan import quick_envelope_ok
        if quick_envelope_ok(A):
            return "pallas-xpose"
    return "pallas-pell"


# ---------------------------------------------------------------------------
# Built-in strategy registration (lazy to avoid import cycles)
# ---------------------------------------------------------------------------

_BUILTIN_DONE = False


def _ensure_builtin():
    global _BUILTIN_DONE
    if _BUILTIN_DONE:
        return
    _BUILTIN_DONE = True

    import jax
    import jax.numpy as jnp

    from spmv_scpa_tpu.formats.ell import csr_to_ell
    from spmv_scpa_tpu.ops import xla as xla_ops
    from spmv_scpa_tpu.ops.oracle import spmv_oracle

    def _prep_oracle_csr(A: CSR, **_):
        return Prepared("oracle-csr", A.name, lambda x: spmv_oracle(A, x),
                        on_device=False, nnz=A.nnz,
                        hbm_bytes=A.nnz * 12 + (A.m + 1) * 4)

    def _prep_oracle_ell(A: CSR, slice_h: int = 32, **_):
        E = csr_to_ell(A, slice_h=slice_h, col_major=False, pad_mode="neg1")
        return Prepared("oracle-ell", A.name,
                        lambda x: xla_ops.serial_ell(E, x),
                        on_device=False, nnz=A.nnz,
                        hbm_bytes=E.padded_nnz * 12,
                        meta={"num_blocks": E.num_slices})

    def _prep_xla_segsum(A: CSR, dtype=jnp.float32, **_):
        raw, args = xla_ops.make_csr_segsum(A, dtype)
        return Prepared("xla-csr-segsum", A.name, bind(raw, args),
                        on_device=True, nnz=A.nnz, raw=raw, args=args,
                        hbm_bytes=A.nnz * 12)  # val4 + ja4 + rowid4

    def _prep_xla_ell(A: CSR, col_major: bool, slice_h: int = 32,
                      dtype=jnp.float32, max_padded: int = 1 << 28, **_):
        # uniform ELL pads every row to the global max row length —
        # refuse when that explodes (power-law matrices; the reference
        # HLL study shows the same failure mode, SURVEY.md section 6)
        max_len = int(np.diff(A.irp).max(initial=1))
        ns = -(-A.m // slice_h)
        if ns * slice_h * max(max_len, 1) > max_padded:
            raise ValueError(
                f"uniform ELL padding too large (max row {max_len}); "
                "use CSR/PELL strategies for this matrix")
        E = csr_to_ell(A, slice_h=slice_h, col_major=col_major,
                       pad_mode="last")
        U = E.to_uniform()
        name = "xla-ell-cm" if col_major else "xla-ell-rm"
        raw, args = xla_ops.make_ell_uniform(U, dtype)
        return Prepared(name, A.name, bind(raw, args),
                        on_device=True, nnz=A.nnz, raw=raw, args=args,
                        hbm_bytes=U.ja.size * 8,
                        meta={"num_blocks": E.num_slices,
                              "fill": A.nnz / max(U.ja.size, 1)})

    def _prep_xla_dense(A: CSR, dtype=jnp.float32,
                        max_bytes: int = 512 << 20, **_):
        if A.m * A.n * 4 > max_bytes:
            raise ValueError(
                f"xla-dense: {A.m}x{A.n} dense materialization exceeds "
                f"{max_bytes} B (the tiny-matrix regime only)")
        raw, args = xla_ops.make_dense(A, dtype)
        return Prepared("xla-dense", A.name, bind(raw, args),
                        on_device=True, nnz=A.nnz, raw=raw, args=args,
                        hbm_bytes=A.m * A.n * 4)

    register(StrategySpec("oracle-csr", "CSR", "host",
                          "csr_spmv_serial csr.c:201-216",
                          prepare=_prep_oracle_csr))
    register(StrategySpec("oracle-ell", "HLL", "host",
                          "hll_spmv_serial hll.c:127-150",
                          prepare=_prep_oracle_ell))
    register(StrategySpec("xla-csr-segsum", "CSR", "xla",
                          "csr.c:286-293 + cuda_csr.cu:19-31",
                          prepare=_prep_xla_segsum, spmm=True))
    register(StrategySpec("xla-ell-rm", "HLL", "xla",
                          "cuda_hll.cu:19-43 (row-major)",
                          prepare=lambda A, **kw: _prep_xla_ell(A, False, **kw)))
    register(StrategySpec("xla-ell-cm", "HLL", "xla",
                          "cuda_hll.cu:49-72 (col-major)",
                          prepare=lambda A, **kw: _prep_xla_ell(A, True, **kw)))
    def _prep_xla_ell_df64(A: CSR, slice_h: int = 32,
                           max_padded: int = 1 << 28, **_):
        max_len = int(np.diff(A.irp).max(initial=1))
        if -(-A.m // slice_h) * slice_h * max(max_len, 1) > max_padded:
            raise ValueError(
                f"uniform ELL padding too large (max row {max_len}); "
                "df64 path unavailable for this matrix")
        E = csr_to_ell(A, slice_h=slice_h, col_major=True,
                       pad_mode="last")
        U = E.to_uniform()
        raw, args, prep_x, post = xla_ops.make_ell_df64(U)
        return Prepared("xla-ell-df64", A.name,
                        bind(raw, args, prep_x, post),
                        on_device=True, nnz=A.nnz, raw=raw, args=args,
                        prep_x=prep_x, post=post,
                        hbm_bytes=U.ja.size * 12,
                        meta={"num_blocks": E.num_slices,
                              "rtol": 1e-9,
                              "fill": A.nnz / max(U.ja.size, 1)})

    register(StrategySpec("xla-ell-df64", "HLL", "xla",
                          "fp64-equivalence knob (BASELINE.json; "
                          "reference computes in native fp64, csr.h:12)",
                          prepare=_prep_xla_ell_df64))
    def _prep_xla_segsum_spmm(A: CSR, cols: int = 8, dtype=jnp.float32, **_):
        raw, args = xla_ops.make_csr_segsum_spmm(A, dtype)
        return Prepared("xla-csr-segsum-spmm", A.name, bind(raw, args),
                        on_device=True, nnz=A.nnz, raw=raw, args=args,
                        hbm_bytes=A.nnz * 12)

    register(StrategySpec("xla-csr-segsum-spmm", "CSR", "xla",
                          "multi-vector extension (no reference analog)",
                          prepare=_prep_xla_segsum_spmm, spmm=True,
                          spmm_only=True))
    register(StrategySpec("xla-dense", "DENSE", "xla",
                          "tiny-matrix regime (SURVEY.md section 6)",
                          prepare=_prep_xla_dense))

    def _prep_omp(A: CSR, kind: str, nthreads: int = 0, **_):
        from spmv_scpa_tpu.formats.ell import csr_to_ell
        from spmv_scpa_tpu.ops import native_omp
        if not native_omp.available():
            raise ValueError("native OpenMP library unavailable "
                             "(g++ -fopenmp required; see native/)")
        nblocks = None
        if kind == "guided":
            fn = native_omp.make_csr_omp_guided(A, nthreads)
        elif kind == "nnz":
            fn = native_omp.make_csr_omp_nnz(A, nthreads or 1)
        else:
            E = csr_to_ell(A, slice_h=32, col_major=True,
                           pad_mode="last")
            fn = native_omp.make_ell_omp(E, nthreads)
            nblocks = E.num_slices
        return Prepared(f"omp-csr-{kind}" if kind != "ell" else "omp-ell",
                        A.name, fn, on_device=False, nnz=A.nnz,
                        hbm_bytes=A.nnz * 12,
                        meta={"num_blocks": nblocks,
                              "num_threads": nthreads})

    register(StrategySpec("omp-csr-guided", "CSR", "host",
                          "csr_spmv_omp_guided csr.c:278-298 "
                          "(native/spmv_omp.cpp)",
                          prepare=lambda A, **kw: _prep_omp(A, "guided",
                                                            **kw)))
    register(StrategySpec("omp-csr-nnz", "CSR", "host",
                          "csr_spmv_omp_nnz_balancing csr.c:218-339 "
                          "(native/spmv_omp.cpp)",
                          prepare=lambda A, **kw: _prep_omp(A, "nnz",
                                                            **kw)))
    register(StrategySpec("omp-ell", "HLL", "host",
                          "hll_spmv_omp hll.c:178-211 "
                          "(native/spmv_omp.cpp)",
                          prepare=lambda A, **kw: _prep_omp(A, "ell",
                                                            **kw)))

    # Pallas strategies register themselves on import; tolerate absence
    # (e.g. stripped builds) but not real import errors.
    from spmv_scpa_tpu.ops import pallas_kernels  # noqa: F401
    pallas_kernels.register_all(register, StrategySpec, Prepared)
    from spmv_scpa_tpu.ops import xpose  # noqa: F401
    xpose.register_xpose(register, StrategySpec, Prepared)
    from spmv_scpa_tpu.ops import nearfar  # noqa: F401
    nearfar.register_nearfar(register, StrategySpec, Prepared)

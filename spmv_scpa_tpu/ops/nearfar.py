"""Near/far composition: hybrid band core + XPOSE scattered remainder.

The reference's fastest irregular-matrix kernels (amazon0302 ~37 GF/s)
lean on the GPU texture cache serving BOTH regimes at once: near-
diagonal reads hit L1/tex lines while hub reads hit the tex cache's
LRU set (/root/reference/src/cuda_hll.cu:49-72,
cuda_csr.cu:145-178). TPU has no per-lane cached gather, so this
framework built two separate machines for the two regimes:

* ``pallas-hybrid`` (ops/lane_ell.py) — rows-as-lanes lane-ELL core
  with a sliding VMEM-resident x window: speed-of-light on the
  diagonal band (banded archetype 102-109 GF/s) but forced through
  ext panels / chips tails on every out-of-window entry (amazon:
  ~1/3 of total time in tail + select machinery, docs/PERF_LOG.md
  round 3 decomposition).
* ``pallas-xpose`` (ops/xpose.py) — static-routed transpose SpMV:
  insensitive to scatter (webbase 6.2 GF/s where the hybrid does
  2.0) but pays its fixed S1/S3 transpose-chain cost on EVERY entry,
  so it loses on matrices with a usable band (amazon: 5.4 vs 6.9).

A matrix like the amazon archetype (tight +-300 band PLUS Zipf hubs)
is exactly the cross product: neither machine fits the whole matrix,
but each fits one part perfectly. This module splits A per-entry at a
diagonal window W — ``A = A_near + A_far`` — and runs the hybrid on
the pure band (its planner then sees locality ~1.0: windowed-x core,
no ext stages, no chips tail) and XPOSE on the scattered residual
(hub entries dedup into S1's column-ordered gather). The two y
vectors add elementwise inside one jitted program, so XLA overlaps
the epilogue and the strategy times like any other.

Linearity of SpMV makes the split exact: y = A_near@x + A_far@x in
f32 (one extra rounding per output row vs the fused kernels, well
inside the reference's epsilon=1e-1 gate, utils/validation.py).
"""

from __future__ import annotations

import functools

import numpy as np

from spmv_scpa_tpu.formats.csr import CSR

# Split-window candidates (columns). The hybrid's own loc_w planner
# re-derives the core window from A_near, so W only decides what
# counts as "scattered"; candidates are panel-aligned powers of two
# inside the hybrid's resident-x comfort zone.
W_CANDS = (512, 1024, 2048, 4096)
# Below this the far part cannot pay XPOSE's fixed pipeline cost
# (~25-40 us of S1/S3 steps) faster than the hybrid's own XLA tail
# handles it (~30 ns/entry -> 1 ms at 32k entries; crossover is far
# lower, but below ~8k entries the whole split is pointless).
FAR_MIN = 8192
# Minimum fraction of entries the band must capture for the split to
# beat plain XPOSE (the near core still pays its stream+grid cost).
NEAR_FRAC_MIN = 0.45


def split_by_window(A: CSR, W: int) -> tuple[CSR, CSR]:
    """Exact per-entry split at |col - row| <= W (same (m, n) shape)."""
    rows = A.row_ids().astype(np.int64)
    d = np.abs(A.ja.astype(np.int64) - rows)
    near = d <= W
    far = ~near
    A_near = CSR.from_coo(A.name + "_near", A.m, A.n,
                          rows[near], A.ja[near], A.as_[near])
    A_far = CSR.from_coo(A.name + "_far", A.m, A.n,
                         rows[far], A.ja[far], A.as_[far])
    return A_near, A_far


def choose_window(A: CSR) -> int | None:
    """Smallest candidate window that captures NEAR_FRAC_MIN of the
    entries. None = no usable band (pure scatter: plain XPOSE wins)."""
    rows = A.row_ids().astype(np.int64)
    d = np.abs(A.ja.astype(np.int64) - rows)
    for W in W_CANDS:
        if float(np.mean(d <= W)) >= NEAR_FRAC_MIN:
            return W
    return None


def _delegate(A, to, reason, dtype, interpret, Prepared, hybrid_kw):
    """The matrix has no band/scatter mix worth splitting — run the
    single machine that fits it whole, under this strategy's name
    (the PELL/powerlaw delegation precedent, ops/lane_ell.py tail
    routing), so ``spmv(A, x, "pallas-nearfar")`` always works."""
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_hybrid
    from spmv_scpa_tpu.ops.xpose import prepare_xpose
    if to == "pallas-xpose":
        try:
            p = prepare_xpose(A, dtype=dtype, interpret=interpret)
        except ValueError:
            to = "pallas-hybrid"
    if to == "pallas-hybrid":
        p = prepare_lane_ell_hybrid(
            A, dtype=dtype, interpret=interpret, **hybrid_kw)
    return Prepared(
        "pallas-nearfar", A.name, p.fn, on_device=True, nnz=A.nnz,
        raw=p.raw, args=p.args, hbm_bytes=p.hbm_bytes,
        meta={"delegated": to, "why": reason, **p.meta})


def prepare_nearfar(A: CSR, dtype=None, interpret=None, W: int = 0,
                    Prepared=None, **hybrid_kw):
    """Build the composition; delegates to hybrid/xpose whole-matrix
    when there is no band/scatter mix worth splitting."""
    import jax.numpy as jnp

    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_hybrid
    from spmv_scpa_tpu.ops.registry import Prepared as _P
    from spmv_scpa_tpu.ops.registry import bind
    from spmv_scpa_tpu.ops.xpose import prepare_xpose
    from spmv_scpa_tpu.ops.xpose_plan import quick_envelope_ok
    from spmv_scpa_tpu.utils.platform import is_tpu
    Prepared = Prepared or _P
    dtype = dtype or jnp.float32
    if interpret is None:
        interpret = not is_tpu()

    if not W:
        W = choose_window(A)
        if W is None:
            return _delegate(A, "pallas-xpose", "pure scatter",
                             dtype, interpret, Prepared, hybrid_kw)
    A_near, A_far = split_by_window(A, W)
    if A_far.nnz < FAR_MIN:
        return _delegate(A, "pallas-hybrid", "scattered part too small",
                         dtype, interpret, Prepared, hybrid_kw)
    if not quick_envelope_ok(A_far):
        return _delegate(A, "pallas-hybrid",
                         "scattered part outside the XPOSE envelope",
                         dtype, interpret, Prepared, hybrid_kw)

    p_near = prepare_lane_ell_hybrid(
        A_near, dtype=dtype, interpret=interpret, **hybrid_kw)
    try:
        p_far = prepare_xpose(A_far, dtype=dtype, interpret=interpret)
    except ValueError:
        # quick_envelope_ok is necessary, not sufficient (mid-plan
        # rejection on concentrated (window, block) cells)
        return _delegate(A, "pallas-hybrid", "XPOSE mid-plan rejection",
                         dtype, interpret, Prepared, hybrid_kw)

    near_raw, near_args = p_near.raw, tuple(p_near.args)
    far_raw, far_args = p_far.raw, tuple(p_far.args)
    n1 = len(near_args)

    def raw(x, *a):
        return near_raw(x, *a[:n1]) + far_raw(x, *a[n1:])

    args = near_args + far_args
    return Prepared(
        "pallas-nearfar", A.name, bind(raw, args), on_device=True,
        nnz=A.nnz, raw=raw, args=args,
        hbm_bytes=p_near.hbm_bytes + p_far.hbm_bytes,
        meta={"W": W, "near_nnz": A_near.nnz, "far_nnz": A_far.nnz,
              "near_frac": round(A_near.nnz / max(A.nnz, 1), 4),
              "near": p_near.meta, "far": p_far.meta})


def register_nearfar(register, StrategySpec, Prepared):
    register(StrategySpec(
        "pallas-nearfar", "XPOSE", "pallas",
        "cuda_hll.cu:49-72 + cuda_csr.cu:145-178 (texture cache "
        "serving band hits and hub hits at once) rebuilt as an exact "
        "linear split: lane-ELL hybrid on the |col-row|<=W band, "
        "static-routed transpose on the scattered residual",
        prepare=functools.partial(prepare_nearfar, Prepared=Prepared),
        tunable=False))

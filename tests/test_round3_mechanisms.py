"""Round-3 mechanism tests: windowed panel merge, compacted-PELL
tails, whole-matrix delegation, catch-all dynamic strips, and the
cost-aware ext gate.

Reference analog: none (these are TPU-native mechanisms); the
correctness bar is the fp64 oracle, as everywhere (SURVEY §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmv_scpa_tpu import testing as synth
from spmv_scpa_tpu.ops import chips_tail as CT
from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_hybrid
from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.utils.validation import validate_result
from spmv_scpa_tpu.utils.vector import make_x


def _run(A, **kw):
    prep = prepare_lane_ell_hybrid(A, interpret=True, **kw)
    x = make_x(A.n)
    y = np.asarray(jax.jit(prep.raw)(jnp.asarray(x, jnp.float32),
                                     *prep.args), np.float64)
    validate_result(spmv_oracle(A, x), y, what=prep.meta)
    return prep


def test_windowed_merge_matches_scatter():
    """merge_tables_windowed + make_merge_apply_windowed reproduce the
    scalar scatter exactly (sorted heavy ids, random values)."""
    rng = np.random.default_rng(3)
    for m, nh in [(5000, 700), (1290, 1), (128 * 9, 300)]:
        hid = np.sort(rng.choice(m, nh, replace=False)).astype(np.int64)
        ys = rng.normal(size=nh).astype(np.float32)
        g_pad = -(-m // 128)
        land, margs, used, _ = CT.make_landing(hid, m, g_pad,
                                               jnp.float32, True)
        assert used, "sorted ids must take the windowed merge"
        out = np.asarray(land(jnp.zeros((m,), jnp.float32),
                              jnp.asarray(ys),
                              jnp.asarray(hid, jnp.int32), *margs))
        ref = np.zeros(m, np.float32)
        ref[hid] += ys
        np.testing.assert_array_equal(out, ref)


def test_windowed_merge_refuses_unsorted():
    hid = np.array([5, 3, 900], np.int64)     # not ascending
    assert CT.merge_tables_windowed(hid, 1000, 8) is None


def test_compact_pell_tail_on_huge_scatter_tail():
    """> BIG_TAIL scattered tails route to the compacted-row PELL
    delegation and still validate (webbase archetype)."""
    A = synth.webbase_csr(m=200_000, seed=7)
    p = _run(A)
    assert p.meta["tail_kind"] == "compact-pallas-pell"
    assert p.meta["tail_nnz"] > 131072


def test_no_locality_delegates_whole_matrix():
    """d_cov < 0.4 at the widest window sends the WHOLE matrix to
    pallas-pell's own auto tuning (powerlaw archetype: measured 12.5
    vs 8.4 GF/s through the split)."""
    A = synth.powerlaw_csr(30_000, 30_000, avg_nnz=8, seed=5)
    p = _run(A)
    assert p.meta.get("delegated") == "pallas-pell"
    assert p.meta["d_cov"] < 0.4


def test_catchall_planes_go_dynamic_on_scatter():
    """Scattered-local matrices turn catch-all overflow planes into
    per-step dynamic planes (strip ids as SMEM data) instead of full
    strip-decode chains; primaries stay static."""
    A = synth.webbase_csr(m=120_000, seed=7)
    p = _run(A)
    if p.meta["ov_slots"]:
        assert p.meta["dyn_planes"] > 0
        assert p.meta["dyn_k"] <= 4
    # banded control: no dynamic planes
    B = synth.banded_csr(4000, row_nnz=9, bandwidth=48, runs=3, seed=1)
    q = _run(B)
    assert q.meta["dyn_planes"] == 0


def test_primary_dyn_strips_flag_still_works():
    """dyn_strips=True (the measured-refuted primary-plane mode) stays
    available as an explicit tuning flag and VALIDATES; whether planes
    actually engage is the cost model's call (the acceptance pass may
    revert demotion at small scale). strip_cov=None disables demotion
    entirely -> engagement via webbase's catch-alls is covered by
    test_catchall_planes_go_dynamic_on_scatter."""
    A = synth.amazon_csr(m=30_000, seed=6)
    p = _run(A, dyn_strips=True, max_strips=1, dyn_k=2)
    assert p.meta["dyn_planes"] >= 0   # correctness is the assert


def test_ext_cost_gate_keeps_amazon():
    """The ext auto gate keeps ext where stage-2 VPU work beats the
    tail rate (amazon regime). The drop side of the gate (webbase at
    full scale: 550 vs 250 MB-equiv) is measured on chip — the gate is
    G_pad-dependent, so it engages only at production sizes
    (docs/PERF_LOG.md round 3)."""
    Aa = synth.amazon_csr(m=60_000, seed=6)
    pa = prepare_lane_ell_hybrid(Aa, interpret=True)
    assert pa.meta["ext"] is True


def test_pell_auto_chunk_scattered():
    """auto_pell_params raises chunk to 256 for scattered buckets and
    128 for dense ones (measured: 12.5 vs 10.0 GF/s on powerlaw)."""
    from spmv_scpa_tpu.ops.pallas_kernels import auto_pell_params
    A = synth.powerlaw_csr(20_000, 20_000, avg_nnz=8, seed=5)
    auto = auto_pell_params(A)
    assert auto["chunk"] == 256 and auto["row_sort"]
    B = synth.banded_csr(8000, row_nnz=64, bandwidth=300, seed=2)
    autob = auto_pell_params(B)
    assert autob["chunk"] == 128

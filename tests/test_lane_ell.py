"""Lane-ELL hybrid (pallas-hybrid) unit tests: the rows-as-lanes
kernel with local-window/hub split — the TPU analog of the reference's
winning coalesced HLL kernel (cuda_hll.cu:49-72) plus the SURVEY §7
"hard part 3" hybrid format. Runs in interpret mode on CPU."""

import numpy as np
import pytest

from spmv_scpa_tpu import testing as synth
from spmv_scpa_tpu.formats.csr import CSR
from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_hybrid
from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.utils.validation import validate_result
from spmv_scpa_tpu.utils.vector import make_x


def _run(A, **kw):
    prep = prepare_lane_ell_hybrid(A, interpret=True, **kw)
    x = make_x(A.n)
    got = np.asarray(prep.fn(x), dtype=np.float64)
    validate_result(spmv_oracle(A, x), got,
                    what=f"pallas-hybrid on {A.name} {kw}")
    return prep


def test_banded_no_tail():
    p = _run(synth.banded_csr(2000, row_nnz=16, seed=1))
    assert p.meta["tail_nnz"] == 0
    assert p.meta["hot_k"] == 0


def test_stencil_relocation_resolves_demotions():
    """Strip demotion must not create an external tail on a banded
    stencil: relocation + overflow planes absorb the jitter strips."""
    A = synth.stencil_csr(4000, points=6, run_len=8, bandwidth=300,
                          seed=2)
    p = _run(A, slots=80, chunk=24)
    assert p.meta["demoted"] > 0            # demotion engaged
    assert p.meta["relocated"] > 0.7 * p.meta["demoted"]
    assert p.meta["tail_nnz"] <= 0.01 * A.nnz


def test_strip_cov_disabled_keeps_all_strips():
    A = synth.stencil_csr(2000, points=6, run_len=8, bandwidth=300,
                          seed=2)
    p = _run(A, strip_cov=None)
    assert p.meta["demoted"] == 0
    assert p.meta["ov_slots"] == 0


def test_hub_split_engages_on_powerlaw_locality():
    """amazon archetype: local band + Zipf hubs -> an out-of-window
    mechanism engages (hub split, SURVEY section 7): either the ext
    gather pipeline (preferred — per-group panels, ops/ext_gather.py)
    or the top-k hot region it supersedes."""
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    p = _run(A)
    assert p.meta["ext"] or p.meta["hot_k"] > 0
    if p.meta["ext"]:
        assert p.meta["ext_groups"] > 0 and p.meta["ext_cov"] > 0.5
        assert p.meta["hot_k"] == 0          # superseded
    else:
        assert p.meta["hot_strips"] == p.meta["hot_k"] // 128


def test_ext_disabled_falls_back_to_hot():
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    p = _run(A, ext=False)
    assert not p.meta["ext"] and p.meta["hot_k"] > 0


def test_tiny_tail_uses_xla_compact():
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    p = _run(A)
    if p.meta["tail_nnz"]:
        # chips takes over at >= 2048 entries; below that the compact
        # XLA segment-sum is the cheap fixed-cost path
        assert p.meta["tail_kind"] == (
            "chips" if p.meta["tail_nnz"] >= 2048 else "xla-compact")


def test_large_tail_uses_pallas_strategy():
    """Big tails prefer chips; with chips diag-disabled they fall back
    to the registered pallas-pell strategy."""
    A = synth.powerlaw_csr(8000, avg_nnz=30, seed=5)
    p = _run(A, tail_xla_max=100)
    if p.meta["tail_nnz"] > 2048:
        assert p.meta["tail_kind"] == "chips"
    p2 = prepare_lane_ell_hybrid(A, interpret=True, tail_xla_max=100,
                                 diag="nochips")
    if p2.meta["tail_nnz"] > 100:
        # big scatter tails run PELL in the compacted row space with
        # the panel-merge landing (round 3)
        assert p2.meta["tail_kind"] == "compact-pallas-pell"


def test_recursive_tail_on_local_residual():
    """tail_strategy='auto' recurses into the hybrid when the big tail
    is itself diagonally local; the recursion terminates (max_depth)
    and the summed y still validates."""
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    # nochips forces past the chips tail so the recursion branch is
    # actually exercised (the recalibrated Q model otherwise leaves a
    # chips-sized tail on this input)
    p = _run(A, tail_strategy="auto", tail_xla_max=1000,
             diag="nochips")
    if p.meta["tail_nnz"] > 1000:
        assert p.meta["tail_kind"].startswith("hybrid-r")
        assert p.meta["tail_meta"] is not None


def test_recursion_depth_bounded():
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    p = _run(A, tail_strategy="auto", tail_xla_max=100, max_depth=1)
    tm = p.meta.get("tail_meta")
    if tm is not None:                  # level-1 tail exists
        # at max_depth the level-1 tail must NOT be another hybrid
        # recursion: its meta either lacks tail_kind entirely (pell /
        # chips sub-preps) or names a terminal kind
        assert tm.get("tail_kind", "terminal") in (
            None, "terminal", "xla-compact", "pallas-pell",
            "compact-pallas-pell", "chips")


def test_ded_bytes_cap_limits_overflow_planes():
    """The dedicated-plane bytes budget caps total overflow planes:
    with ded_bytes=0 no strip-dedicated planes are built (only the
    catch-all tier), so ov_slots stays <= ov_max."""
    A = synth.amazon_csr(m=20000, avg_nnz=4.7, seed=4)
    p0 = _run(A, ded_bytes=0)
    assert p0.meta["ov_slots"] <= 8     # catch-all tier only (ov_max)
    p1 = _run(A)                        # default budget
    assert p1.meta["ov_slots"] >= p0.meta["ov_slots"]


def test_explicit_slots_and_chunk():
    A = synth.banded_csr(1500, row_nnz=20, bandwidth=200, seed=6)
    for slots, chunk in [(8, 16), (24, 8), (32, 64)]:
        _run(A, slots=slots, chunk=chunk)


def test_empty_and_degenerate():
    dense = np.zeros((10, 7))
    dense[2, 3] = 4.0
    dense[9, 0] = -1.0
    _run(CSR.from_dense("sparse10", dense))
    _run(synth.diag_csr(300))


def test_vmem_budget_guard():
    """A matrix whose resident x exceeds the VMEM budget must refuse
    with a clear error instead of a Mosaic compile failure."""
    rows = np.arange(0, 4_000_000, 1000, dtype=np.int64)
    A = CSR.from_coo("huge_n", 4_000_000, 4_000_000, rows, rows,
                     np.ones(rows.size))
    with pytest.raises(ValueError, match="VMEM"):
        prepare_lane_ell_hybrid(A, interpret=True)


# ---- chips tail (ops/chips_tail.py) --------------------------------

def test_chips_tail_engages_on_forced_spill():
    """Long-row spill rides the chips tail (two-stage gather + MXU
    one-hot reduction) instead of the scalar XLA compact path."""
    A = synth.powerlaw_csr(8000, avg_nnz=30, seed=5)
    p = _run(A, slots=4, tail_xla_max=100)
    assert p.meta["tail_kind"] == "chips"
    tm = p.meta["tail_meta"]
    assert tm["heavy_rows"] > 0 and tm["hot_h"] > 0


def test_chips_disabled_by_diag_falls_back():
    A = synth.powerlaw_csr(8000, avg_nnz=30, seed=5)
    p = prepare_lane_ell_hybrid(A, interpret=True, slots=4,
                                tail_xla_max=100, diag="nochips")
    assert p.meta["tail_kind"] != "chips"


def test_chips_standalone_strategy():
    """pallas-chips: the whole matrix as cooperative chips (CUDA k3
    block-per-row analog, cuda_csr.cu:96-140)."""
    from spmv_scpa_tpu.ops.chips_tail import prepare_chips_strategy
    for A in (synth.powerlaw_csr(3000, avg_nnz=20, seed=7),
              synth.banded_csr(500, row_nnz=9, bandwidth=64, seed=8),
              synth.amazon_csr(m=5000, seed=9)):
        prep = prepare_chips_strategy(A, interpret=True)
        x = make_x(A.n)
        got = np.asarray(prep.fn(x), dtype=np.float64)
        validate_result(spmv_oracle(A, x), got,
                        what=f"pallas-chips on {A.name}")


def test_chips_strategy_registered():
    from spmv_scpa_tpu.ops.registry import list_strategies
    assert "pallas-chips" in list_strategies()


def test_chips_single_row_and_column_edge():
    """One mega-row (all entries in row 0) exercises single heavy
    block + multi-quanta windows."""
    rng = np.random.default_rng(3)
    n = 4000
    cols = np.unique(rng.integers(0, n, 600))
    rows = np.zeros(cols.size, np.int64)
    vals = rng.standard_normal(cols.size)
    A = CSR.from_coo("megarow", 16, n, rows, cols, vals)
    from spmv_scpa_tpu.ops.chips_tail import prepare_chips_strategy
    prep = prepare_chips_strategy(A, interpret=True)
    x = make_x(A.n)
    got = np.asarray(prep.fn(x), dtype=np.float64)
    validate_result(spmv_oracle(A, x), got, what="pallas-chips megarow")


def test_chips_split_mode_validates():
    """Split plan (local windowed + far resident gathers): forced via
    plan_chips_split directly, validated against the oracle."""
    import jax.numpy as jnp
    from spmv_scpa_tpu.ops import chips_tail
    A = synth.webbase_csr(m=30000)
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    plan = chips_tail.plan_chips_split(
        rows, cols, A.as_.astype(np.float32), A.m, A.n)
    assert plan is not None
    # small n fits the direct-x cap -> the round-4 windowed-x local
    # stream (both kinds covered by test_round3_mechanisms)
    assert plan.loc is not None and plan.loc.kind == "windowed-x"
    c_raw, c_args, _ = chips_tail.prepare_chips(
        plan, A.n, jnp.float32, True)
    x = make_x(A.n)
    ys, hid = c_raw(jnp.asarray(x, jnp.float32), *c_args)
    y = np.zeros(A.m)
    y[np.asarray(hid)] = np.asarray(ys)
    validate_result(spmv_oracle(A, x), y, what="chips-split webbase30k")


def test_chips_split_migration_consistency():
    """Entries whose window overflows migrate to the far stream; the
    result must still be exact (tiny r_hot forces heavy migration)."""
    import jax.numpy as jnp
    from spmv_scpa_tpu.ops import chips_tail
    A = synth.webbase_csr(m=20000)
    rows = A.row_ids().astype(np.int64)
    cols = A.ja.astype(np.int64)
    plan = chips_tail.plan_chips_split(
        rows, cols, A.as_.astype(np.float32), A.m, A.n, r_hot=16)
    assert plan is not None and plan.far is not None
    assert plan.far.n_entries > int(np.sum(np.abs(cols - rows) > 4096))
    c_raw, c_args, _ = chips_tail.prepare_chips(
        plan, A.n, jnp.float32, True)
    x = make_x(A.n)
    ys, hid = c_raw(jnp.asarray(x, jnp.float32), *c_args)
    y = np.zeros(A.m)
    y[np.asarray(hid)] = np.asarray(ys)
    validate_result(spmv_oracle(A, x), y, what="chips-split r_hot=16")


def test_ext_windowed_stage2_e2e():
    """Out-of-window entries at diagonal+8000 over a big-enough matrix
    push the hot region past H_WIN_MIN; the planner adopts the
    windowed stage-2 and the full hybrid still matches the oracle."""
    rng = np.random.default_rng(9)
    m = n = 40000
    r_loc = np.repeat(np.arange(m, dtype=np.int64), 4)
    c_loc = (r_loc + rng.integers(-30, 30, r_loc.size)) % n
    r_out = np.arange(m, dtype=np.int64)
    c_out = (r_out + 8000 + rng.integers(0, 64, m)) % n
    rows = np.concatenate([r_loc, r_out])
    cols = np.concatenate([c_loc, c_out])
    vals = rng.standard_normal(rows.size)
    A = CSR.from_coo("ext_windowed", m, n, rows, cols, vals)
    p = _run(A)
    assert p.meta["ext"]
    assert p.meta["ext_windowed"]
    assert p.meta["ext_r_hot"] >= 8
    assert p.meta["tail_nnz"] <= 0.08 * A.nnz


def test_panel_merge_zero_scatter():
    """The chips tail's final scalar scatter is replaced by a ranked
    gather into dense y panels; unset lanes read the guaranteed-zero
    pad slot. Validate both the standalone landing step and the
    hybrid."""
    import jax.numpy as jnp
    from spmv_scpa_tpu.ops import chips_tail
    rng = np.random.default_rng(17)
    NH, m = 37, 1000
    heavy = np.sort(rng.choice(m, NH, replace=False)).astype(np.int64)
    ys = rng.standard_normal(NH).astype(np.float32)
    land, margs, use_merge, extra = chips_tail.make_landing(
        heavy, m, -(-m // 128), jnp.float32, True)
    assert use_merge and extra > 0
    got = np.asarray(land(jnp.zeros(m, jnp.float32), jnp.asarray(ys),
                          None, *margs))
    want = np.zeros(m, np.float32)
    want[heavy] = ys
    np.testing.assert_allclose(got, want, rtol=0)

    # hybrid end-to-end with a chips tail reports panel_merge
    A = synth.amazon_csr(m=6000, seed=30)
    p = _run(A, slots=4)
    assert p.meta["tail_kind"] == "chips"
    assert p.meta["tail_meta"]["panel_merge"]


# ---------------------------------------------------------------------------
# pallas-hybrid-df64: fp64-grade rows-as-lanes (Dekker TwoProd + TwoSum)
# ---------------------------------------------------------------------------

def _rel_err(gold, got):
    return float(np.linalg.norm(gold - got)
                 / max(np.linalg.norm(gold), 1e-300))


def test_df64_hybrid_accuracy_wide_exponents():
    """rel <= 1e-9 vs the fp64 oracle on values spanning 12 decades —
    the regime where plain f32 (rel ~1e-7) fails the gate (same bar as
    pallas-pell-df64, test_kernels.py)."""
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_df64
    rng = np.random.default_rng(5)
    A = synth.banded_csr(3000, row_nnz=24, bandwidth=256, seed=5)
    A.as_ = A.as_ * 10.0 ** rng.uniform(-6, 6, A.nnz)
    x = make_x(A.n) * 10.0 ** rng.uniform(-3, 3, A.n)
    gold = spmv_oracle(A, x)
    prep = prepare_lane_ell_df64(A, interpret=True)
    got = np.asarray(prep.fn(x), dtype=np.float64)
    assert _rel_err(gold, got) <= 1e-9
    # the f32 hybrid is (correctly) orders of magnitude worse here
    f32 = np.asarray(prepare_lane_ell_hybrid(A, interpret=True).fn(x),
                     dtype=np.float64)
    assert _rel_err(gold, f32) > 10 * _rel_err(gold, got)


def test_df64_hybrid_stencil_and_registry():
    from spmv_scpa_tpu.ops.registry import get_strategy
    A = synth.stencil_csr(2000, points=6, run_len=8, bandwidth=300,
                          seed=6)
    x = make_x(A.n)
    prep = get_strategy("pallas-hybrid-df64").prepare(A, interpret=True)
    got = np.asarray(prep.fn(x), dtype=np.float64)
    assert _rel_err(spmv_oracle(A, x), got) <= 1e-9
    assert prep.meta["slots"] <= 128 and prep.meta["fill"] > 0


def test_df64_hybrid_rejects_out_of_window():
    """Scattered matrices have no df64 tail: must raise, pointing at
    pallas-pell-df64."""
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_df64
    A = synth.powerlaw_csr(4000, 4000, seed=7)
    with pytest.raises(ValueError, match="pell-df64"):
        prepare_lane_ell_df64(A, interpret=True, loc_w=128)


def test_df64_hybrid_rejects_mega_row():
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_df64
    r = np.zeros(200, np.int64)
    c = np.arange(200, dtype=np.int64)
    A = CSR.from_coo("megarow", 256, 256, r, c, np.ones(200))
    with pytest.raises(ValueError, match="128 slot"):
        prepare_lane_ell_df64(A, interpret=True)


def test_df64_hybrid_empty_and_tiny():
    from spmv_scpa_tpu.ops.lane_ell import prepare_lane_ell_df64
    A = CSR.from_coo("empty", 64, 64, np.zeros(0, np.int64),
                     np.zeros(0, np.int64), np.zeros(0))
    x = make_x(A.n)
    got = np.asarray(prepare_lane_ell_df64(A, interpret=True).fn(x),
                     dtype=np.float64)
    assert np.all(got == 0.0)
    B = synth.banded_csr(16, row_nnz=3, bandwidth=4, seed=8)
    xb = make_x(B.n)
    gotb = np.asarray(prepare_lane_ell_df64(B, interpret=True).fn(xb),
                      dtype=np.float64)
    assert _rel_err(spmv_oracle(B, xb), gotb) <= 1e-9


def test_pow2_bound_exact_powers():
    """pow2_bound must return EXACT f32 powers of two strictly above v
    with one guard bit — the property jnp.exp2 violates (XLA lowers
    exp2 to a polynomial; measured exp2(33.0) != 2^33), which broke
    the df64 digit grid."""
    import jax
    from spmv_scpa_tpu.ops.lane_ell import pow2_bound
    f = jax.jit(pow2_bound)
    for v in [1e-30, 1e-8, 0.3, 1.0, 1.5, 3.0, 2.0**33 * 0.9,
              2.0**33, 1e12, 3.7e18]:
        E = float(f(np.float32(v)))
        m, e = np.frexp(np.float32(E))
        assert m == 0.5, f"E={E} for v={v} is not a power of two"
        assert E > v, f"E={E} not strictly above v={v}"
        if v >= 2.0 ** -60:       # below the clamp, E pins at 2^-60
            assert E <= 4.0 * v, f"E={E} overshoots v={v} beyond guard"
    # the min_exp clamp keeps E*2^-56 normal for absurdly tiny inputs
    assert float(f(np.float32(1e-38))) >= 2.0 ** -60


# ---------------------------------------------------------------------------
# idx8: int8 index planes for <=2-strip planes (slot bytes 6 -> 5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mk, cuts", [
    (lambda: synth.banded_csr(3000, row_nnz=16, seed=1), True),
    (lambda: synth.stencil_csr(5000, points=6, run_len=8,
                               bandwidth=300, seed=2), True),
    # scattered cases: whether any plane qualifies depends on the
    # cost-aware demotion outcome — idx8 must stay CORRECT either way
    (lambda: synth.amazon_csr(20_000, seed=11), False),
    (lambda: synth.powerlaw_csr(4000, 4000, seed=7), False),
])
def test_idx8_matches_oracle_and_cuts_bytes(mk, cuts):
    """idx8=True reorders planes so <=2-strip ones ride an int8 idx
    stream (bit 7 = strip position, bits 0-6 = lane); must validate
    vs the oracle, and reduce hbm_bytes where the structure
    guarantees <=2-strip planes exist."""
    A = mk()
    x = make_x(A.n)
    p8 = prepare_lane_ell_hybrid(A, interpret=True, idx8=True)
    validate_result(spmv_oracle(A, x), np.asarray(p8.fn(x)),
                    what=f"idx8 {A.name}")
    p16 = prepare_lane_ell_hybrid(A, interpret=True)
    if cuts:
        assert p8.meta["idx8_planes"] > 0
    if p8.meta["idx8_planes"] > 0:
        assert p8.hbm_bytes < p16.hbm_bytes


def test_idx8_all_planes_int8():
    """Every plane <=2 strips by construction (two diagonals): the
    int16 idx stream disappears entirely (n8 == QT)."""
    m = 1500
    r = np.repeat(np.arange(m, dtype=np.int64), 2)
    c = np.minimum(r + np.tile([0, 1], m), m - 1)
    A = CSR.from_coo("twodiag", m, m, r, c,
                     np.random.default_rng(3).standard_normal(2 * m))
    p = prepare_lane_ell_hybrid(A, interpret=True, idx8=True)
    QT = p.meta["slots"] + p.meta["ov_slots"]
    x = make_x(A.n)
    validate_result(spmv_oracle(A, x), np.asarray(p.fn(x)),
                    what="idx8 all-int8")
    assert p.meta["idx8_planes"] == QT


def test_ext_non_8_aligned_chunk():
    """chunks that aren't multiples of 8 give a non-8-aligned G_pad;
    the resident ranked gather pads its output groups to 8 and slices
    back (regression: this used to trip the alignment assert instead
    of taking the documented fallback)."""
    A = synth.amazon_csr(19500, seed=11)
    x = make_x(A.n)
    for chunk, kw in [(4, {}), (12, {"idx8": True})]:
        p = prepare_lane_ell_hybrid(A, interpret=True, chunk=chunk,
                                    **kw)
        assert p.meta["ext"]
        validate_result(spmv_oracle(A, x), np.asarray(p.fn(x)),
                        what=f"ext chunk={chunk} {kw}")

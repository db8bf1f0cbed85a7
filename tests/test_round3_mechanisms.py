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


@pytest.mark.parametrize("x_direct", [True, False])
def test_split_chips_local_stream_modes(x_direct):
    """Both local-stream gather sources — direct-x (round 4) and the
    dedup'd hot region (round 3) — reproduce the fp64 oracle on a
    scattered tail with near-diagonal locality + far hubs."""
    rng = np.random.default_rng(5)
    m = n = 40_000
    # heavy rows with a diagonal band (local) and a few hub cols (far)
    rows_l, cols_l = [], []
    for r in range(0, m, 37):
        k = int(rng.integers(20, 90))
        band = rng.integers(max(0, r - 3000), min(n, r + 3000), k)
        hubs = rng.integers(0, n, 4)
        c = np.unique(np.concatenate([band, hubs]))
        rows_l.extend([r] * c.size)
        cols_l.extend(c.tolist())
    rows = np.asarray(rows_l, np.int64)
    cols = np.asarray(cols_l, np.int64)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    plan = CT.plan_chips_split(rows, cols, vals, m, n,
                               x_direct=x_direct)
    assert plan is not None
    assert plan.loc is not None
    assert plan.loc.kind == ("windowed-x" if x_direct else "windowed")
    raw, args, _ = CT.prepare_chips(plan, n, jnp.float32, True)
    x = make_x(n)
    ys, hid = raw(jnp.asarray(x, jnp.float32), *args)
    got = np.zeros(m, np.float64)
    np.add.at(got, np.asarray(hid), np.asarray(ys, np.float64))
    want = np.zeros(m, np.float64)
    np.add.at(want, rows, vals.astype(np.float64) * x[cols])
    err = np.linalg.norm(got - want)
    assert err <= 1e-3 * max(1.0, np.linalg.norm(want)), err


def test_split_chips_popularity_cold_stream(monkeypatch):
    """When the far stream's dedup'd columns bust the resident cap, the
    planner splits by column popularity (Zipf hubs dedup hard; the cold
    once-referenced tail affords a taller region) — round-4 mechanism
    for whole-matrix webbase-class plans. Forced here by shrinking
    H_CAP so the unsplit far stream cannot fit."""
    rng = np.random.default_rng(7)
    m = n = 30_000
    # popular hub pool: 2000 distinct columns, each referenced many
    # times (hot stream dedups them into a small region); cold: uniform
    # once-referenced scatter (few entries, taller region)
    pool = rng.choice(n, 1000, replace=False)
    rows_l, cols_l = [], []
    for r in range(0, m, 11):
        k = int(rng.integers(2, 6))
        band = rng.integers(max(0, r - 1000), min(n, r + 1000), k)
        hub = np.where(rng.random(4) < 0.75,
                       pool[rng.integers(0, pool.size, 4)],
                       rng.integers(0, n, 4))
        c = np.unique(np.concatenate([band, hub]))
        rows_l.extend([r] * c.size)
        cols_l.extend(c.tolist())
    rows = np.asarray(rows_l, np.int64)
    cols = np.asarray(cols_l, np.int64)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    far_uniq = np.unique(cols[np.abs(cols - rows) > CT.W_LOC])
    cap = max(8, -(-int(far_uniq.size) // 128) - 3)
    monkeypatch.setattr(CT, "H_CAP", cap)
    # r_hot=512: no loc-overflow migration, so the far set (and the
    # cap computed above from it) is exactly the |col-row| > W_LOC set
    plan = CT.plan_chips_split(rows, cols, vals, m, n, r_hot=512)
    assert plan is not None and plan.cold is not None
    assert plan.far.kind == plan.cold.kind == "resident"
    assert plan.far.H <= cap and plan.cold.H <= cap
    raw, args, _ = CT.prepare_chips(plan, n, jnp.float32, True)
    x = make_x(n)
    ys, hid = raw(jnp.asarray(x, jnp.float32), *args)
    got = np.zeros(m, np.float64)
    np.add.at(got, np.asarray(hid), np.asarray(ys, np.float64))
    want = np.zeros(m, np.float64)
    np.add.at(want, rows, vals.astype(np.float64) * x[cols])
    err = np.linalg.norm(got - want)
    assert err <= 1e-3 * max(1.0, np.linalg.norm(want)), err


def test_pad_split_plan_spmd_unification():
    """Round-4 SPMD unification of SPLIT plans: two shard-like entry
    sets with different structure (one has hub+cold entries, one is
    band-only) plan with forced decisions, pad to one shape template,
    and shard B's padded tables run through shard A's program (the
    shard_map contract: one program, per-shard data)."""
    rng = np.random.default_rng(11)
    n = 40_000
    shards = []
    for si, (hub_frac, m_rows) in enumerate(((0.3, 20_000),
                                             (0.0, 12_000))):
        rows_l, cols_l = [], []
        pool = rng.integers(0, n, 300)
        for r in range(0, m_rows, 17):
            k = int(rng.integers(3, 40))
            band = rng.integers(max(0, r - 2000), min(n, r + 2000), k)
            c = band
            if hub_frac and rng.random() < 0.8:
                hubs = np.concatenate(
                    [pool[rng.integers(0, pool.size, 3)],
                     rng.integers(0, n, 2)])       # popular + cold
                c = np.concatenate([band, hubs])
            c = np.unique(c)
            rows_l.extend([r] * c.size)
            cols_l.extend(c.tolist())
        rows = np.asarray(rows_l, np.int64)
        cols = np.asarray(cols_l, np.int64)
        vals = rng.standard_normal(rows.size).astype(np.float32)
        shards.append((rows, cols, vals, m_rows))

    force = dict(x_direct=True, r_hot=64, r_far=512, r_cold=512,
                 pop_k=128, force_streams=("loc", "far", "cold"))
    plans = [CT.plan_chips_split(r, c, v, m, n, **force)
             for r, c, v, m in shards]
    assert all(p is not None for p in plans)
    assert plans[1].far.n_entries == 0 or plans[0].far.n_entries > 0
    tpl = CT.split_shape_template(plans)
    padded = []
    for p, (rows, c, v, m_rows) in zip(plans, shards):
        pool_ids = np.setdiff1d(np.arange(m_rows, dtype=np.int64),
                                p.heavy_ids)
        padded.append(CT.pad_split_plan(p, tpl, pool_ids))

    raw_a, args_a, _ = CT.prepare_chips(padded[0], n, jnp.float32,
                                        True)
    x = make_x(n)
    for p, (rows, cols, vals, m_rows), pad in zip(
            plans, shards, padded):
        # shard's own padded tables through SHARD A's program
        _, args, _ = CT.prepare_chips(pad, n, jnp.float32, True)
        for a, b in zip(args_a, args):
            assert a.shape == b.shape, (a.shape, b.shape)
        ys, hid = raw_a(jnp.asarray(x, jnp.float32), *args)
        got = np.zeros(m_rows, np.float64)
        np.add.at(got, np.asarray(hid), np.asarray(ys, np.float64))
        want = np.zeros(m_rows, np.float64)
        np.add.at(want, rows, vals.astype(np.float64) * x[cols])
        err = np.linalg.norm(got - want)
        assert err <= 1e-3 * max(1.0, np.linalg.norm(want)), err

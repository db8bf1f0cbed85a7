"""Direct unit tests for the two-stage Pallas gather pipeline
(ops/ext_gather.py) — stage-1 sorted-window gather and stage-2 ranked
gather, plus the host planner. These are the building blocks of the
lane-ELL ext panels and the chips tail; here each stage is checked
in isolation against NumPy indexing. Interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_scpa_tpu.formats.panel_ell import BC
from spmv_scpa_tpu.ops import ext_gather


def test_sorted_gather_exact():
    """stage-1: out[c, j] = x[window(p1) , l1] for packed uniques."""
    rng = np.random.default_rng(0)
    n = 3000
    x = rng.standard_normal(n).astype(np.float32)
    n_groups, R = 2, 4
    n1p_blocks = -(-(-(-n // BC)) // R)
    base = np.array([0, n1p_blocks - 1], np.int32)
    p1 = rng.integers(0, R, (n_groups * 8, BC)).astype(np.int32)
    l1 = rng.integers(0, BC, (n_groups * 8, BC)).astype(np.int32)
    call = ext_gather.make_sorted_gather(n_groups, n1p_blocks, R,
                                         jnp.float32, interpret=True)
    x1 = np.zeros(n1p_blocks * R * BC, np.float32)
    x1[:n] = x
    got = np.asarray(call(jnp.asarray(base), jnp.asarray(
        x1.reshape(-1, BC)), jnp.asarray(p1), jnp.asarray(l1)))
    x2 = x1.reshape(-1, BC)
    for g in range(n_groups):
        for c in range(8):
            r = g * 8 + c
            want = x2[base[g] * R + p1[r], l1[r]]
            np.testing.assert_array_equal(got[r], want)


def test_ranked_gather_exact():
    """stage-2: out[c, j] = hot[p2, l2] from the resident region."""
    rng = np.random.default_rng(1)
    H, G_pad = 16, 24
    hot = rng.standard_normal((H, BC)).astype(np.float32)
    p2 = rng.integers(0, H, (G_pad, BC)).astype(np.int32)
    l2 = rng.integers(0, BC, (G_pad, BC)).astype(np.int32)
    call = ext_gather.make_ranked_gather(H, G_pad, jnp.float32,
                                         interpret=True)
    got = np.asarray(call(jnp.asarray(hot), jnp.asarray(p2),
                          jnp.asarray(l2)))
    want = hot[p2, l2]
    np.testing.assert_array_equal(got, want)


def test_plan_ext_covers_and_caps():
    """Planner: every out-entry maps to a kept (group, col) pair unless
    the per-group 128-unique cap drops it; stage tables reproduce x."""
    rng = np.random.default_rng(2)
    m = n = 2000
    n_e = 5000
    rows = np.sort(rng.integers(0, m, n_e))
    cols = rng.integers(0, n, n_e)
    out_mask = np.ones(n_e, bool)
    plan = ext_gather.plan_ext(rows, cols, out_mask, m, n)
    assert plan is not None
    assert 0.0 < plan.covered <= 1.0
    assert plan.ext_lane.shape == (n_e,)
    kept = plan.ext_lane >= 0
    assert float(np.mean(kept)) == pytest.approx(plan.covered)
    # verify: running both stages yields x[col] at each kept entry's
    # (group, lane) slot
    x = rng.standard_normal(n).astype(np.float32)
    n1 = plan.n1p_blocks * plan.R * BC
    x1 = np.zeros(n1, np.float32)
    x1[:n] = x
    s1 = ext_gather.make_sorted_gather(plan.n_groups, plan.n1p_blocks,
                                       plan.R, jnp.float32, True)
    hot = np.asarray(s1(jnp.asarray(plan.base),
                        jnp.asarray(x1.reshape(-1, BC)),
                        jnp.asarray(plan.p1), jnp.asarray(plan.l1)))
    G_pad = int(rows.max() // BC) + 1
    p2, l2 = ext_gather.build_group_tables(plan, G_pad)
    s2 = ext_gather.make_ranked_gather(plan.H, -(-G_pad // 8) * 8,
                                       jnp.float32, True)
    ext = np.asarray(s2(jnp.asarray(hot),
                        jnp.asarray(np.pad(p2, ((0, -(-G_pad // 8) * 8
                                                 - G_pad), (0, 0)))),
                        jnp.asarray(np.pad(l2, ((0, -(-G_pad // 8) * 8
                                                 - G_pad), (0, 0))))))
    ki = np.flatnonzero(kept)
    grp = rows[ki] // BC
    np.testing.assert_allclose(ext[grp, plan.ext_lane[ki]], x[cols[ki]],
                               rtol=0)


def test_plan_ext_empty_and_none():
    assert ext_gather.plan_ext(np.zeros(0, np.int64),
                               np.zeros(0, np.int64),
                               np.zeros(0, bool), 10, 10) is None


def test_plan_ext_windowed():
    """Localized out-columns (one per row at diagonal+8000) make every
    group's hot positions a narrow band: the planner adopts the
    windowed stage-2 (per-group base, O(r_hot) reduce) and the
    window-relative tables still reproduce x at each kept slot."""
    rng = np.random.default_rng(3)
    m = n = 40000
    rows = np.arange(m, dtype=np.int64)
    cols = (rows + 8000 + rng.integers(0, 64, m)) % n
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    plan = ext_gather.plan_ext(rows, cols, np.ones(m, bool), m, n)
    assert plan is not None
    assert plan.H > ext_gather.H_WIN_MIN
    assert plan.windowed and plan.r_hot >= 8
    assert 2 * plan.r_hot <= plan.H
    # window-relative p2 of kept pairs stays in range
    assert plan.base8.size > 0

    x = rng.standard_normal(n).astype(np.float32)
    n1 = plan.n1p_blocks * plan.R * BC
    x1 = np.zeros(n1, np.float32)
    x1[:n] = x
    s1 = ext_gather.make_sorted_gather(plan.n_groups, plan.n1p_blocks,
                                       plan.R, jnp.float32, True)
    hot = np.asarray(s1(jnp.asarray(plan.base),
                        jnp.asarray(x1.reshape(-1, BC)),
                        jnp.asarray(plan.p1), jnp.asarray(plan.l1)))
    G_pad = (-(-(int(rows.max() // BC) + 1) // 8)) * 8
    p2, l2 = ext_gather.build_group_tables(plan, G_pad)
    b8 = ext_gather.build_base8(plan, G_pad)
    # set lanes are window-relative and in range
    ki = np.flatnonzero(plan.ext_lane >= 0)
    grp = rows[ki] // BC
    assert (p2[grp, plan.ext_lane[ki]] >= 0).all()
    assert (p2[grp, plan.ext_lane[ki]] < plan.r_hot).all()
    hp = np.pad(hot, ((0, max(0, plan.H_pad - hot.shape[0])),
                      (0, 0)))[:plan.H_pad]
    s2 = ext_gather.make_resident_window_gather(
        G_pad // 8, plan.r_hot, plan.H_pad, jnp.float32, True)
    ext = np.asarray(s2(jnp.asarray(b8), jnp.asarray(hp),
                        jnp.asarray(p2), jnp.asarray(l2)))
    np.testing.assert_allclose(ext[grp, plan.ext_lane[ki]], x[cols[ki]],
                               rtol=0)
    # most entries survive the p97 window drop
    assert plan.covered > 0.9

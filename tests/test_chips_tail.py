"""Unit tests for the chips-tail SPMD unification layer
(ops/chips_tail.py: pad_resident_plan + _plan_sharded_chips): padded
plans must contribute exactly zero in every padded slot, across
adversarially divergent per-shard shapes (groups / steps / windows /
NH / stage-1 reach)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmv_scpa_tpu.ops import chips_tail as CT
from spmv_scpa_tpu.parallel.distributed import _plan_sharded_chips


class _FakeCore:
    def __init__(self, rows, cols, vals):
        self.trows = np.asarray(rows, np.int64)
        self.tcols = np.asarray(cols, np.int64)
        self.tvals = np.asarray(vals, np.float64)


def _run_plan(plan, n, x):
    """Drive one (possibly padded) plan through the real pipeline +
    landing and return the dense y contribution."""
    raw, args, _ = CT.prepare_chips(plan, n, jnp.float32, True)
    ys, hid = raw(jnp.asarray(x, jnp.float32), *args)
    m = 100_000  # generous row space for the landing
    t = CT.merge_tables(plan.heavy_ids, m, -(-m // 128))
    apply = CT.make_merge_apply(plan.NH, m, -(-m // 128), jnp.float32,
                                True, True)
    y = apply(jnp.zeros((m,), jnp.float32), ys,
              jax.device_put(jnp.asarray(t[0])),
              jax.device_put(jnp.asarray(t[1])))
    return np.asarray(y)


def _oracle(rows, cols, vals, m, x):
    y = np.zeros(m, np.float64)
    np.add.at(y, rows, np.asarray(vals, np.float64) * x[cols])
    return y


@pytest.mark.parametrize("seed", [0, 1])
def test_pad_resident_plan_adversarial_shapes(seed):
    """Two shards with wildly different tails (one huge long-row set
    spanning several windows + one tiny local set) unify to one SPMD
    shape; each padded plan still reproduces its own oracle."""
    rng = np.random.default_rng(seed)
    n = 60_000
    h_rows = 90_000
    # shard A: 5000 entries in 12 heavy rows (multi-window after the
    # 8-rows-per-block, h=256 grouping needs NH >= 8*256 -> force many
    # windows via many heavy rows instead: 3000 rows of 2)
    rows_a = np.repeat(np.arange(3000, dtype=np.int64) * 7 % h_rows, 2)
    order = np.argsort(rows_a, kind="stable")
    rows_a = rows_a[order]
    cols_a = rng.integers(0, n, rows_a.size)
    # CSR order within rows
    vals_a = rng.standard_normal(rows_a.size)
    # shard B: one mega-row + a couple of short ones, tiny col span
    rows_b = np.concatenate([np.zeros(900, np.int64),
                             np.full(3, 17, np.int64)])
    cols_b = np.concatenate([np.sort(rng.choice(2000, 900, False)),
                             np.array([5, 80, 600])]).astype(np.int64)
    vals_b = rng.standard_normal(rows_b.size)

    cores = [_FakeCore(rows_a, cols_a, vals_a),
             _FakeCore(rows_b, cols_b, vals_b),
             _FakeCore([], [], [])]           # zero-tail shard
    plans = _plan_sharded_chips(cores, h_rows, n)
    assert plans is not None
    # unified static shapes
    assert len({(p.R, p.n_groups, p.E8, p.num_windows, p.NH, p.h)
                for p in plans}) == 1

    x = rng.standard_normal(n)
    for core, plan in zip(cores, plans):
        got = _run_plan(plan, n, x)
        want = _oracle(core.trows, core.tcols, core.tvals, 100_000, x)
        err = np.linalg.norm(got - want)
        assert err <= 1e-3 * max(1.0, np.linalg.norm(want)), err


def test_pad_resident_plan_forced_rcap():
    """Shards whose adaptive stage-1 reach differs re-plan at the max
    R; results stay exact."""
    rng = np.random.default_rng(3)
    n = 500_000
    # shard A: tight col cluster (small adaptive R)
    a = _FakeCore(np.repeat([3, 9], 50),
                  np.concatenate([np.sort(rng.choice(900, 50, False)),
                                  np.sort(rng.choice(900, 50, False))]),
                  rng.standard_normal(100))
    # shard B: cols spread over the whole 500k space (large R)
    b = _FakeCore(np.repeat([1, 2, 5], 40),
                  np.concatenate([np.sort(rng.choice(n, 40, False))
                                  for _ in range(3)]),
                  rng.standard_normal(120))
    plans = _plan_sharded_chips([a, b], 4096, n)
    assert plans is not None
    assert plans[0].R == plans[1].R
    x = rng.standard_normal(n)
    for core, plan in zip((a, b), plans):
        got = _run_plan(plan, n, x)
        want = _oracle(core.trows, core.tcols, core.tvals, 100_000, x)
        assert np.linalg.norm(got - want) <= 1e-4 * max(
            1.0, np.linalg.norm(want))


def _mixed_csr(seed):
    """Adversarial structure mix: band + Zipf hubs + mega-rows +
    empty rows + a dense stripe — every packing mechanism at once."""
    from spmv_scpa_tpu.formats.csr import CSR
    rng = np.random.default_rng(seed)
    m = n = int(rng.integers(900, 2600))
    rows, cols = [], []
    for r in range(m):
        k = int(rng.poisson(3))
        if rng.random() < 0.03:
            k = 0                                   # empty row
        elif rng.random() < 0.01:
            k = int(rng.integers(150, 400))         # mega-row
        if not k:
            continue
        local = rng.integers(max(0, r - 60), min(n, r + 60), k // 2 + 1)
        hubs = rng.zipf(1.6, k - k // 2 - 1) % n if k > 1 else []
        c = np.unique(np.concatenate([local, np.asarray(hubs, np.int64),
                                      [r % n]]))
        rows.extend([r] * c.size)
        cols.extend(c.tolist())
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = rng.standard_normal(rows.size)
    irp = np.zeros(m + 1, np.int64)
    np.add.at(irp, rows + 1, 1)
    irp = np.cumsum(irp)
    return CSR(irp=irp, ja=cols.astype(np.int32),
               as_=vals, m=m, n=n, name=f"fuzz{seed}")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_hybrid_fuzz_mixed_structure(seed):
    """Property test: the full hybrid (core + demotion/relocation +
    overflow + ext/chips tails) vs the fp64 oracle on adversarial
    structure mixes, plus the distributed form on a 4-mesh."""
    from spmv_scpa_tpu.ops.oracle import spmv_oracle
    from spmv_scpa_tpu.ops.registry import get_strategy
    from spmv_scpa_tpu.parallel.distributed import (
        make_mesh, prepare_row_sharded_hybrid)
    from spmv_scpa_tpu.utils.validation import validate_result
    from spmv_scpa_tpu.utils.vector import make_x
    A = _mixed_csr(seed)
    x = make_x(A.n)
    gold = spmv_oracle(A, x)
    p = get_strategy("pallas-hybrid").prepare(A, interpret=True)
    validate_result(gold, np.asarray(p.fn(x)), what=f"fuzz{seed}")
    p8 = get_strategy("pallas-hybrid").prepare(A, interpret=True,
                                               idx8=True)
    validate_result(gold, np.asarray(p8.fn(x)), what=f"fuzz{seed}-idx8")

    cpus = jax.devices("cpu")
    d = prepare_row_sharded_hybrid(A, mesh=make_mesh(devices=cpus[:4]),
                                   interpret=True)
    validate_result(gold, np.asarray(d.fn(x)), what=f"fuzz{seed}-dist")

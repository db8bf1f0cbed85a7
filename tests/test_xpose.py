"""XPOSE planner + pipeline tests (ops/xpose_plan.py, ops/xpose.py).

The NumPy simulator IS the kernel spec: plan invariants and
simulator-vs-oracle run in the fast tier; interpret-mode Pallas
parity runs under the slow marker (CPU interpret is heavy).
"""

import numpy as np
import pytest

from spmv_scpa_tpu import testing as synth
from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.ops.xpose_plan import (
    BC, CCAP, edge_color, plan_xpose, simulate_xpose)
from spmv_scpa_tpu.utils.validation import validate_result
from spmv_scpa_tpu.utils.vector import make_x


def _cases():
    return [
        ("rand-1k", synth.random_csr(1000, density=0.004, seed=1)),
        ("banded-2k", synth.banded_csr(2000, row_nnz=9, bandwidth=64,
                                       seed=2)),
        ("rand-8k", synth.random_csr(8000, density=0.0008, seed=3)),
    ]


def test_edge_color_is_proper():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50, 5000)
    b = rng.integers(0, 60, 5000)
    # degree can exceed 100; bump colors to max degree
    deg = max(np.bincount(a).max(), np.bincount(b).max())
    c = edge_color(a, b, int(deg))
    assert (c >= 0).all()
    # proper: no color repeats at any node on either side
    assert np.unique(a * 1000000 + c).size == c.size
    assert np.unique(b * 1000000 + c).size == c.size


@pytest.mark.parametrize("name,A", _cases())
def test_simulator_matches_oracle(name, A):
    p = plan_xpose(A)
    assert p is not None, name
    x = make_x(A.n)
    y = simulate_xpose(p, x.astype(np.float64))
    ref = spmv_oracle(A, x)
    err = np.linalg.norm(y - ref) / max(np.linalg.norm(ref), 1e-30)
    assert err < 1e-6, (name, err)


def test_plan_invariants():
    A = synth.random_csr(8000, density=0.0008, seed=3)
    p = plan_xpose(A)
    # every value lands exactly once: total asv mass matches
    assert np.isclose(np.abs(p.asv).sum(),
                      np.abs(A.as_).sum(), rtol=1e-5)
    # reserved zero lane everywhere
    assert (p.asv[:, CCAP] == 0).all()
    assert p.J1 % 8 == 0 and p.J1 <= 254
    assert p.K1p % 8 == 0 and p.B2 <= p.K1p
    # strided blocks cover the row space within the y staging height
    assert -(-A.m // p.B2) <= 64 * BC


def test_planner_rejects_out_of_envelope():
    # a >16k-entry row is out of the v1 envelope
    A = synth.powerlaw_csr(2000, avg_nnz=60, seed=5)
    rl = np.diff(A.irp)
    if rl.max() <= BC * CCAP:
        pytest.skip("archetype lacks a >16k row at this scale")
    assert plan_xpose(A) is None


def test_envelope_nnz_cap():
    """>J1_MAX*CCAP*BC (~4.1M) entries is definitively out of the v1
    envelope — the uint8 routing planes cap scale (VERDICT r4 weak 3):
    both the cheap necessary-condition check and the full planner must
    refuse, and the registry prepare surfaces a ValueError that
    spmv()'s auto path converts into the hybrid/PELL fallback."""
    from spmv_scpa_tpu.ops.xpose_plan import J1_MAX, quick_envelope_ok
    import spmv_scpa_tpu.ops.xpose_plan as XP
    A = synth.banded_csr(640_000, row_nnz=7, bandwidth=64, seed=9)
    assert A.nnz > J1_MAX * CCAP * BC
    assert not quick_envelope_ok(A)
    assert plan_xpose(A) is None
    assert XP.REJECT_REASON


def test_quick_envelope_consistent_with_planner():
    """quick_envelope_ok is necessary: wherever it says False the
    planner must also refuse (the reverse is allowed — mid-plan
    rejections keep the fallback chain)."""
    from spmv_scpa_tpu.ops.xpose_plan import quick_envelope_ok
    for A in (synth.webbase_csr(m=30_000, seed=7),
              synth.amazon_csr(8_000, seed=6),
              synth.random_csr(4_000, density=0.001, seed=3)):
        if not quick_envelope_ok(A):
            assert plan_xpose(A) is None


@pytest.mark.slow
@pytest.mark.parametrize("name,A", _cases())
def test_pallas_interpret_matches_oracle(name, A):
    from spmv_scpa_tpu.ops.xpose import prepare_xpose
    A.name = name
    x = make_x(A.n)
    prep = prepare_xpose(A, interpret=True)
    y = np.asarray(prep.fn(x), np.float64)
    validate_result(spmv_oracle(A, x), y, what=name)

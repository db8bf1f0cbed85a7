"""Near/far composition tests (ops/nearfar.py).

The split is exact by linearity, so interpret-mode parity on a small
band+hub synth is the whole correctness story; the rest is routing:
the strategy must refuse (ValueError) on matrices without a usable
band/scatter mix so the registry's auto fallback chain can land on
hybrid/PELL (registry.py spmv auto path).
"""

import numpy as np
import pytest

from spmv_scpa_tpu import testing as synth
from spmv_scpa_tpu.ops.nearfar import (
    choose_window, prepare_nearfar, split_by_window)
from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.utils.validation import validate_result
from spmv_scpa_tpu.utils.vector import make_x


def test_split_is_exact_partition():
    A = synth.amazon_csr(m=6000, seed=11)
    near, far = split_by_window(A, 512)
    assert near.nnz + far.nnz == A.nnz
    d_near = np.abs(near.ja.astype(np.int64) - near.row_ids())
    d_far = np.abs(far.ja.astype(np.int64) - far.row_ids())
    assert (d_near <= 512).all()
    assert (d_far > 512).all()
    # linearity: dense sums reproduce A
    np.testing.assert_allclose(near.to_dense() + far.to_dense(),
                               A.to_dense())


def test_choose_window_band_vs_scatter():
    # amazon-like: tight band + hubs -> a candidate window exists
    assert choose_window(synth.amazon_csr(m=6000, seed=1)) is not None
    # pure uniform scatter over a wide space -> no usable band
    assert choose_window(
        synth.random_csr(30000, density=0.0005, seed=4)) is None


def test_degenerate_mixes_delegate():
    # pure banded: far part below FAR_MIN -> whole-matrix hybrid
    p = prepare_nearfar(synth.banded_csr(4000, row_nnz=9, bandwidth=64,
                                         seed=2), interpret=True)
    assert p.strategy == "pallas-nearfar"
    assert p.meta["delegated"] == "pallas-hybrid"
    # pure scatter: no candidate window -> whole-matrix xpose
    p = prepare_nearfar(synth.random_csr(30000, density=0.0005, seed=4),
                        interpret=True)
    assert p.meta["delegated"] == "pallas-xpose"


@pytest.mark.slow
def test_nearfar_interpret_parity():
    A = synth.amazon_csr(m=24000, seed=6)
    x = make_x(A.n)
    p = prepare_nearfar(A, interpret=True)
    assert p.meta["far_nnz"] >= 8192
    validate_result(spmv_oracle(A, x), np.asarray(p.fn(x)),
                    what="pallas-nearfar")

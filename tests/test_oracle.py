"""Golden oracle sanity: oracle vs dense fp64 matmul."""

import numpy as np

from spmv_scpa_tpu.ops.oracle import spmv_oracle
from spmv_scpa_tpu.utils.vector import make_x
from spmv_scpa_tpu import testing as synth


def test_oracle_vs_dense(matrices):
    for A in matrices:
        x = make_x(A.n, seed=7)
        np.testing.assert_allclose(spmv_oracle(A, x), A.to_dense() @ x,
                                   rtol=1e-12, err_msg=A.name)


def test_oracle_duplicates_accumulate():
    from spmv_scpa_tpu.formats.csr import CSR
    A = CSR.from_coo("dup", 1, 1, [0, 0], [0, 0], [2.0, 3.0])
    assert spmv_oracle(A, np.array([2.0]))[0] == 10.0


def test_make_x_deterministic():
    # reference property: unseeded rand() => same x every run
    # (vector.c:36-41); we pin an explicit seed instead.
    np.testing.assert_array_equal(make_x(16), make_x(16))
    assert make_x(16, seed=1).shape == (16,)
    assert make_x(16, cols=4).shape == (16, 4)
    assert ((make_x(100) >= 0) & (make_x(100) < 1)).all()

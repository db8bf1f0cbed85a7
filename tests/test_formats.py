"""Format conversion tests: every layout must reproduce the dense matrix
(the CSR→HLL→dense roundtrip property from SURVEY.md section 4)."""

import numpy as np
import pytest

from spmv_scpa_tpu.formats.bcsr import csr_to_bcsr
from spmv_scpa_tpu.formats.csr import CSR, partition_rows_by_nnz
from spmv_scpa_tpu.formats.ell import csr_to_ell
from spmv_scpa_tpu.formats.panel_ell import csr_to_pell
from spmv_scpa_tpu import testing as synth


def test_csr_from_coo_roundtrip():
    dense = np.array([[0., 2., 0.], [1., 0., 0.], [0., 0., 0.]])
    A = CSR.from_dense("d", dense)
    np.testing.assert_allclose(A.to_dense(), dense)
    assert A.nnz == 2
    assert A.irp.tolist() == [0, 1, 2, 2]


def test_csr_duplicates_kept_and_summed_views():
    # reference keeps duplicates (two-pass fill, csr.c:115-146);
    # to_dense accumulates them, from_coo(sum_duplicates=True) merges.
    A = CSR.from_coo("dup", 2, 2, [0, 0], [1, 1], [2.0, 3.0])
    assert A.nnz == 2
    np.testing.assert_allclose(A.to_dense(), [[0, 5], [0, 0]])
    B = CSR.from_coo("dup", 2, 2, [0, 0], [1, 1], [2.0, 3.0],
                     sum_duplicates=True)
    assert B.nnz == 1
    np.testing.assert_allclose(B.to_dense(), [[0, 5], [0, 0]])


def test_csr_slice_rows():
    A = synth.banded_csr(64, row_nnz=5, bandwidth=16, seed=7)
    S = A.slice_rows(16, 48)
    np.testing.assert_allclose(S.to_dense(), A.to_dense()[16:48])


@pytest.mark.parametrize("col_major", [False, True])
@pytest.mark.parametrize("pad_mode", ["last", "neg1"])
@pytest.mark.parametrize("slice_h", [8, 32])
def test_ell_roundtrip(matrices, col_major, pad_mode, slice_h):
    for A in matrices:
        E = csr_to_ell(A, slice_h=slice_h, col_major=col_major,
                       pad_mode=pad_mode)
        np.testing.assert_allclose(E.to_dense(), A.to_dense(),
                                   err_msg=A.name)
        assert E.nnz == A.nnz
        # per-slice padding: max_nz matches longest row in slice
        lens = A.row_lengths()
        for s in range(E.num_slices):
            r0, r1 = s * slice_h, min((s + 1) * slice_h, A.m)
            assert E.max_nz[s] == max(1, int(lens[r0:r1].max(initial=0)))


@pytest.mark.parametrize("col_major", [False, True])
def test_ell_uniform_roundtrip(matrices, col_major):
    for A in matrices:
        U = csr_to_ell(A, col_major=col_major).to_uniform()
        # reconstruct dense from uniform arrays
        ja, as_ = U.ja, U.as_
        if col_major:
            ja = ja.transpose(0, 2, 1)
            as_ = as_.transpose(0, 2, 1)
        dense = np.zeros((U.num_slices * U.slice_h, A.n))
        rows = np.arange(U.num_slices * U.slice_h).reshape(
            U.num_slices, U.slice_h)
        np.add.at(dense, (np.broadcast_to(rows[..., None], ja.shape), ja), as_)
        np.testing.assert_allclose(dense[:A.m], A.to_dense(), err_msg=A.name)
        # all padded indices are in-bounds
        assert ja.min() >= 0 and ja.max() < max(A.n, 1)


def test_bcsr_roundtrip(matrices):
    for A in matrices:
        B = csr_to_bcsr(A)
        np.testing.assert_allclose(B.to_dense(), A.to_dense(),
                                   err_msg=A.name)
        assert 0 < B.fill <= 1 or A.nnz == 0


def test_pell_roundtrip(matrices):
    for A in matrices:
        P = csr_to_pell(A)
        np.testing.assert_allclose(P.to_dense(), A.to_dense(),
                                   err_msg=A.name)
        assert (P.lcol >= 0).all() and (P.lcol < 128).all()
        assert np.all(np.diff(P.rowblk) >= 0)  # sorted for segsum epilogue


def test_pell_spill_long_row():
    # a (row, panel) bucket with > quantum nonzeros must spill into
    # consecutive quanta/tiles; padding tiles carry no values
    m, n = 8, 128
    dense = np.zeros((m, n))
    dense[3, :] = np.arange(1, n + 1)      # full row in one panel
    A = CSR.from_dense("spill", dense)
    P = csr_to_pell(A)
    np.testing.assert_allclose(P.to_dense(), dense)
    used = int((P.vals != 0).any(axis=(1, 2)).sum())
    assert used == 1                        # content fits in one tile
    assert P.num_tiles % P.chunk_align == 0

    dense2 = np.zeros((8, 256))
    dense2[0, :200] = 1.0                   # spans 2 panels
    A2 = CSR.from_dense("span", dense2)
    P2 = csr_to_pell(A2)
    assert int((P2.vals != 0).any(axis=(1, 2)).sum()) == 2
    np.testing.assert_allclose(P2.to_dense(), dense2)


def test_pell_window_invariants(matrices):
    for A in matrices:
        P = csr_to_pell(A, quantum=32, window_h=4, chunk_align=4)
        np.testing.assert_allclose(P.to_dense(), A.to_dense(),
                                   err_msg=A.name)
        # windows non-decreasing, steps window-pure
        assert np.all(np.diff(P.window) >= 0)
        assert P.num_tiles % P.chunk_align == 0
        steps = P.window.reshape(-1, P.chunk_align)
        assert (steps == steps[:, :1]).all()
        # window-local ids consistent with global rowblk
        real = P.rbl < P.window_h
        np.testing.assert_array_equal(
            P.rowblk[real],
            P.rbl[real] + np.broadcast_to(
                P.window[:, None] * P.window_h, P.rbl.shape)[real])


def test_partition_rows_by_nnz():
    # reference planner: csr.c:218-276 — ≈nnz/parts nonzeros per span
    A = synth.powerlaw_csr(500, 500, seed=9)
    for parts in (1, 3, 8, 40):
        b = partition_rows_by_nnz(A.irp, parts)
        assert b[0] == 0 and b[-1] == A.m and len(b) == parts + 1
        assert (np.diff(b) >= 0).all()
        nnz_per = np.diff(A.irp[b].astype(np.int64))
        assert nnz_per.sum() == A.nnz
        # balance: no span more than ~2x ideal + one max row
        ideal = A.nnz / parts
        max_row = int(A.row_lengths().max())
        assert nnz_per.max() <= 2 * ideal + max_row



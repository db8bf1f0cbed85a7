"""Matrix Market I/O tests (reference behaviors: mmio.c + csr.c loader)."""

import numpy as np
import pytest

from spmv_scpa_tpu.errors import MatrixBoundsError, MatrixFormatError
from spmv_scpa_tpu.io import mmio
from spmv_scpa_tpu.io.loader import extract_matrix_name, load_csr


def test_banner_parse():
    b = mmio.read_banner("%%MatrixMarket matrix coordinate real general")
    assert b.is_sparse and not b.is_pattern and not b.is_symmetric
    b = mmio.read_banner("%%MatrixMarket MATRIX Coordinate PATTERN Symmetric")
    assert b.is_pattern and b.is_symmetric


@pytest.mark.parametrize("line", [
    "%%NotMatrixMarket matrix coordinate real general",
    "%%MatrixMarket tensor coordinate real general",
    "%%MatrixMarket matrix coordinate real weird",
    "%%MatrixMarket matrix",
])
def test_banner_rejects(line):
    with pytest.raises(MatrixFormatError):
        mmio.read_banner(line)


def test_read_simple():
    data = b"""%%MatrixMarket matrix coordinate real general
% a comment
3 4 4
1 1 1.5
2 3 -2.0
3 4 3.25
3 1 0.5
"""
    coo = mmio.read(data)
    assert (coo.nrows, coo.ncols, coo.nnz_stored) == (3, 4, 4)
    assert coo.row.tolist() == [0, 1, 2, 2]        # 0-based
    assert coo.col.tolist() == [0, 2, 3, 0]
    np.testing.assert_allclose(coo.val, [1.5, -2.0, 3.25, 0.5])


def test_read_pattern():
    data = b"""%%MatrixMarket matrix coordinate pattern general
2 2 2
1 1
2 2
"""
    coo = mmio.read(data)
    assert coo.val is None
    assert coo.row.tolist() == [0, 1]


def test_read_rejects_complex_and_dense():
    with pytest.raises(MatrixFormatError):
        mmio.read(b"%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1 1\n")
    with pytest.raises(MatrixFormatError):
        mmio.read(b"%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")


def test_read_truncated():
    with pytest.raises(MatrixFormatError):
        mmio.read(b"%%MatrixMarket matrix coordinate real general\n2 2 3\n1 1 1.0\n")


def test_write_read_roundtrip(tmp_path):
    path = tmp_path / "t.mtx"
    row, col = np.array([0, 1, 2]), np.array([1, 0, 2])
    val = np.array([1.25, -7.5, 3.0])
    mmio.write(path, 3, 3, row, col, val, comment="roundtrip")
    coo = mmio.read(path)
    assert coo.row.tolist() == sorted_idx(row, col)[0]
    np.testing.assert_allclose(sorted(coo.val), sorted(val))


def sorted_idx(row, col):
    order = np.lexsort((col, row))
    return row[order].tolist(), col[order].tolist()


def test_extract_matrix_name():
    # reference: csr.c:18-30 strips dir and .mtx suffix
    assert extract_matrix_name("/data/matrices/cage4.mtx") == "cage4"
    assert extract_matrix_name("plain") == "plain"
    assert extract_matrix_name("a/b/c.mtx.mtx") == "c.mtx"


def test_loader_symmetric_expansion(tmp_path):
    # reference: csr.c:91-94 — off-diagonal entries mirrored, diagonal not
    path = tmp_path / "sym.mtx"
    path.write_text("""%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 2.0
2 1 5.0
3 3 1.0
""")
    A = load_csr(path)
    assert A.nnz == 4  # diag(1,1),(3,3) + (2,1) + mirrored (1,2)
    d = A.to_dense()
    np.testing.assert_allclose(d, [[2, 5, 0], [5, 0, 0], [0, 0, 1]])


def test_loader_pattern_ones(tmp_path):
    # reference: csr.c:70-75 — pattern entries become 1.0
    path = tmp_path / "pat.mtx"
    path.write_text("""%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
""")
    A = load_csr(path)
    np.testing.assert_allclose(A.to_dense(), [[0, 1], [1, 0]])


def test_loader_bounds_check(tmp_path):
    # reference: csr.c:84-87
    path = tmp_path / "oob.mtx"
    path.write_text("""%%MatrixMarket matrix coordinate real general
2 2 1
3 1 1.0
""")
    with pytest.raises(MatrixBoundsError):
        load_csr(path)


def test_loader_rejects_hermitian(tmp_path):
    path = tmp_path / "h.mtx"
    path.write_text("""%%MatrixMarket matrix coordinate real hermitian
1 1 1
1 1 1.0
""")
    with pytest.raises(MatrixFormatError):
        load_csr(path)

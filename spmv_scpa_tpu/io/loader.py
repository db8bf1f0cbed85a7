"""Matrix loading: .mtx file → CSR with reference semantics.

Re-design of ``io_load_csr`` (reference: ``src/csr.c:31-171``):

* symmetric matrices are expanded to both triangles, diagonal entries
  not duplicated (csr.c:91-94, 141-145);
* pattern matrices get value 1.0 (csr.c:70-75, 124-129);
* 1-based file indices → 0-based (csr.c:82-83, handled in mmio.read);
* out-of-bounds coordinates are an error (csr.c:84-87);
* only sparse real/pattern input is accepted (csr.c:48-52) — we also
  accept ``integer`` (promoted to real) as a strict superset;
* the matrix name is the basename without the ``.mtx`` suffix
  (``extract_matrix_name``, csr.c:18-30).

Instead of the reference's two fscanf passes over the file
(csr.c:68-146), parsing is one vectorized pass (NumPy or the native
C++ parser in ``native/``) followed by a sort-based CSR build.
"""

from __future__ import annotations

import os

import numpy as np

from spmv_scpa_tpu.errors import MatrixBoundsError, MatrixFormatError
from spmv_scpa_tpu.formats.csr import CSR
from spmv_scpa_tpu.io import mmio


def extract_matrix_name(path: str) -> str:
    """Basename minus a trailing ``.mtx`` (csr.c:18-30)."""
    base = os.path.basename(str(path))
    if base.endswith(".mtx"):
        base = base[: -len(".mtx")]
    return base


def load_csr(path, name: str | None = None, use_native: bool | None = None) -> CSR:
    """Load a Matrix Market file into CSR with reference expansion
    semantics. ``use_native`` selects the C++ parser (None = auto)."""
    coo = None
    if use_native is not False:
        try:
            from spmv_scpa_tpu.io import native
            coo = native.read_mtx(path)
        except Exception:
            if use_native:  # explicitly requested
                raise
            coo = None
    if coo is None:
        coo = mmio.read(path)
    banner = coo.banner
    if banner.symmetry in ("skew-symmetric", "hermitian"):
        raise MatrixFormatError(
            f"unsupported symmetry {banner.symmetry!r} "
            "(reference accepts general/symmetric, csr.c:48-52)")

    row, col = coo.row, coo.col
    if row.size:
        if row.min() < 0 or col.min() < 0 or \
           row.max() >= coo.nrows or col.max() >= coo.ncols:
            raise MatrixBoundsError(
                f"entry out of bounds for {coo.nrows}x{coo.ncols} matrix "
                "(reference: csr.c:84-87)")

    if coo.val is None:  # pattern → 1.0 (csr.c:70-75)
        val = np.ones(row.shape[0], dtype=np.float64)
    else:
        val = coo.val

    if banner.is_symmetric:
        # expand off-diagonal entries to both triangles (csr.c:91-94)
        off = row != col
        row = np.concatenate([row, col[off]])
        col = np.concatenate([col, coo.row[off]])
        val = np.concatenate([val, val[off]])

    return CSR.from_coo(name or extract_matrix_name(path),
                        coo.nrows, coo.ncols, row, col, val)

"""Structured errors for the framework.

The reference uses Linux-kernel-style ``ERR_PTR``/``IS_ERR`` encoded
errno pointers plus ``LOG_ERR`` macros (reference: ``include/err.h:10-18``,
``include/utils.h:49-59``). In Python the idiomatic equivalent is a small
exception hierarchy; we keep an errno-style ``code`` attribute so callers
(and the CLI) can map failures onto process exit codes the same way the
reference's ``main.c`` does.
"""

from __future__ import annotations

import errno
import logging

log = logging.getLogger("spmv_scpa_tpu")


class SpmvError(Exception):
    """Base error; carries an errno-style code (reference: err.h:10-12)."""

    code: int = 1

    def __init__(self, message: str, code: int | None = None):
        super().__init__(message)
        if code is not None:
            self.code = code


class MatrixFormatError(SpmvError):
    """Unsupported or malformed Matrix Market content
    (reference rejects non-sparse / non-real/pattern types, csr.c:48-52)."""

    code = errno.EINVAL


class MatrixBoundsError(SpmvError):
    """Entry coordinates outside the declared matrix shape
    (reference: csr.c:84-87 bounds check)."""

    code = errno.ERANGE


class ValidationError(SpmvError):
    """A kernel result diverged from the golden oracle beyond tolerance
    (reference: utils.c:39-60 + abort paths in main.c:161-168)."""

    code = errno.EIO


class ConfigError(SpmvError):
    """Bad CLI/config combination (reference: usage abort, main.c:58-64)."""

    code = errno.EINVAL

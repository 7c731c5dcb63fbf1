"""MatrixMarket I/O (parity: cusp/io/matrix_market.h — read/write of real,
integer, complex, pattern, general and symmetric .mtx, for files and
streams).  Backed by scipy.io's battle-tested MM parser."""

from __future__ import annotations

import numpy as np
import scipy.io
import scipy.sparse as sp

from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy


def read_matrix_market_file(path, format: str = "coo", dtype=None):
    mat = scipy.io.mmread(str(path))
    if not sp.issparse(mat):
        mat = sp.coo_matrix(mat)
    return from_scipy(mat, format, dtype=dtype)


def read_matrix_market_stream(stream, format: str = "coo", dtype=None):
    mat = scipy.io.mmread(stream)
    if not sp.issparse(mat):
        mat = sp.coo_matrix(mat)
    return from_scipy(mat, format, dtype=dtype)


def write_matrix_market_file(A, path, comment: str = "") -> None:
    scipy.io.mmwrite(str(path), _as_scipy(A), comment=comment)


def write_matrix_market_stream(A, stream, comment: str = "") -> None:
    scipy.io.mmwrite(stream, _as_scipy(A), comment=comment)


def _as_scipy(A):
    if isinstance(A, (np.ndarray,)) or hasattr(A, "__jax_array__") or \
            type(A).__module__.startswith("jax"):
        return sp.coo_matrix(np.asarray(A))
    return to_scipy(A).tocoo()

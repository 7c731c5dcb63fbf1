"""Shared test fixtures/helpers: small matrices with known entries plus the
SciPy oracle (the same host-vs-device pattern as the reference's unit tests,
e.g. testing/ktt.cu:214-256)."""

import numpy as np
import scipy.sparse as sp

from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy

ALL_FORMATS = ["coo", "csr", "dia", "ell", "ellr", "hyb"]


def example_matrices(dtype=np.float32):
    """Name → scipy matrix suite covering edge shapes and patterns."""
    out = {}
    # the reference test's hand-written example (dense-ish small)
    A = np.array([[1, 0, 2, 0],
                  [0, 0, 3, 4],
                  [5, 6, 0, 0],
                  [0, 7, 8, 9]], dtype=dtype)
    out["small4x4"] = sp.coo_matrix(A)
    # rectangular
    B = np.array([[1, 2, 0, 0, 3],
                  [0, 0, 0, 0, 0],
                  [4, 0, 5, 0, 0]], dtype=dtype)
    out["rect3x5"] = sp.coo_matrix(B)
    # tridiagonal
    n = 37
    out["tri37"] = sp.diags([np.full(n - 1, -1.0), np.full(n, 2.0),
                             np.full(n - 1, -1.0)], [-1, 0, 1],
                            shape=(n, n), dtype=dtype).tocoo()
    # random with empty rows and duplicate-free pattern
    rng = np.random.RandomState(42)
    R = sp.random(50, 40, density=0.07, random_state=rng, dtype=np.float64)
    out["rand50x40"] = sp.coo_matrix(R.astype(dtype))
    # single entry
    out["single"] = sp.coo_matrix(([dtype(3.5)], ([2], [1])), shape=(5, 4))
    # empty matrix
    out["empty"] = sp.coo_matrix((6, 7), dtype=dtype)
    # wide row (hyb split exercises spill)
    C = np.zeros((10, 30), dtype=dtype)
    C[3, :25] = np.arange(1, 26)
    C[5, 4] = 2
    C[8, 29] = -1
    out["widerow"] = sp.coo_matrix(C)
    return out


def dense_of(A):
    return np.asarray(to_scipy(A).todense())


def build(S, fmt, dtype=None):
    return from_scipy(S, fmt, dtype=dtype)

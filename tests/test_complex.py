"""Complex-valued matrices end-to-end (parity: cusp::complex —
cusp/complex.h — supported across containers, multiply, solvers)."""

import numpy as np
import pytest
import scipy.sparse as sp

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy
from cusp_autotuned_tpu.ops import blas
from tests.util import ALL_FORMATS


def _complex_matrix(n=30, seed=0):
    rng = np.random.RandomState(seed)
    S = sp.random(n, n, density=0.1, random_state=rng).astype(np.complex128)
    S.data = S.data + 1j * rng.randn(S.data.size)
    S = S + sp.diags(np.full(n, 4.0 + 0.5j))
    return S.tocoo()


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_complex_spmv(fmt):
    S = _complex_matrix()
    A = from_scipy(S, fmt)
    assert np.iscomplexobj(np.asarray(to_scipy(A).data))
    rng = np.random.RandomState(1)
    x = rng.randn(30) + 1j * rng.randn(30)
    y = ct.multiply(A, x)
    np.testing.assert_allclose(np.asarray(y), S @ x, rtol=1e-10)


def test_complex_blas():
    rng = np.random.RandomState(2)
    x = rng.randn(8) + 1j * rng.randn(8)
    y = rng.randn(8) + 1j * rng.randn(8)
    np.testing.assert_allclose(complex(blas.dotc(x, y)), np.vdot(x, y),
                               rtol=1e-12)
    np.testing.assert_allclose(float(blas.nrm2(x)), np.linalg.norm(x),
                               rtol=1e-12)


def test_complex_cg_hermitian():
    """CG on a Hermitian positive-definite complex system."""
    rng = np.random.RandomState(3)
    n = 24
    B = rng.randn(n, n) + 1j * rng.randn(n, n)
    H = B @ B.conj().T + n * np.eye(n)
    S = sp.coo_matrix(H)
    A = from_scipy(S, "csr")
    b = rng.randn(n) + 1j * rng.randn(n)
    from cusp_autotuned_tpu.solvers import cg, Monitor
    x, mon = cg(A, b, monitor=Monitor(b, 200, 1e-10))
    assert mon.converged()
    np.testing.assert_allclose(H @ np.asarray(x), b, rtol=1e-7, atol=1e-8)


def test_complex_gmres():
    S = _complex_matrix()
    A = from_scipy(S, "csr")
    b = np.ones(30, np.complex128)
    from cusp_autotuned_tpu.solvers import bicgstab, Monitor
    x, mon = bicgstab(A, b, monitor=Monitor(b, 300, 1e-9))
    assert mon.converged()
    np.testing.assert_allclose(np.asarray(S @ np.asarray(x)), b,
                               rtol=1e-6, atol=1e-7)

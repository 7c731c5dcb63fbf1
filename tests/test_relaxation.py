import numpy as np
import pytest

from cusp_autotuned_tpu import gallery, relaxation
from cusp_autotuned_tpu.ops.multiply import multiply


def _system(n=10):
    A = gallery.poisson5pt(n, n, format="csr", dtype=np.float64)
    rng = np.random.RandomState(0)
    b = rng.randn(A.num_rows)
    x0 = np.zeros(A.num_rows)
    return A, b, x0


def _resid(A, x, b):
    return np.linalg.norm(b - np.asarray(multiply(A, np.asarray(x))))


def test_jacobi_reduces_residual():
    A, b, x = _system()
    M = relaxation.jacobi(A, omega=0.8)
    r0 = _resid(A, x, b)
    for _ in range(20):
        x = M(A, b, x)
    assert _resid(A, x, b) < 0.25 * r0


def test_jacobi_exact_for_diagonal_matrix():
    import scipy.sparse as sp
    from tests.util import build
    D = build(sp.diags([2.0, 4.0, 8.0]).tocoo(), "csr")
    M = relaxation.jacobi(D, omega=1.0)
    b = np.array([2.0, 4.0, 8.0])
    x = M(D, b, np.zeros(3))
    np.testing.assert_allclose(np.asarray(x), np.ones(3), rtol=1e-6)


@pytest.mark.parametrize("direction", [relaxation.FORWARD,
                                       relaxation.BACKWARD,
                                       relaxation.SYMMETRIC])
def test_gauss_seidel(direction):
    A, b, x = _system()
    M = relaxation.gauss_seidel(A, default_direction=direction)
    r0 = _resid(A, x, b)
    for _ in range(10):
        x = M(A, b, x)
    assert _resid(A, x, b) < 0.2 * r0


def test_gauss_seidel_matches_sequential():
    """Multicolor GS with the color ordering must equal sequential GS applied
    in that vertex order."""
    A, b, _ = _system(4)
    M = relaxation.gauss_seidel(A)
    x = np.asarray(M(A, b, np.zeros(A.num_rows)))
    # sequential oracle in color order
    S = np.asarray(A.to_scipy().todense())
    colors = np.asarray(M.colors)
    order = np.argsort(colors, kind="stable")
    xs = np.zeros(A.num_rows)
    for i in order:
        xs[i] = (b[i] - S[i] @ xs + S[i, i] * xs[i]) / S[i, i]
    np.testing.assert_allclose(x, xs, rtol=1e-10)


def test_sor():
    A, b, x = _system()
    M = relaxation.sor(A, omega=1.2)
    r0 = _resid(A, x, b)
    for _ in range(10):
        x = M(A, b, x)
    assert _resid(A, x, b) < 0.2 * r0


def test_polynomial():
    A, b, x = _system()
    M = relaxation.polynomial(A)
    r0 = _resid(A, x, b)
    for _ in range(5):
        x = M(A, b, x)
    assert _resid(A, x, b) < 0.5 * r0


def test_polynomial_custom_coefficients():
    A, b, x = _system()
    from cusp_autotuned_tpu.relaxation.polynomial import (
        chebyshev_polynomial_coefficients,
    )
    from cusp_autotuned_tpu.eigen import ritz_spectral_radius
    cf = chebyshev_polynomial_coefficients(ritz_spectral_radius(A, 8))
    assert cf[-1] == pytest.approx(1.0)
    M = relaxation.polynomial(A, coefficients=cf)
    x = M(A, b, x)
    assert np.all(np.isfinite(np.asarray(x)))

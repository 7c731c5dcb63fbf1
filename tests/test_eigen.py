import numpy as np
import pytest

from cusp_autotuned_tpu import eigen, gallery
from tests.util import build, example_matrices


def _sym():
    return gallery.poisson5pt(10, 10, format="csr", dtype=np.float64)


def test_disks_spectral_radius():
    A = _sym()
    rho = eigen.disks_spectral_radius(A)
    assert rho == pytest.approx(8.0)  # 4 + 4*|-1|


def test_power_estimate():
    A = _sym()
    S = A.to_scipy().todense()
    true = np.max(np.abs(np.linalg.eigvalsh(S)))
    est = eigen.estimate_spectral_radius(A, k=50)
    assert abs(est - true) / true < 0.05


def test_ritz_spectral_radius():
    A = _sym()
    S = A.to_scipy().todense()
    true = np.max(np.abs(np.linalg.eigvalsh(S)))
    est = eigen.ritz_spectral_radius(A, k=20)
    assert abs(est - true) / true < 0.02


def test_lanczos_extreme_eigs():
    A = _sym()
    S = np.asarray(A.to_scipy().todense())
    w_true = np.linalg.eigvalsh(S)
    opts = eigen.LanczosOptions(iteration_limit=60, num_eigvals=3, which="LA")
    w = np.asarray(eigen.lanczos(A, opts))
    np.testing.assert_allclose(w, w_true[::-1][:3], rtol=1e-6)
    vals, vecs = eigen.lanczos(A, opts, return_eigvecs=True)
    for lam, v in zip(np.asarray(vals), np.asarray(vecs).T):
        assert np.linalg.norm(S @ v - lam * v) < 1e-5


def test_arnoldi_hessenberg():
    A = _sym()
    H = np.asarray(eigen.arnoldi(A, k=30))
    # Ritz values of H approximate extremal eigenvalues
    w = np.linalg.eigvals(H[:-1, :])
    S = np.asarray(A.to_scipy().todense())
    w_true = np.linalg.eigvalsh(S)
    assert abs(np.max(w.real) - w_true[-1]) / w_true[-1] < 0.01


def test_lobpcg_largest():
    A = _sym()
    S = np.asarray(A.to_scipy().todense())
    w_true = np.linalg.eigvalsh(S)
    lam, x = eigen.lobpcg(A, largest=True, maxiter=200, tol=1e-8)
    assert abs(float(lam) - w_true[-1]) / w_true[-1] < 1e-4
    x = np.asarray(x)
    assert np.linalg.norm(S @ x - float(lam) * x) < 1e-3


def test_lobpcg_smallest():
    A = _sym()
    S = np.asarray(A.to_scipy().todense())
    w_true = np.linalg.eigvalsh(S)
    lam, x = eigen.lobpcg(A, largest=False, maxiter=300, tol=1e-8)
    assert abs(float(lam) - w_true[0]) / abs(w_true[0]) < 1e-2


def test_gram_schmidt():
    rng = np.random.RandomState(0)
    V = rng.randn(40, 6)
    Q = np.asarray(eigen.gram_schmidt(V))
    np.testing.assert_allclose(Q.T @ Q, np.eye(6), atol=1e-10)
    # spans the same space
    proj = Q @ (Q.T @ V)
    np.testing.assert_allclose(proj, V, atol=1e-8)

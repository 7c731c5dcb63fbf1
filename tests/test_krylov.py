import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu import gallery
from cusp_autotuned_tpu.solvers import (
    Monitor, bicg, bicgstab, bicgstab_m, cg, cg_m, cr, gmres,
)
from cusp_autotuned_tpu.operators import make_linear_operator
from cusp_autotuned_tpu.ops.format_utils import extract_diagonal
from tests.util import build


def _spd(n=15):
    return gallery.poisson5pt(n, n, format="csr", dtype=np.float64)


def _nonsym(n=200, seed=2):
    rng = np.random.RandomState(seed)
    S = sp.random(n, n, density=0.03, random_state=rng, dtype=np.float64)
    S = S + sp.diags(np.full(n, 6.0))   # diagonally dominant
    return build(S.tocoo(), "csr")


def _resid(A, x, b):
    return np.linalg.norm(b - np.asarray(ct.multiply(A, np.asarray(x)))) \
        / np.linalg.norm(b)


def test_bicgstab_spd():
    A = _spd()
    b = np.ones(A.num_rows)
    x, mon = bicgstab(A, b, monitor=Monitor(b, 400, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-7


def test_bicgstab_nonsym():
    A = _nonsym()
    b = np.ones(A.num_rows)
    x, mon = bicgstab(A, b, monitor=Monitor(b, 500, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-7


def test_bicgstab_with_preconditioner():
    A = _nonsym()
    d = np.asarray(extract_diagonal(A))
    M = make_linear_operator(lambda r: r / d)
    b = np.ones(A.num_rows)
    x, mon = bicgstab(A, b, M=M, monitor=Monitor(b, 500, 1e-8))
    assert mon.converged()


def test_bicg():
    A = _nonsym()
    b = np.ones(A.num_rows)
    x, mon = bicg(A, b, monitor=Monitor(b, 500, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-7


def test_cr():
    A = _spd()
    b = np.ones(A.num_rows)
    x, mon = cr(A, b, monitor=Monitor(b, 500, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-7


@pytest.mark.parametrize("restart", [10, 40])
def test_gmres(restart):
    A = _nonsym()
    b = np.ones(A.num_rows)
    x, mon = gmres(A, b, restart=restart, monitor=Monitor(b, 500, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-6


def test_gmres_spd_with_precond():
    A = _spd()
    d = np.asarray(extract_diagonal(A))
    M = make_linear_operator(lambda r: r / d)
    b = np.ones(A.num_rows)
    x, mon = gmres(A, b, restart=30, M=M, monitor=Monitor(b, 400, 1e-8))
    assert mon.converged()
    assert _resid(A, x, b) < 1e-6


def test_cg_m_shifts():
    A = _spd(10)
    b = np.ones(A.num_rows)
    sigma = np.array([0.1, 1.0, 5.0])
    X, mon = cg_m(A, b, sigma, monitor=Monitor(b, 600, 1e-9))
    S = A.to_scipy().tocsr()
    for s, xs in zip(sigma, np.asarray(X)):
        expect = spla.spsolve(S + s * sp.eye(A.num_rows), b)
        assert np.linalg.norm(xs - expect) / np.linalg.norm(expect) < 1e-5, s


def test_cg_m_f32_zeta_underflow_freezes_shift():
    """In float32 the Jegerlehner zeta for a well-conditioned shift
    underflows to 0 long before the seed system converges; the raw
    recurrence then returns NaN (0/0).  A dead zeta must freeze its shift
    instead — every shift stays finite and solves to working precision."""
    from cusp_autotuned_tpu.gallery import poisson5pt
    from cusp_autotuned_tpu.backend.reference import reference_spmv

    A = poisson5pt(16, 64, format="csr", dtype=np.float32)
    b = np.ones(A.num_rows, np.float32)
    sigma = np.array([0.0, 0.5, 2.0], np.float32)
    X, mon = cg_m(A, b, sigma, monitor=Monitor(b, 80, 1e-6))
    X = np.asarray(X)
    assert np.all(np.isfinite(X))
    for i, s in enumerate(sigma):
        r = reference_spmv(A, X[i]) + s * X[i] - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4, s


def test_bicgstab_m_shifts():
    A = _nonsym(120, seed=5)
    b = np.ones(A.num_rows)
    sigma = np.array([0.5, 2.0])
    X, mon = bicgstab_m(A, b, sigma, monitor=Monitor(b, 800, 1e-9))
    S = A.to_scipy().tocsr()
    for s, xs in zip(sigma, np.asarray(X)):
        expect = spla.spsolve(S + s * sp.eye(A.num_rows), b)
        assert np.linalg.norm(xs - expect) / np.linalg.norm(expect) < 1e-4, s


def test_gmres_complex():
    """GMRES on a complex system (conjugated CGS2 + complex-safe Givens)."""
    rng = np.random.RandomState(11)
    n = 60
    S = (sp.random(n, n, density=0.08, random_state=rng).astype(np.complex128))
    S.data = S.data + 1j * rng.randn(S.data.size)
    S = S + sp.diags(np.full(n, 5.0 + 1.0j))
    A = build(S.tocoo(), "csr")
    b = (rng.randn(n) + 1j * rng.randn(n))
    x, mon = gmres(A, b, restart=25, monitor=Monitor(b, 300, 1e-9))
    assert mon.converged()
    expect = spla.spsolve(S.tocsr(), b)
    assert np.linalg.norm(np.asarray(x) - expect) / np.linalg.norm(expect) < 1e-6


def test_gmres_iteration_limit_mid_restart():
    """The monitor's limit stops GMRES inside a restart cycle."""
    A = _nonsym(100, seed=7)
    b = np.ones(100)
    x, mon = gmres(A, b, restart=40, monitor=Monitor(b, 7, 1e-12))
    assert not mon.converged()
    assert mon.iteration_count() >= 7
    assert np.all(np.isfinite(np.asarray(x)))


def test_gmres_nonsym_with_diagonal_and_ainv():
    """BASELINE north star: GMRES + diagonal / AINV preconditioning on a
    nonsymmetric system (reference pairing: cusp/krylov/detail/gmres.inl
    with cusp/precond/{diagonal,ainv}.h) — both preconditioners converge
    and AINV needs no more iterations than unpreconditioned GMRES."""
    from cusp_autotuned_tpu import precond
    rng = np.random.RandomState(11)
    n = 150
    S = sp.random(n, n, density=0.03, random_state=rng, dtype=np.float64)
    # badly row-scaled + diagonally dominant: plain GMRES stalls, the
    # preconditioners carry it
    scale = 10.0 ** (1.5 * rng.rand(n))
    S = sp.diags(scale) @ (S + sp.diags(np.full(n, 6.0)))
    A = build(S.tocoo(), "csr")
    b = np.ones(A.num_rows)
    _, mon_plain = gmres(A, b, restart=30, monitor=Monitor(b, 300, 1e-8))

    # left preconditioning converges on ||M r||; with ~10^1.5 row scaling
    # the true-residual floor is correspondingly looser
    Md = precond.diagonal(A)
    x, mon_d = gmres(A, b, restart=30, M=Md, monitor=Monitor(b, 300, 1e-8))
    assert mon_d.converged()
    assert _resid(A, x, b) < 1e-5
    assert mon_d.iteration_count() < mon_plain.iteration_count()

    Ma = precond.nonsym_bridson_ainv(A, drop_tolerance=0.02)
    x, mon_a = gmres(A, b, restart=30, M=Ma, monitor=Monitor(b, 300, 1e-8))
    assert mon_a.converged()
    assert _resid(A, x, b) < 1e-5
    assert mon_a.iteration_count() < mon_plain.iteration_count()

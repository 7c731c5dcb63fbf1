"""Dense LAPACK verbs used by the solvers (GMRES Hessenberg, Lanczos
tridiagonal eigenproblem, AMG coarse LU).

Parity target: cusp/lapack/lapack.h:44-358 (getrf potrf sytrf getrs potrs
sytrs gesv trtrs trtri syev stev stsv gesvd).  Routed to jax.scipy.linalg
(device) with host scipy for the few routines XLA lacks — the same split the
reference makes by binding host LAPACK (cusp/lapack/detail/stubs.h).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def getrf(A):
    """LU factorization with partial pivoting → (lu, piv)."""
    return jsl.lu_factor(jnp.asarray(A))


def getrs(lu_piv, b):
    return jsl.lu_solve(lu_piv, jnp.asarray(b))


def gesv(A, b):
    """Solve A x = b via LU."""
    return jsl.lu_solve(jsl.lu_factor(jnp.asarray(A)), jnp.asarray(b))


def potrf(A, lower=True):
    return jsl.cholesky(jnp.asarray(A), lower=lower)


def potrs(L, b, lower=True):
    return jsl.cho_solve((L, lower), jnp.asarray(b))


def sytrf(A):
    """Symmetric indefinite factorization; XLA has no Bunch-Kaufman, so this
    returns an LU factorization usable by sytrs (reference binds host LAPACK
    for the same reason)."""
    return jsl.lu_factor(jnp.asarray(A))


def sytrs(fact, b):
    return jsl.lu_solve(fact, jnp.asarray(b))


def trtrs(A, b, lower=False, unit_diagonal=False):
    return jsl.solve_triangular(jnp.asarray(A), jnp.asarray(b),
                                lower=lower, unit_diagonal=unit_diagonal)


def trtri(A, lower=False):
    n = A.shape[0]
    return jsl.solve_triangular(jnp.asarray(A), jnp.eye(n, dtype=A.dtype),
                                lower=lower)


def syev(A):
    """Symmetric eigendecomposition → (eigenvalues, eigenvectors)."""
    return jnp.linalg.eigh(jnp.asarray(A))


def stev(alphas, betas):
    """Eigen-decomposition of a symmetric tridiagonal matrix (host scipy —
    no XLA tridiagonal eig; used at Lanczos post-processing time only)."""
    import scipy.linalg as sla
    w, v = sla.eigh_tridiagonal(np.asarray(alphas), np.asarray(betas))
    return jnp.asarray(w), jnp.asarray(v)


def stsv(alphas, betas, b):
    """Solve a symmetric tridiagonal system."""
    n = len(np.asarray(alphas))
    T = (np.diag(np.asarray(alphas))
         + np.diag(np.asarray(betas), 1) + np.diag(np.asarray(betas), -1))
    return gesv(jnp.asarray(T), b)


def gesvd(A):
    return jnp.linalg.svd(jnp.asarray(A), full_matrices=False)

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
    """Symmetric indefinite Bunch-Kaufman factorization (host LAPACK via
    scipy, the same binding the reference makes — cusp/lapack/detail/
    stubs.h routes sytrf to host LAPACK too; XLA has no Bunch-Kaufman).
    Returns an opaque factor consumed by sytrs."""
    import scipy.linalg.lapack as lp
    Ah = np.asarray(A)
    real = not np.issubdtype(Ah.dtype, np.complexfloating)
    f = lp.ssytrf if Ah.dtype == np.float32 else (
        lp.dsytrf if real else
        (lp.csytrf if Ah.dtype == np.complex64 else lp.zsytrf))
    ldu, ipiv, info = f(Ah, lower=1)
    if info != 0:
        raise np.linalg.LinAlgError(f"sytrf failed: info={info}")
    return ("bk", ldu, ipiv, Ah.dtype)


def sytrs(fact, b):
    if isinstance(fact, tuple) and len(fact) == 4 and fact[0] == "bk":
        import scipy.linalg.lapack as lp
        _, ldu, ipiv, dtype = fact
        real = not np.issubdtype(dtype, np.complexfloating)
        f = lp.ssytrs if dtype == np.float32 else (
            lp.dsytrs if real else
            (lp.csytrs if dtype == np.complex64 else lp.zsytrs))
        x, info = f(ldu, ipiv, np.asarray(b), lower=1)
        if info != 0:
            raise np.linalg.LinAlgError(f"sytrs failed: info={info}")
        return jnp.asarray(x)
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
    """Solve a symmetric tridiagonal system in O(n) via lax.linalg's
    tridiagonal solve (no densification; parity: cusp/lapack stsv)."""
    import jax.lax.linalg as lxl
    a = jnp.asarray(alphas)
    e = jnp.asarray(betas)
    z = jnp.zeros(1, a.dtype)
    dl = jnp.concatenate([z, e])              # sub-diagonal, dl[0] ignored
    du = jnp.concatenate([e, z])              # super-diagonal, du[-1] ignored
    b2 = jnp.asarray(b)
    rhs = b2[:, None] if b2.ndim == 1 else b2
    x = lxl.tridiagonal_solve(dl, a, du, rhs.astype(a.dtype))
    return x[:, 0] if b2.ndim == 1 else x


def gesvd(A):
    return jnp.linalg.svd(jnp.asarray(A), full_matrices=False)

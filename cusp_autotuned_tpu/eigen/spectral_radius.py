"""Spectral radius estimators.

Parity: cusp/eigen/spectral_radius.h:79 — disks_spectral_radius (Gershgorin
disks), ritz_spectral_radius (k-step Lanczos Ritz value),
estimate_spectral_radius.  Consumed by AMG prolongator smoothing
(rho_DinvA, cusp/precond/aggregation/smoothed_aggregation.h:45-68) and
polynomial relaxation."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.ops.multiply import multiply


def disks_spectral_radius(A) -> float:
    """Gershgorin bound: max row sum of |a_ij|."""
    from cusp_autotuned_tpu.ops.multiply import _coo_view
    row, col, val, valid = _coo_view(A)
    absval = jnp.where(valid, jnp.abs(val), 0)
    sums = jax.ops.segment_sum(absval, row, num_segments=A.num_rows)
    return float(jnp.max(sums))


def ritz_spectral_radius(A, k: int = 10, symmetric: bool = True,
                         seed: int = 0) -> float:
    """Largest Ritz value of a k-step Lanczos (symmetric) / Arnoldi
    factorization."""
    if symmetric:
        alphas, betas, _ = _lanczos_tridiag(A, k, seed)
        import scipy.linalg as sla
        m = len(alphas)
        if m == 0:
            return 0.0
        w = sla.eigh_tridiagonal(np.asarray(alphas), np.asarray(betas[:m - 1]),
                                 eigvals_only=True)
        return float(np.max(np.abs(w)))
    from cusp_autotuned_tpu.eigen.arnoldi import _arnoldi_factor
    H, _ = _arnoldi_factor(A, k, seed)
    m = H.shape[1]
    return float(np.max(np.abs(np.linalg.eigvals(np.asarray(H[:m, :m])))))


def estimate_spectral_radius(A, k: int = 20, seed: int = 0) -> float:
    """Power-method estimate with k iterations."""
    n = A.num_rows
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(n).astype(np.float32 if "32" in str(A.dtype)
                                       else np.float64))

    @jax.jit
    def run(A, x):
        def body(_, x):
            y = multiply(A, x)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
        x = jax.lax.fori_loop(0, k, body, x)
        y = multiply(A, x)
        return jnp.linalg.norm(y) / jnp.maximum(jnp.linalg.norm(x), 1e-30)

    return float(run(A, x))


def _lanczos_tridiag(A, k: int, seed: int = 0, v0=None):
    """k-step Lanczos with full reorthogonalization; returns (alphas, betas,
    V) as host arrays (alphas m, betas m, V (m+1, n))."""
    n = A.num_rows
    rng = np.random.RandomState(seed)
    dtype = np.float32 if "32" in str(A.dtype) else np.float64
    v = np.asarray(v0, dtype) if v0 is not None else rng.rand(n).astype(dtype)
    v = v / np.linalg.norm(v)
    V = [v]
    alphas, betas = [], []
    beta = 0.0
    spmv = jax.jit(lambda A, x: multiply(A, x))
    for j in range(min(k, n)):
        w = np.asarray(spmv(A, jnp.asarray(V[-1])))
        alpha = float(np.dot(V[-1], w))
        w = w - alpha * V[-1] - (beta * V[-2] if len(V) > 1 else 0)
        # full reorthogonalization (lanczos_options reorth=Full analogue)
        for u in V:
            w = w - np.dot(u, w) * u
        beta = float(np.linalg.norm(w))
        alphas.append(alpha)
        betas.append(beta)
        if beta < 1e-12:
            break
        V.append(w / beta)
    return np.asarray(alphas), np.asarray(betas), np.asarray(V)

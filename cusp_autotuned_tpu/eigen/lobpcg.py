"""LOBPCG (parity: cusp/eigen/lobpcg.h — lobpcg(A, S, X, monitor, largest)
computes one extreme eigenpair, optionally preconditioned).

Jitted fixed-iteration loop: each step solves the 3x3 Rayleigh-Ritz problem
in the span {x, w, p} on device."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cusp_autotuned_tpu.ops.multiply import multiply
from cusp_autotuned_tpu.operators import as_operator


def lobpcg(A, x0=None, M=None, largest: bool = True, maxiter: int = 100,
           tol: float = 1e-6, seed: int = 0):
    """Returns (eigenvalue, eigenvector) for the largest (or smallest)
    eigenpair of symmetric A."""
    n = A.num_rows
    dtype = np.float32 if "32" in str(A.dtype) else np.float64
    if x0 is None:
        x0 = np.random.RandomState(seed).rand(n).astype(dtype)
    x0 = jnp.asarray(x0, dtype)
    Mop = as_operator(M)
    sign = 1.0 if largest else -1.0

    @jax.jit
    def run(A, Mop, x0):
        def rayleigh(x):
            return jnp.vdot(x, multiply(A, x)) / jnp.vdot(x, x)

        def body(carry):
            x, p, lam, it, done = carry
            Ax = multiply(A, x)
            r = Ax - lam * x
            w = Mop(r)
            # Rayleigh-Ritz in an orthonormalized span {x, w, p}
            S = jnp.stack([x, w, p], axis=1)          # (n, 3)
            from cusp_autotuned_tpu.eigen.gram_schmidt import gram_schmidt
            Q = gram_schmidt(S)
            colnorm = jnp.linalg.norm(Q, axis=0)      # ~0 for degenerate dirs
            G = Q.T @ jax.vmap(lambda c: multiply(A, c), 1, 1)(Q)
            # exclude degenerate directions from the argmax/argmin
            penalty = jnp.where(colnorm < 0.5, -sign * 1e30, 0.0)
            vals, vecs = jnp.linalg.eigh(G + jnp.diag(penalty).astype(G.dtype))
            idx = jnp.argmax(sign * vals)
            c = vecs[:, idx]
            x_new = Q @ c
            x_new = x_new / jnp.linalg.norm(x_new)
            p_new = Q[:, 1:] @ c[1:]
            pn = jnp.linalg.norm(p_new)
            p_new = jnp.where(pn > 1e-12, p_new / jnp.where(pn > 0, pn, 1),
                              p_new)
            lam_new = rayleigh(x_new)
            done = jnp.linalg.norm(r) <= tol * jnp.abs(lam_new) + 1e-30
            return (x_new, p_new, lam_new, it + 1, done)

        def cond(carry):
            x, p, lam, it, done = carry
            return jnp.logical_and(jnp.logical_not(done), it < maxiter)

        x = x0 / jnp.linalg.norm(x0)
        lam = rayleigh(x)
        carry = (x, jnp.zeros_like(x), lam, jnp.asarray(0, jnp.int32),
                 jnp.asarray(False))
        x, p, lam, it, done = jax.lax.while_loop(cond, body, carry)
        return lam, x

    lam, x = run(A, Mop, x0)
    return lam, x

"""Gram-Schmidt orthogonalization (parity: cusp/eigen/gram_schmidt.h)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def gram_schmidt(V):
    """Orthonormalize the columns of V (n, k) by re-orthogonalized classical
    Gram-Schmidt (two MXU-friendly passes)."""
    V = jnp.asarray(V)
    n, k = V.shape

    def body(i, Q):
        v = V[:, i]
        mask = (jnp.arange(k) < i).astype(V.dtype)
        for _ in range(2):
            coeffs = (Q.T @ v) * mask
            v = v - Q @ coeffs
        norm = jnp.linalg.norm(v)
        v = v / jnp.where(norm > 0, norm, 1)
        return Q.at[:, i].set(v)

    return jax.lax.fori_loop(0, k, body, jnp.zeros_like(V))

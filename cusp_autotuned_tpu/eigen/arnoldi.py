"""Arnoldi factorization (parity: cusp/eigen/arnoldi.h:83 —
arnoldi(A, H, k=10) builds the k-step upper Hessenberg)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cusp_autotuned_tpu.ops.multiply import multiply


def _arnoldi_factor(A, k: int, seed: int = 0):
    n = A.num_rows
    rng = np.random.RandomState(seed)
    dtype = np.float32 if "32" in str(A.dtype) else np.float64
    q = rng.rand(n).astype(dtype)
    q /= np.linalg.norm(q)
    Q = [q]
    k = min(k, n)
    H = np.zeros((k + 1, k), dtype)
    spmv = jax.jit(lambda A, x: multiply(A, x))
    m = k
    for j in range(k):
        w = np.asarray(spmv(A, jnp.asarray(Q[j])))
        for i in range(j + 1):
            H[i, j] = np.dot(Q[i], w)
            w = w - H[i, j] * Q[i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-12:
            m = j + 1
            break
        Q.append(w / H[j + 1, j])
    return H[: m + 1, : m], np.asarray(Q)


def arnoldi(A, k: int = 10, seed: int = 0):
    """Returns the (m+1, m) Hessenberg H of a k-step Arnoldi factorization
    (functional version of the reference's arnoldi(A, H, k))."""
    H, _ = _arnoldi_factor(A, k, seed)
    return jnp.asarray(H)

"""Strength-of-connection measures.

Parity: cusp/precond/aggregation/system/detail/generic/symmetric_strength.h
(keep a_ij when |a_ij|^2 >= theta^2 * |a_ii a_jj|; theta = 0 keeps all) and
evolution_strength.h (ODE/evolution measure).  Also rho_Dinv_A, the spectral
radius of D^-1 A used throughout SA setup (sa_level::rho_DinvA,
smoothed_aggregation.h:45-68)."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy
from cusp_autotuned_tpu.ops.format_utils import extract_diagonal


def symmetric_strength_of_connection(A, theta: float = 0.0):
    """Filtered pattern C: keep a_ij with |a_ij| >= theta*sqrt(|a_ii a_jj|)
    (diagonal always kept).  theta == 0 keeps everything — return before
    touching the device (extract_diagonal would compile a fresh program per
    AMG level)."""
    if theta == 0.0:
        return A.asformat("csr")
    S = to_scipy(A).tocoo()
    # host-side diagonal: this is setup-time planning, no device round trip
    diag_mask = S.row == S.col
    d = np.zeros(S.shape[0], np.float64)
    d[S.row[diag_mask]] = np.abs(S.data[diag_mask])
    keep = (np.abs(S.data) ** 2 >= (theta * theta) * d[S.row] * d[S.col]) \
        | (S.row == S.col)
    import scipy.sparse as sp
    C = sp.coo_matrix((S.data[keep], (S.row[keep], S.col[keep])),
                      shape=S.shape)
    return from_scipy(C, "csr", dtype=np.asarray(to_scipy(A).data).dtype)


def evolution_strength_of_connection(A, B=None, rho_DinvA: float | None = None,
                                     epsilon: float = 4.0):
    """Evolution (ODE) strength: smooth the delta functions one weighted-
    Jacobi step, z = (I - (1/rho) D^-1 A), and measure connection strength
    by how well neighbor j approximates i in the smoothed operator —
    |z_ij| relative to the strongest off-diagonal of row i; keep within a
    factor 1/epsilon (behavioral rebuild of evolution_strength.h:180-399
    with the standard single-step evolution measure)."""
    import scipy.sparse as sp
    S = to_scipy(A).tocsr().astype(np.float64)
    n = S.shape[0]
    d = S.diagonal()
    d = np.where(d != 0, d, 1.0)
    if rho_DinvA is None:
        rho_DinvA = rho_Dinv_A(A)
    Dinv = sp.diags(1.0 / d)
    Z = (sp.eye(n) - (1.0 / max(rho_DinvA, 1e-30)) * (Dinv @ S)).tocsr()
    Z = Z.tocoo()
    off = Z.row != Z.col
    mags = np.abs(Z.data)
    row_max = np.zeros(n)
    np.maximum.at(row_max, Z.row[off], mags[off])
    keep = (~off) | (mags >= row_max[Z.row] / epsilon)
    C = sp.coo_matrix((Z.data[keep], (Z.row[keep], Z.col[keep])), shape=S.shape)
    dtype = to_scipy(A).dtype
    return from_scipy(C, "csr", dtype=dtype)


def rho_Dinv_A(A, k: int = 8) -> float:
    """Spectral radius of D^-1 A via Ritz values (the quantity the SA
    hierarchy caches per level)."""
    import scipy.sparse as sp
    S = to_scipy(A).tocsr().astype(np.float64)
    d = S.diagonal()
    d = np.where(d != 0, d, 1.0)
    DinvA = sp.diags(1.0 / d) @ S
    # nonsymmetric operator: power iteration on host (setup-time, small k)
    rng = np.random.RandomState(0)
    x = rng.rand(S.shape[0])
    lam = 1.0
    for _ in range(max(k, 15)):
        y = DinvA @ x
        lam = np.linalg.norm(y)
        if lam == 0:
            return 0.0
        x = y / lam
    return float(lam)

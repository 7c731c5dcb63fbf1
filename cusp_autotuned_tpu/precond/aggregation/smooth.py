"""Prolongator smoothing + Galerkin product.

Parity: cusp/precond/aggregation/system/detail/generic/
smooth_prolongator.h:52-151 — P = (I - (omega/rho) D^-1 S) T with
omega = 4/3 by default and rho = rho(D^-1 A); and
detail/galerkin_product.inl — A_coarse = R A P with R = P^T."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy
from cusp_autotuned_tpu.ops.spgemm import spgemm
from cusp_autotuned_tpu.ops.transpose import transpose
from cusp_autotuned_tpu.ops.convert import convert


def smooth_prolongator(S, T, omega: float = 4.0 / 3.0,
                       rho_DinvA: float | None = None):
    """One damped-Jacobi smoothing sweep applied to the tentative
    prolongator."""
    if rho_DinvA is None:
        from cusp_autotuned_tpu.precond.aggregation.strength import rho_Dinv_A
        rho_DinvA = rho_Dinv_A(S)
    import scipy.sparse as sp
    Ssp = to_scipy(S).tocsr().astype(np.float64)
    Tsp = to_scipy(T).tocsr().astype(np.float64)
    d = Ssp.diagonal()
    d = np.where(d != 0, d, 1.0)
    scale = omega / max(rho_DinvA, 1e-30)
    P = (Tsp - scale * (sp.diags(1.0 / d) @ Ssp @ Tsp)).tocoo()
    dtype = to_scipy(T).dtype
    return from_scipy(P, "csr", dtype=dtype)


def galerkin_product(R, A, P):
    """A_c = R A P.  Setup-time triple product: runs on the host (scipy) —
    the reference likewise keeps a separate SetupMatrixType for hierarchy
    construction (smoothed_aggregation.h:166); the *solve* path SpGEMM
    (ops.spgemm) stays on device."""
    Rs = to_scipy(R).tocsr()
    As = to_scipy(A).tocsr()
    Ps = to_scipy(P).tocsr()
    C = (Rs @ (As @ Ps)).tocoo()
    return from_scipy(C, "csr", dtype=to_scipy(A).dtype)

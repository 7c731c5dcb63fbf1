"""Approximate-inverse (AINV) preconditioners.

Parity: cusp/precond/ainv.h:52-163 + detail/ainv.inl — Bridson's
right-looking outer-product (bi)conjugation with the same dropping knobs:
drop_tolerance (absolute), nonzero_per_row cap (keep largest), and
lin_dropping (cap = lin_param + nnz of the corresponding row of A).

The factorization is inherently sequential and runs on the host at setup —
exactly as the reference does (detail/ainv.inl builds std::map rows on the
host) — producing CSR factors whose application is two SpMVs + a diagonal
scale, fully jittable inside solver loops.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

import scipy.sparse as sp

from cusp_autotuned_tpu.formats.base import MatrixBase, register_matrix, static_field
from cusp_autotuned_tpu.formats.csr import CSR
from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy
from cusp_autotuned_tpu.ops.multiply import multiply


def _drop(vec: dict, drop_tolerance: float, row_count: int, keep: int):
    """In-place dropping: remove |v| < tol (except `keep`), cap size."""
    if drop_tolerance > 0:
        for k in [k for k, v in vec.items()
                  if k != keep and abs(v) < drop_tolerance]:
            del vec[k]
    if row_count > 0 and len(vec) > row_count:
        items = sorted(vec.items(), key=lambda kv: -abs(kv[1]))
        kept = dict(items[:row_count])
        if keep in vec:
            kept[keep] = vec[keep]
        vec.clear()
        vec.update(kept)


def _axpy_drop(target: dict, alpha: float, source: dict,
               drop_tolerance: float, row_count: int, keep: int):
    for k, v in source.items():
        target[k] = target.get(k, 0.0) + alpha * v
    _drop(target, drop_tolerance, row_count, keep)


def _row_cap(nonzero_per_row, lin_dropping, lin_param, a_row_nnz):
    if lin_dropping:
        return max(1, lin_param + a_row_nnz)
    return nonzero_per_row


def _sparse_matvec(A_csr, vec: dict) -> dict:
    """Given the CSR rows of B, returns B^T @ vec (combining rows of B =
    columns of B^T).  Call with the rows of A^T to get A @ vec."""
    out: dict = {}
    indptr, col, val = A_csr
    for j, w in vec.items():
        for p in range(indptr[j], indptr[j + 1]):
            out[col[p]] = out.get(col[p], 0.0) + val[p] * w
    return out


def _host_csc(A):
    S = to_scipy(A).tocsc()
    return S.indptr, S.indices, S.data


def _factors_to_csr(factors, n, dtype) -> CSR:
    """factors[j] = sparse column j -> CSR container of the matrix W."""
    rows, cols, vals = [], [], []
    for j, vec in enumerate(factors):
        for i, v in vec.items():
            rows.append(i)
            cols.append(j)
            vals.append(v)
    S = sp.coo_matrix((np.asarray(vals, dtype),
                       (np.asarray(rows), np.asarray(cols))), shape=(n, n))
    return from_scipy(S, "csr")


@register_matrix
@dataclasses.dataclass(frozen=True)
class AINVOperator(MatrixBase):
    """M r = Z D^-1 W^T r (W == Z and/or D == I depending on variant)."""
    z: CSR
    wt: CSR
    diag_inv: jnp.ndarray
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "ainv_preconditioner"

    def __call__(self, r):
        return multiply(self.z, self.diag_inv * multiply(self.wt, r),
                        use_autotuning=False)


def _native_spd(A, drop_tolerance, nonzero_per_row, lin_dropping, lin_param,
                scaled):
    """Try the C++ factorization (cusp_autotuned_tpu.native); None if
    unavailable."""
    from cusp_autotuned_tpu import native
    S = to_scipy(A).tocsr().astype(np.float64)
    out = native.ainv_spd(S.indptr, S.indices, S.data, drop_tolerance,
                          nonzero_per_row, lin_dropping, lin_param, scaled)
    if out is None:
        return None
    w_row, w_col, w_val, diag = out
    n = A.num_rows
    dtype = S.data.dtype
    W = from_scipy(sp.coo_matrix((w_val, (w_row, w_col)), shape=(n, n)), "csr")
    from cusp_autotuned_tpu.ops.transpose import transpose
    Wt = transpose(W)
    if scaled:
        dinv = jnp.ones(n, W.val.dtype)
    else:
        dinv = jnp.asarray(np.where(diag != 0, 1.0 / np.where(diag != 0, diag,
                                                              1), 0))
    return AINVOperator(z=W, wt=Wt, diag_inv=dinv.astype(W.val.dtype),
                        shape=(n, n))


def scaled_bridson_ainv(A, drop_tolerance: float = 0.1,
                        nonzero_per_row: int = -1, lin_dropping: bool = False,
                        lin_param: int = 1) -> AINVOperator:
    """SPD AINV with columns scaled by 1/sqrt(p): M = W W^T
    (ainv.h:52, detail/ainv.inl scaled ctor)."""
    nat = _native_spd(A, drop_tolerance, nonzero_per_row, lin_dropping,
                      lin_param, scaled=True)
    if nat is not None:
        return nat
    n = A.num_rows
    S = to_scipy(A).tocsr()
    indptr, col, val = S.indptr, S.indices, S.data
    a_nnz_row = np.diff(indptr)
    w = [{j: 1.0} for j in range(n)]
    for j in range(n):
        u = _sparse_matvec((indptr, col, val), w[j])
        p = sum(w[j].get(k, 0.0) * v for k, v in u.items())
        scale = 1.0 / math.sqrt(abs(p)) if p != 0 else 1.0
        u = {k: v * scale for k, v in u.items()}
        w[j] = {k: v * scale for k, v in w[j].items()}
        for i, ui in u.items():
            if i <= j or ui == 0:
                continue
            cap = _row_cap(nonzero_per_row, lin_dropping, lin_param,
                           int(a_nnz_row[i]))
            _axpy_drop(w[i], -ui, w[j], drop_tolerance, cap, keep=i)
    W = _factors_to_csr(w, n, val.dtype)
    from cusp_autotuned_tpu.ops.transpose import transpose
    Wt = transpose(W)
    ones = jnp.ones(n, W.val.dtype)
    return AINVOperator(z=W, wt=Wt, diag_inv=ones, shape=(n, n))


def bridson_ainv(A, drop_tolerance: float = 0.1, nonzero_per_row: int = -1,
                 lin_dropping: bool = False, lin_param: int = 1) -> AINVOperator:
    """SPD AINV, unscaled: M = W D^-1 W^T (ainv.h:99)."""
    nat = _native_spd(A, drop_tolerance, nonzero_per_row, lin_dropping,
                      lin_param, scaled=False)
    if nat is not None:
        return nat
    n = A.num_rows
    S = to_scipy(A).tocsr()
    indptr, col, val = S.indptr, S.indices, S.data
    a_nnz_row = np.diff(indptr)
    w = [{j: 1.0} for j in range(n)]
    diag = np.zeros(n, np.float64)
    for j in range(n):
        u = _sparse_matvec((indptr, col, val), w[j])
        p = sum(w[j].get(k, 0.0) * v for k, v in u.items())
        diag[j] = p
        for i, ui in u.items():
            if i <= j or ui == 0:
                continue
            cap = _row_cap(nonzero_per_row, lin_dropping, lin_param,
                           int(a_nnz_row[i]))
            _axpy_drop(w[i], -ui / p, w[j], drop_tolerance, cap, keep=i)
    W = _factors_to_csr(w, n, val.dtype)
    from cusp_autotuned_tpu.ops.transpose import transpose
    Wt = transpose(W)
    dinv = jnp.asarray(np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1),
                                0).astype(val.dtype))
    return AINVOperator(z=W, wt=Wt, diag_inv=dinv, shape=(n, n))


def nonsym_bridson_ainv(A, drop_tolerance: float = 0.1,
                        nonzero_per_row: int = -1, lin_dropping: bool = False,
                        lin_param: int = 1) -> AINVOperator:
    """Nonsymmetric biconjugation: M = Z D^-1 W^T (ainv.h:143)."""
    n = A.num_rows
    S = to_scipy(A).tocsr()
    St = S.T.tocsr()
    from cusp_autotuned_tpu import native
    nat = native.ainv_nonsym(S.indptr, S.indices,
                             S.data.astype(np.float64),
                             St.indptr, St.indices,
                             St.data.astype(np.float64),
                             drop_tolerance, nonzero_per_row, lin_dropping,
                             lin_param)
    if nat is not None:
        (zr, zc, zv), (wr, wc, wv), diag = nat
        Z = from_scipy(sp.coo_matrix((zv, (zr, zc)), shape=(n, n)), "csr")
        W = from_scipy(sp.coo_matrix((wv, (wr, wc)), shape=(n, n)), "csr")
        from cusp_autotuned_tpu.ops.transpose import transpose
        Wt = transpose(W)
        dinv = jnp.asarray((1.0 / diag).astype(S.data.dtype))
        return AINVOperator(z=Z, wt=Wt, diag_inv=dinv, shape=(n, n))
    a_nnz_row = np.diff(S.indptr)
    zf = [{j: 1.0} for j in range(n)]
    wf = [{j: 1.0} for j in range(n)]
    diag = np.zeros(n, np.float64)
    A_rows = (S.indptr, S.indices, S.data)
    At_rows = (St.indptr, St.indices, St.data)
    for j in range(n):
        u = _sparse_matvec(At_rows, zf[j])      # u = A z_j
        l = _sparse_matvec(A_rows, wf[j])       # l = A^T w_j
        p = sum(wf[j].get(k, 0.0) * v for k, v in u.items())
        diag[j] = p if p != 0 else 1.0
        for i, ui in u.items():
            if i <= j or ui == 0:
                continue
            cap = _row_cap(nonzero_per_row, lin_dropping, lin_param,
                           int(a_nnz_row[i]))
            _axpy_drop(zf[i], -ui / diag[j], zf[j], drop_tolerance, cap, keep=i)
        for i, li in l.items():
            if i <= j or li == 0:
                continue
            cap = _row_cap(nonzero_per_row, lin_dropping, lin_param,
                           int(a_nnz_row[i]))
            _axpy_drop(wf[i], -li / diag[j], wf[j], drop_tolerance, cap, keep=i)
    Z = _factors_to_csr(zf, n, S.data.dtype)
    W = _factors_to_csr(wf, n, S.data.dtype)
    from cusp_autotuned_tpu.ops.transpose import transpose
    Wt = transpose(W)
    dinv = jnp.asarray((1.0 / diag).astype(S.data.dtype))
    return AINVOperator(z=Z, wt=Wt, diag_inv=dinv, shape=(n, n))

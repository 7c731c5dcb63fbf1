"""Transpose for all formats (parity: cusp/transpose.h:39,84 +
generic/transpose.inl).  Host-planned (setup-time): transposition reorders
the sparsity pattern, which is static data; solvers call it once (e.g. BiCG's
A^T) and reuse the result inside jitted loops."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cusp_autotuned_tpu import formats as F


def transpose(A):
    if isinstance(A, (np.ndarray, jnp.ndarray)):
        return jnp.swapaxes(jnp.asarray(A), -1, -2)
    if isinstance(A, F.PermutationMatrix):
        inv = np.argsort(np.asarray(A.perm)).astype(np.int32)
        return F.permutation_matrix(inv)
    if isinstance(A, F.DIA):
        # A^T's diagonal -off holds A's diagonal off, re-indexed by column
        from cusp_autotuned_tpu.formats.dia import dia_matrix
        m, n = A.shape
        offsets = np.asarray(A.offsets)
        data = np.asarray(A.data)
        new_offsets = np.sort(-offsets)
        k = offsets.size
        new_data = np.zeros((k, ((n + 127) // 128) * 128), dtype=data.dtype)
        for d in range(k):
            off = int(offsets[d])
            # entries A[i, i+off] for valid i become AT[j, j-off] with j = i+off
            i = np.arange(m)
            j = i + off
            valid = (j >= 0) & (j < n)
            nd = int(np.searchsorted(new_offsets, -off))
            new_data[nd, j[valid]] = data[d, i[valid]]
        return dia_matrix(new_offsets, new_data, (n, m), nnz=A.nnz)
    # generic path through COO triplets
    from cusp_autotuned_tpu.ops.convert import _coo_arrays, convert
    from cusp_autotuned_tpu.formats.coo import coo_matrix
    row, col, val, (m, n) = _coo_arrays(A)
    At = coo_matrix(col, row, val, (n, m), sort=True)
    fmt = getattr(A, "format", "coo")
    return At if fmt == "coo" else convert(At, fmt)

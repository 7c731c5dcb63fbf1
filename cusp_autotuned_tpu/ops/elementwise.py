"""Sparse elementwise C = op(A, B) over the union pattern, plus add/subtract
wrappers (parity: cusp/elementwise.h:43-215 + generic/elementwise.inl).
Host-planned: pattern union is data-dependent setup work."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu import formats as F
from cusp_autotuned_tpu.ops.convert import _coo_arrays, convert
from cusp_autotuned_tpu.formats.coo import coo_matrix
from cusp_autotuned_tpu.utils.exceptions import InvalidInputException


def elementwise(A, B, op):
    """C_ij = op(a_ij, b_ij) over the union of the two patterns (missing
    entries contribute 0)."""
    ra, ca, va, sa = _coo_arrays(A)
    rb, cb, vb, sb = _coo_arrays(B)
    if sa != sb:
        raise InvalidInputException(f"shape mismatch {sa} vs {sb}")
    m, n = sa
    key_a = ra.astype(np.int64) * n + ca
    key_b = rb.astype(np.int64) * n + cb
    keys = np.union1d(key_a, key_b)
    a_full = np.zeros(keys.size, dtype=np.result_type(va, vb))
    b_full = np.zeros_like(a_full)
    a_full[np.searchsorted(keys, key_a)] = va
    b_full[np.searchsorted(keys, key_b)] = vb
    vals = op(a_full, b_full)
    row = (keys // n).astype(np.int32)
    col = (keys % n).astype(np.int32)
    C = coo_matrix(row, col, vals, sa, sort=False)
    fmt = getattr(A, "format", "coo")
    if fmt not in ("csr", "dia", "ell", "ellr", "hyb"):
        return C
    return convert(C, fmt)


def add(A, B):
    return elementwise(A, B, np.add)


def subtract(A, B):
    return elementwise(A, B, np.subtract)

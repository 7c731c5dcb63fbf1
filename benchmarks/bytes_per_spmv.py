"""Per-format useful-byte models for one SpMV.

Parity: performance/spmv/bytes_per_spmv.h — exact index + value traffic per
format, assuming each array is touched once (the roofline-minimum model).
Our layouts differ from the reference's (lane-aligned padding, static DIA
offsets), so the models count OUR arrays."""

from __future__ import annotations

from cusp_autotuned_tpu import formats as F


def bytes_per_spmv(A) -> int:
    isize = 4                       # int32 indices
    vsize = A.dtype.itemsize
    m, n = A.shape
    if isinstance(A, F.COO):
        e = A.nnz_padded
        return e * (2 * isize + vsize) + n * vsize + m * vsize
    if isinstance(A, F.CSR):
        e = A.nnz_padded
        return (m + 1) * isize + e * (isize + vsize) + n * vsize + m * vsize
    if isinstance(A, F.DIA):
        # offsets are compile-time constants: zero runtime traffic
        return A.data.size * vsize + n * vsize + m * vsize
    if isinstance(A, F.ELLR):
        return (A.col.size * (isize + vsize) + A.rows_padded * isize
                + n * vsize + m * vsize)
    if isinstance(A, F.ELL):
        return A.col.size * (isize + vsize) + n * vsize + m * vsize
    if isinstance(A, F.HYB):
        return (bytes_per_spmv(A.ell) + bytes_per_spmv(A.coo)
                - n * vsize - m * vsize)   # x read / y write counted once
    raise TypeError(f"no byte model for {type(A)}")


def flops_per_spmv(A) -> int:
    return 2 * A.nnz

"""Poisson stencil matrices (parity: cusp/gallery/poisson.h:66-168 — the
same stencil coefficients as cusp/gallery/detail/poisson.inl)."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.gallery.stencil import generate_matrix_from_stencil


def poisson5pt(m, n, format="csr", dtype=np.float32):
    stencil = [((0, -1), -1), ((-1, 0), -1), ((0, 0), 4),
               ((1, 0), -1), ((0, 1), -1)]
    return generate_matrix_from_stencil(stencil, (m, n), format, dtype)


def poisson9pt(m, n, format="csr", dtype=np.float32):
    stencil = [((i, j), 8 if (i == 0 and j == 0) else -1)
               for j in (-1, 0, 1) for i in (-1, 0, 1)]
    return generate_matrix_from_stencil(stencil, (m, n), format, dtype)


def poisson7pt(m, n, k, format="csr", dtype=np.float32):
    stencil = [((0, 0, -1), -1), ((0, -1, 0), -1), ((-1, 0, 0), -1),
               ((0, 0, 0), 6), ((1, 0, 0), -1), ((0, 1, 0), -1),
               ((0, 0, 1), -1)]
    return generate_matrix_from_stencil(stencil, (m, n, k), format, dtype)


def poisson27pt(m, n, l, format="csr", dtype=np.float32):
    stencil = [((i, j, k), 26 if (i == 0 and j == 0 and k == 0) else -1)
               for k in (-1, 0, 1) for j in (-1, 0, 1) for i in (-1, 0, 1)]
    return generate_matrix_from_stencil(stencil, (m, n, l), format, dtype)

"""Grid-graph adjacency matrices (parity: cusp/gallery/grid.h +
detail/grid.inl)."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.gallery.stencil import generate_matrix_from_stencil


def grid2d(m, n, format="csr", dtype=np.float32):
    stencil = [((0, -1), 1), ((-1, 0), 1), ((1, 0), 1), ((0, 1), 1)]
    return generate_matrix_from_stencil(stencil, (m, n), format, dtype)


def grid3d(m, n, l, format="csr", dtype=np.float32):
    stencil = [((i, j, k), 1)
               for k in (-1, 0, 1) for j in (-1, 0, 1) for i in (-1, 0, 1)
               if not (i == 0 and j == 0 and k == 0)]
    return generate_matrix_from_stencil(stencil, (m, n, l), format, dtype)

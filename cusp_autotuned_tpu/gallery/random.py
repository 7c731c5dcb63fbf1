"""Random sparse matrices (parity: cusp/gallery/random.h — num_samples draws
with duplicates removed, seeded from the dimensions for reproducibility)."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.formats.coo import coo_matrix
from cusp_autotuned_tpu.ops.convert import convert


def random(m, n, num_samples, format="coo", dtype=np.float32, seed=None):
    rng = np.random.RandomState((m ^ n ^ num_samples) & 0x7fffffff
                                if seed is None else seed)
    row = rng.randint(0, m, size=num_samples).astype(np.int32)
    col = rng.randint(0, n, size=num_samples).astype(np.int32)
    key = row.astype(np.int64) * n + col
    _, first = np.unique(key, return_index=True)
    first.sort()
    row, col = row[first], col[first]
    val = np.ones(row.size, dtype=dtype)
    A = coo_matrix(row, col, val, (m, n), sort=True)
    return A if format == "coo" else convert(A, format)

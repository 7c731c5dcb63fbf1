"""Permutation matrix.

Parity target: cusp::permutation_matrix (cusp/permutation_matrix.h:448) —
a row permutation stored as a single index vector, usable as an operator
(y = P x gathers x at perm) and in symmetric permutes of sparse matrices.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.formats.base import (
    MatrixBase, register_matrix, static_field, as_index_array,
)


@register_matrix
@dataclasses.dataclass(frozen=True)
class PermutationMatrix(MatrixBase):
    perm: jnp.ndarray         # (n,) int32: row i of P has its 1 in column perm[i]
    shape: Tuple[int, int] = static_field()

    format = "permutation"

    @property
    def nnz(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.perm.dtype


def permutation_matrix(perm) -> PermutationMatrix:
    perm = as_index_array(perm)
    n = int(perm.shape[0])
    return PermutationMatrix(perm=jnp.asarray(perm), shape=(n, n))

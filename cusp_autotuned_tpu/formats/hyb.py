"""HYB (hybrid ELL + COO) sparse matrix.

Parity target: cusp::hyb_matrix (cusp/hyb_matrix.h; SpMV = ELL pass then COO
pass, cusp/detail/hyb_matrix.inl:65-68 and generic/multiply/spmv.h:275-290).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from cusp_autotuned_tpu.formats.base import MatrixBase, register_matrix, static_field
from cusp_autotuned_tpu.formats.coo import COO
from cusp_autotuned_tpu.formats.ell import ELL


@register_matrix
@dataclasses.dataclass(frozen=True)
class HYB(MatrixBase):
    ell: ELL
    coo: COO
    shape: Tuple[int, int] = static_field()

    format = "hyb"

    @property
    def nnz(self) -> int:
        return self.ell.nnz + self.coo.nnz

    @property
    def dtype(self):
        return self.ell.val.dtype


def hyb_matrix(ell: ELL, coo: COO) -> HYB:
    if ell.shape != coo.shape:
        raise ValueError("ELL and COO parts must agree on shape")
    return HYB(ell=ell, coo=coo, shape=ell.shape)

"""Synthetic DIA benchmark matrices from the fork
(parity: cusp::ktt::make_diagonal_matrix / make_diagonal_symmetric_matrix,
cusp/ktt/matrix_generation.h:14-102)."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.formats.dia import dia_matrix
from cusp_autotuned_tpu.utils.exceptions import InvalidInputException
from cusp_autotuned_tpu.utils.padding import LANE, round_up


def make_diagonal_matrix(rows, cols, diag_offsets, dtype=np.float32):
    """DIA matrix with ones on the given diagonals."""
    offsets = sorted(int(o) for o in diag_offsets)
    for off in offsets:
        starting_row = -off if off < 0 else 0
        starting_col = 0 if off < 0 else off
        if starting_row >= rows or starting_col >= cols:
            raise InvalidInputException(
                "make_diagonal_matrix: diagonal out of bounds")
    rows_pad = max(LANE, round_up(rows, LANE))
    data = np.ones((len(offsets), rows_pad), dtype=dtype)
    return dia_matrix(np.asarray(offsets, np.int32), data, (rows, cols))


def make_diagonal_symmetric_matrix(rows, cols, offset_step, diagonal_count,
                                   dtype=np.float32):
    """Main diagonal plus diagonal_count-1 others spaced offset_step apart,
    centered (symmetric only for odd counts, same as the reference)."""
    starting_offset = -offset_step * (diagonal_count // 2)
    offsets = [starting_offset + offset_step * i for i in range(diagonal_count)]
    for off in offsets:
        starting_row = -off if off < 0 else 0
        starting_col = 0 if off < 0 else off
        if starting_row >= rows or starting_col >= cols:
            raise InvalidInputException(
                "make_diagonal_symmetric_matrix: too many diagonals")
    return make_diagonal_matrix(rows, cols, offsets, dtype)

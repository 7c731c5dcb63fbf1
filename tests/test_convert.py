import numpy as np
import pytest

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu.ops.convert import convert
from cusp_autotuned_tpu.ops.format_utils import compute_optimal_entries_per_row
from tests.util import ALL_FORMATS, build, dense_of, example_matrices


@pytest.mark.parametrize("src", ALL_FORMATS)
@pytest.mark.parametrize("dst", ALL_FORMATS)
def test_all_pairs(src, dst):
    """Parity with the reference's all-pairs convert.cu coverage."""
    S = example_matrices()["small4x4"]
    A = build(S, src)
    B = convert(A, dst)
    assert B.format == dst
    np.testing.assert_allclose(dense_of(B), S.todense(), rtol=1e-6)


def test_dense_to_sparse_and_back():
    S = example_matrices()["small4x4"]
    dense = np.asarray(S.todense())
    from cusp_autotuned_tpu.ops.convert import to_dense
    A = convert(dense, "csr")
    assert A.nnz == S.nnz
    np.testing.assert_allclose(np.asarray(to_dense(A)), dense)


def test_dia_fill_guard():
    """Parity: coo_to_other.h:155-161 — reject high fill-in DIA conversions."""
    rng = np.random.RandomState(0)
    n = 3000
    row = rng.randint(0, n, 2000).astype(np.int32)
    col = rng.randint(0, n, 2000).astype(np.int32)
    from cusp_autotuned_tpu.formats.coo import coo_matrix
    A = coo_matrix(row, col, np.ones(2000, np.float32), (n, n))
    with pytest.raises(ct.FormatConversionException):
        convert(A, "dia")
    B = convert(A, "dia", dont_throw=True)   # escape hatch must still work
    np.testing.assert_allclose(dense_of(B), dense_of(A), rtol=1e-6)


def test_ell_fill_guard():
    rng = np.random.RandomState(1)
    n = 2_000_000
    # one pathological row of 2000 entries in a huge matrix
    col = np.arange(3000, dtype=np.int32)
    row = np.zeros(3000, np.int32)
    from cusp_autotuned_tpu.formats.coo import coo_matrix
    A = coo_matrix(row, col, np.ones(3000, np.float32), (n, n))
    with pytest.raises(ct.FormatConversionException):
        convert(A, "ell")


def test_hyb_split_heuristic():
    """Parity: compute_optimal_entries_per_row with relative_speed=3,
    breakeven=4096 (functional.inl:128-131)."""
    # 10000 rows of length 2, 10 rows of length 50
    lengths = np.concatenate([np.full(10000, 2), np.full(10, 50)])
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    K = compute_optimal_entries_per_row(offsets)
    # rows longer than 2 are only 10 (< 4096): K = 2
    assert K == 2


def test_convert_preserves_dtype():
    S = example_matrices()["tri37"].astype(np.float64)
    A = build(S, "coo")
    for dst in ALL_FORMATS:
        B = convert(A, dst)
        assert B.dtype == A.dtype


def test_empty_matrix_all_formats():
    S = example_matrices()["empty"]
    for src in ALL_FORMATS:
        A = build(S, src)
        assert A.nnz == 0
        for dst in ALL_FORMATS:
            B = convert(A, dst)
            np.testing.assert_array_equal(dense_of(B), np.zeros(S.shape))


def test_copy_verb_all_formats():
    # parity: cusp::copy (cusp/copy.h:39,84) — same format out, equal
    # values, fresh buffers, host mirrors carried over
    from cusp_autotuned_tpu.ops.convert import copy
    S = example_matrices()["tri37"]
    for fmt in ALL_FORMATS:
        A = build(S, fmt)
        B = copy(A)
        assert B is not A
        assert B.format == A.format
        np.testing.assert_allclose(dense_of(B), dense_of(A))
    assert getattr(copy(build(S, "csr")), "_host_coo", None) is not None

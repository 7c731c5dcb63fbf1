"""Pallas kernel validation (interpret mode on CPU; the same kernels compile
with Mosaic on TPU).  Mirrors the oracle pattern of the reference's KTT test
(testing/ktt.cu: every configuration validated against the reference
multiply)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cusp_autotuned_tpu import gallery
from cusp_autotuned_tpu.backend.reference import reference_spmv, from_scipy
from cusp_autotuned_tpu.kernels.pallas_dia import build_dia


def _check(A, block_rows=1024, rtol=1e-5):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(A.num_cols).astype(np.float32))
    fn = build_dia(A, {"block_rows": block_rows}, interpret=True)
    y = np.asarray(jax.jit(fn)(x))
    ref = reference_spmv(A, np.asarray(x))
    np.testing.assert_allclose(y, ref, rtol=rtol, atol=1e-4)


def test_dia_poisson():
    _check(gallery.poisson5pt(37, 41, format="dia", dtype=np.float32))


def test_dia_lane_aligned_offsets():
    # offsets multiple of 128 exercise the r == 0 fast path
    A = gallery.make_diagonal_matrix(1500, 1500, [-256, -128, 0, 128, 384])
    _check(A)


def test_dia_unaligned_offsets():
    A = gallery.make_diagonal_matrix(1500, 1500, [-1000, -3, 0, 5, 999])
    _check(A)


def test_dia_rect_wide():
    import scipy.sparse as sp
    S = sp.diags([np.ones(300), 2 * np.ones(300), 3 * np.ones(200)],
                 [0, 150, 320], shape=(300, 520)).tocoo()
    _check(from_scipy(S, "dia"))


def test_dia_rect_tall():
    import scipy.sparse as sp
    S = sp.diags([np.ones(300), 2 * np.ones(300)], [-220, 0],
                 shape=(520, 300)).tocoo()
    _check(from_scipy(S, "dia"))


@pytest.mark.parametrize("block_rows", [1024, 2048])
def test_dia_block_rows(block_rows):
    A = gallery.make_diagonal_symmetric_matrix(3000, 3000, 7, 9)
    _check(A, block_rows=block_rows)


# -- windowed one-hot CSR/COO kernel ------------------------------------------

def _check_onehot(S, B=512, C=1024, fmt="csr"):
    A = from_scipy(S.tocoo(), fmt)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(A.num_cols).astype(np.float32))
    from cusp_autotuned_tpu.kernels.pallas_csr import build_csr_onehot
    fn = build_csr_onehot(A, {"block_entries": B, "col_window": C},
                          interpret=True)
    y = np.asarray(jax.jit(fn)(x))
    ref = reference_spmv(A, np.asarray(x))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_onehot_poisson():
    _check_onehot(gallery.poisson9pt(35, 35, format="csr").to_scipy())


def test_onehot_irregular_rows():
    import scipy.sparse as sp
    rng = np.random.RandomState(2)
    S = sp.random(700, 700, density=0.008, random_state=rng).tocsr()
    S = S + sp.eye(700)
    _check_onehot(S)


def test_onehot_coo_and_ell():
    import scipy.sparse as sp
    S = sp.diags([np.ones(399), 2 * np.ones(400), 3 * np.ones(399)],
                 [-1, 0, 1]).tocsr()
    _check_onehot(S, fmt="coo")
    _check_onehot(S, fmt="ell")


def test_onehot_rectangular():
    import scipy.sparse as sp
    rng = np.random.RandomState(3)
    S = sp.random(300, 900, density=0.01, random_state=rng).tocsr()
    _check_onehot(S)


def test_onehot_wide_scatter_pattern_is_skippable():
    """A pattern needing absurd cutting raises the skippable exception."""
    import scipy.sparse as sp
    import pytest as _pytest
    from cusp_autotuned_tpu.utils.exceptions import FormatConversionException
    from cusp_autotuned_tpu.kernels.pallas_csr import build_csr_onehot
    rng = np.random.RandomState(4)
    # every entry in a different row+huge col spread -> blocks degenerate
    n = 4000
    rows = np.arange(n, dtype=np.int32)
    cols = rng.permutation(n).astype(np.int32)
    import cusp_autotuned_tpu.formats as F
    A = F.coo_matrix(rows, cols, np.ones(n, np.float32), (n, n))
    with _pytest.raises(FormatConversionException):
        build_csr_onehot(A, {"block_entries": 512, "col_window": 512},
                         interpret=True)

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

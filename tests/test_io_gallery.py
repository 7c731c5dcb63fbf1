import io as _io

import numpy as np
import pytest

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu import gallery
from cusp_autotuned_tpu import io as ctio
from tests.util import build, dense_of, example_matrices


def test_matrix_market_roundtrip(tmp_path):
    S = example_matrices()["rand50x40"]
    A = build(S, "coo")
    p = tmp_path / "m.mtx"
    ctio.write_matrix_market_file(A, p)
    B = ctio.read_matrix_market_file(p, "csr")
    np.testing.assert_allclose(dense_of(B), dense_of(A), rtol=1e-6)


def test_matrix_market_stream():
    text = """%%MatrixMarket matrix coordinate real general
3 3 2
1 1 5.0
3 2 -2.5
"""
    B = ctio.read_matrix_market_stream(_io.BytesIO(text.encode()))
    d = dense_of(B)
    assert d[0, 0] == 5.0 and d[2, 1] == -2.5


def test_binary_roundtrip(tmp_path):
    S = example_matrices()["small4x4"]
    A = build(S, "csr")
    p = tmp_path / "m.npz"
    ctio.write_binary_file(A, p)
    B = ctio.read_binary_file(p)
    assert B.format == "csr"
    np.testing.assert_allclose(dense_of(B), dense_of(A), rtol=1e-6)


def test_dimacs_roundtrip(tmp_path):
    S = example_matrices()["rand50x40"]
    # dimacs graphs are square; pad shape
    import scipy.sparse as sp
    Ssq = sp.coo_matrix((S.data, (S.row, S.col)), shape=(50, 50))
    A = build(Ssq, "coo")
    p = tmp_path / "g.dimacs"
    ctio.write_dimacs_file(A, p)
    B = ctio.read_dimacs_file(p)
    np.testing.assert_allclose(dense_of(B), dense_of(A), rtol=1e-6)


def test_poisson5pt_structure():
    A = gallery.poisson5pt(3, 3, format="coo")
    d = dense_of(A)
    # interior point (1,1) -> linear index 1 + 3*1 = 4 (dim0 fastest)
    assert d[4, 4] == 4
    assert d[4, 3] == -1 and d[4, 5] == -1   # ±1 in fast dim
    assert d[4, 1] == -1 and d[4, 7] == -1   # ±1 in slow dim
    # corner keeps only in-grid neighbors
    assert d[0, 0] == 4
    assert np.count_nonzero(d[0]) == 3


def test_poisson_variants_are_spd_shapes():
    for A, n in [(gallery.poisson9pt(4, 5), 20),
                 (gallery.poisson7pt(3, 4, 5), 60),
                 (gallery.poisson27pt(3, 3, 3), 27)]:
        assert A.shape == (n, n)
        d = dense_of(A)
        np.testing.assert_allclose(d, d.T)


def test_grid_and_diffusion():
    G = gallery.grid2d(4, 4)
    d = dense_of(G)
    np.testing.assert_allclose(d, d.T)
    assert d.diagonal().sum() == 0
    D = gallery.diffusion(6, 6, eps=1e-3, theta=np.pi / 6, method=gallery.FE)
    assert D.shape == (36, 36)
    D2 = gallery.diffusion(6, 6, eps=1e-3, theta=np.pi / 6, method=gallery.FD)
    assert not np.allclose(dense_of(D), dense_of(D2))


def test_random_gallery():
    A = gallery.random(30, 40, 100)
    assert A.shape == (30, 40)
    assert 0 < A.nnz <= 100
    # deterministic for same parameters
    B = gallery.random(30, 40, 100)
    np.testing.assert_array_equal(dense_of(A), dense_of(B))


def test_ktt_generators():
    A = gallery.make_diagonal_matrix(10, 10, [-2, 0, 3])
    assert A.format == "dia"
    d = dense_of(A)
    np.testing.assert_array_equal(np.diag(d, -2), np.ones(8))
    np.testing.assert_array_equal(np.diag(d, 0), np.ones(10))
    np.testing.assert_array_equal(np.diag(d, 3), np.ones(7))
    assert A.nnz == 8 + 10 + 7

    B = gallery.make_diagonal_symmetric_matrix(64, 64, 2, 5)
    assert B.offsets == (-4, -2, 0, 2, 4)

    with pytest.raises(ct.InvalidInputException):
        gallery.make_diagonal_matrix(4, 4, [10])


def test_cusp_binary_roundtrip():
    """The reference wire format (cusp/io/detail/binary.inl:42-104):
    3 x size_t header + raw index/value arrays."""
    import struct
    from cusp_autotuned_tpu.io.binary import (
        write_cusp_binary_file, read_cusp_binary_file)
    A = gallery.poisson5pt(9, 11, format="coo", dtype=np.float32)
    path = "/tmp/_cusp_bin_test.bin"
    write_cusp_binary_file(A, path)
    # byte-level check of the header layout
    with open(path, "rb") as f:
        m, n, nnz = struct.unpack("<QQQ", f.read(24))
    assert (m, n, nnz) == (A.num_rows, A.num_cols, A.nnz)
    B = read_cusp_binary_file(path, format="csr")
    from cusp_autotuned_tpu.backend.reference import to_scipy
    assert (to_scipy(A) != to_scipy(B)).nnz == 0


def test_williams_suite_generators():
    from cusp_autotuned_tpu.gallery.suite import williams_suite, stencil_suite
    suite = williams_suite(scale=0.1)
    assert len(suite) == 14
    assert suite["LP"].shape[0] != suite["LP"].shape[1]   # rectangular
    deg = np.diff(suite["Webbase"].indptr)
    assert deg.max() > 50 * deg.mean()                    # hub tail
    st = stencil_suite(scale=0.02)
    assert len(st) == 5

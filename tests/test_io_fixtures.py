"""Wire-format parity against the REFERENCE's I/O fixture zoo.

Every file here was written by (or for) the C++ library's own test suite —
none was produced by this rebuild — so reading them proves interop with
the reference's on-disk formats, not just self round-trips
(parity: /root/reference/testing/{matrix_market,binary,dimacs}.cu over
/root/reference/testing/data/).
"""

import glob
import os

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from cusp_autotuned_tpu import io as ct_io
from cusp_autotuned_tpu.backend.reference import to_scipy

DATA = "/root/reference/testing/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixture zoo not present")


def _dense(A):
    S = to_scipy(A)
    return S.toarray() if sp.issparse(S) else np.asarray(S)


# the 5x5 matrix every coordinate_real_general.* fixture encodes
# (hand-coded expectation in testing/binary.cu:23-49 / dimacs.cu:24-50)
E5 = np.zeros((5, 5), np.float64)
E5[0, 0] = 1.0
E5[0, 3] = 6.0
E5[1, 1] = 10.5
E5[2, 2] = 0.25
E5[3, 1] = 250.5
E5[3, 3] = -250.0
E5[3, 4] = 38.75
E5[4, 4] = 12.0


def _mtx_fixtures():
    pats = [os.path.join(DATA, "test", "*.mtx"),
            os.path.join(DATA, "laplacian", "*.mtx"),
            os.path.join(DATA, "random_10x10", "*.mtx")]
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(p)))
    return out


@pytest.mark.parametrize("path", _mtx_fixtures(),
                         ids=lambda p: os.path.relpath(p, DATA))
def test_matrix_market_fixture_zoo(path):
    """Every reference .mtx fixture (coordinate/array x real/complex/
    pattern x general/symmetric, the laplacian stencils, and the 0-100%%
    density sweep) reads into the rebuild and matches scipy's independent
    MatrixMarket parser (parity: testing/matrix_market.cu)."""
    ref = sio.mmread(path)
    ref = ref.toarray() if sp.issparse(ref) else np.asarray(ref)
    is_complex = np.iscomplexobj(ref)
    A = ct_io.read_matrix_market_file(
        path, format="coo",
        dtype=np.complex64 if is_complex else np.float32)
    got = _dense(A)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fmt", ["coo", "csr", "hyb"])
def test_cusp_binary_fixture(fmt):
    """The raw-binary fixture written in the reference's wire layout
    (3x size_t header + int32 rows + int32 cols + f32 values,
    cusp/io/detail/binary.inl:42-104) reads byte-for-byte into any
    format (parity: testing/binary.cu TestReadBinaryFile*)."""
    path = os.path.join(DATA, "test", "coordinate_real_general.bin")
    A = ct_io.read_cusp_binary_file(path, format=fmt)
    np.testing.assert_allclose(_dense(A), E5, rtol=1e-6)


def test_cusp_binary_matches_mtx_twin():
    """The .bin and .mtx fixtures encode the same matrix; the two readers
    must agree exactly."""
    Ab = ct_io.read_cusp_binary_file(
        os.path.join(DATA, "test", "coordinate_real_general.bin"))
    Am = ct_io.read_matrix_market_file(
        os.path.join(DATA, "test", "coordinate_real_general.mtx"))
    np.testing.assert_allclose(_dense(Ab), _dense(Am), rtol=1e-6)


def test_cusp_binary_roundtrip_wire_bytes():
    """Writing the fixture matrix back through write_cusp_binary_file
    reproduces the reference's byte stream exactly (entries are already
    (row, col)-sorted in the fixture)."""
    path = os.path.join(DATA, "test", "coordinate_real_general.bin")
    A = ct_io.read_cusp_binary_file(path)
    out = "/tmp/_cusp_wire_roundtrip.bin"
    ct_io.write_cusp_binary_file(A, out)
    with open(path, "rb") as f:
        ref_bytes = f.read()
    with open(out, "rb") as f:
        got_bytes = f.read()
    assert got_bytes == ref_bytes


@pytest.mark.parametrize("fmt", ["coo", "csr"])
def test_dimacs_fixture(fmt):
    """The dimacs fixture reads with correct entries AND terminals
    (source=0, sink=3 — parity: testing/dimacs.cu:52-53)."""
    path = os.path.join(DATA, "test", "coordinate_real_general.dimacs")
    A, (src, snk) = ct_io.read_dimacs_file(path, format=fmt,
                                           return_terminals=True)
    np.testing.assert_allclose(_dense(A), E5, rtol=1e-6)
    assert (src, snk) == (0, 3)


def test_dimacs_writer_reads_back_with_reference_problem_line():
    """The writer emits the reference's 'p max' problem line
    (cusp/io/detail/dimacs.inl:160) and round-trips."""
    path = os.path.join(DATA, "test", "coordinate_real_general.dimacs")
    A = ct_io.read_dimacs_file(path)
    out = "/tmp/_dimacs_roundtrip.dimacs"
    ct_io.write_dimacs_file(A, out)
    with open(out) as f:
        first = f.readline()
    assert first.startswith("p max 5 8")
    A2 = ct_io.read_dimacs_file(out)
    np.testing.assert_allclose(_dense(A2), E5, rtol=1e-6)


def test_mtx_writer_roundtrip_via_scipy_on_fixture():
    """A fixture read + rewritten by this library parses under scipy's
    independent reader to the same matrix (writer wire parity)."""
    path = os.path.join(DATA, "laplacian", "5pt_10x10.mtx")
    A = ct_io.read_matrix_market_file(path)
    out = "/tmp/_mm_roundtrip.mtx"
    ct_io.write_matrix_market_file(A, out)
    ref = sio.mmread(path).toarray()
    got = sio.mmread(out)
    got = got.toarray() if sp.issparse(got) else np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_dimacs_plain_node_lines_are_ignored():
    """Non-max-flow DIMACS variants carry 'n <vertex>' node lines without
    an s/t flag; the reader must skip them, not raise (review finding)."""
    import io as _io
    txt = "p asn 4 2\nn 1\nn 2\na 1 2 1.0\na 3 4 2.0\n"
    A, (s, t) = ct_io.read_dimacs_stream(_io.StringIO(txt),
                                         return_terminals=True)
    assert (s, t) == (-1, -1)
    assert A.num_rows == 4 and A.nnz == 2

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu import formats as F
from tests.util import ALL_FORMATS, build, dense_of, example_matrices


@pytest.mark.parametrize("fmt", ALL_FORMATS)
@pytest.mark.parametrize("name", list(example_matrices()))
def test_scipy_roundtrip(fmt, name):
    S = example_matrices()[name]
    if fmt == "dia" and name == "rand50x40":
        pytest.skip("unstructured matrix not meaningful in DIA")
    A = build(S, fmt)
    assert A.shape == S.shape
    np.testing.assert_allclose(dense_of(A), S.todense(), rtol=1e-6)


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_pytree_roundtrip(fmt):
    S = example_matrices()["tri37"]
    A = build(S, fmt)
    leaves, treedef = jax.tree_util.tree_flatten(A)
    B = jax.tree_util.tree_unflatten(treedef, leaves)
    assert type(B) is type(A)
    np.testing.assert_array_equal(dense_of(A), dense_of(B))


def test_coo_padding_and_sort():
    row = [3, 0, 1, 0]
    col = [1, 2, 0, 0]
    val = [1.0, 2.0, 3.0, 4.0]
    A = F.coo_matrix(row, col, val, (4, 3))
    assert A.nnz == 4
    assert A.nnz_padded % 128 == 0
    assert A.is_sorted_by_row_and_column()
    r = np.asarray(A.row)
    assert np.all(r[A.nnz:] == 4)  # padding = num_rows


def test_coo_sum_duplicates():
    # reference idiom: examples/MatrixAssembly/unordered_triplets.cu
    I = [2, 0, 1, 2, 1, 0, 2, 0, 1, 0]
    J = [0, 2, 1, 0, 1, 0, 2, 0, 0, 0]
    V = [10.0] * 10
    A = F.coo_matrix(I, J, V, (3, 3), sum_duplicates=True)
    assert A.nnz == 6
    D = np.zeros((3, 3))
    for i, j, v in zip(I, J, V):
        D[i, j] += v
    np.testing.assert_array_equal(dense_of(A), D)
    with pytest.raises(ValueError):
        F.coo_matrix(I, J, V, (3, 3), sort=False, sum_duplicates=True)


def test_ell_layout():
    S = example_matrices()["tri37"]
    A = build(S, "ell")
    assert A.rows_padded % 128 == 0
    assert A.width == 3
    # padding slots hold the invalid sentinel
    colp = np.asarray(A.col)[:, 37:]
    assert np.all(colp == F.INVALID_INDEX)


def test_ellr_row_lengths():
    S = example_matrices()["widerow"]
    A = build(S, "ellr")
    rl = np.asarray(A.row_lengths)
    expect = np.diff(S.tocsr().indptr)
    np.testing.assert_array_equal(rl[:10], expect)
    assert np.all(rl[10:] == 0)


def test_dia_static_offsets():
    S = example_matrices()["tri37"]
    A = build(S, "dia")
    assert A.offsets == (-1, 0, 1)
    assert isinstance(A.offsets, tuple)


def test_hyb_split():
    S = example_matrices()["widerow"]
    A = build(S, "hyb")
    assert A.ell.nnz + A.coo.nnz == S.nnz
    # the 25-long row must spill into the COO part
    assert A.coo.nnz > 0


def test_permutation():
    P = F.permutation_matrix([2, 0, 1])
    x = np.array([10.0, 20.0, 30.0])
    y = ct.multiply(P, x)
    np.testing.assert_array_equal(np.asarray(y), [30.0, 10.0, 20.0])


def test_matmul_operator():
    S = example_matrices()["tri37"]
    A = build(S, "csr")
    x = np.arange(37, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(A @ x), S @ x, rtol=1e-5)


# -- dense containers (pitched array2d / array1d views) -------------------------

def test_array2d_pitch_lane_aligned():
    A = F.array2d(5, 7, fill=2.0)
    assert A.shape == (5, 7)
    assert A.pitch == 128                      # lane-aligned default
    assert A.values.shape == (5, 128)
    np.testing.assert_array_equal(np.asarray(A.to_dense()),
                                  np.full((5, 7), 2.0, np.float32))


def test_array2d_orientation_and_views():
    src = np.arange(12, dtype=np.float32).reshape(3, 4)
    for orient in ("c", "f"):
        A = F.Array2d.from_dense(src, orientation=orient)
        np.testing.assert_array_equal(np.asarray(A.to_dense()), src)
        np.testing.assert_array_equal(np.asarray(A.row(1)), src[1])
        np.testing.assert_array_equal(np.asarray(A.column(2)), src[:, 2])
        assert A[2, 3] == src[2, 3]
    # O(1) transpose flips orientation
    At = F.Array2d.from_dense(src).T
    assert At.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(At.to_dense()), src.T)


def test_array2d_custom_pitch_and_view_wrap():
    src = np.ones((4, 5), np.float32)
    A = F.Array2d.from_dense(src, pitch=8)
    assert A.pitch == 8
    V = F.make_array2d_view(A.values, 4, 5)
    np.testing.assert_array_equal(np.asarray(V.to_dense()), src)
    with pytest.raises(ValueError):
        F.make_array2d_view(A.values, 4, 9)    # minor exceeds pitch


def test_array2d_pytree_jit():
    import jax

    A = F.Array2d.from_dense(np.eye(3, dtype=np.float32) * 4)

    @jax.jit
    def trace(M):
        return jnp.trace(M.to_dense())

    assert float(trace(A)) == 12.0


def test_array2d_convert_and_matmul():
    src = np.diag([1.0, 2.0, 3.0]).astype(np.float32)
    A = F.Array2d.from_dense(src)
    C = ct.convert(A, "csr")
    assert C.nnz == 3
    y = A @ np.ones(3, np.float32)
    np.testing.assert_allclose(np.asarray(y), [1, 2, 3])


def test_array1d_view():
    v = F.array1d(10, fill=1.5)
    assert v.shape == (10,)
    w = F.array1d_view(np.arange(10.0), start=2, stop=9, stride=3)
    np.testing.assert_array_equal(np.asarray(w), [2.0, 5.0, 8.0])


# -- value-dtype breadth (parity: DECLARE_VARIABLE_UNITTEST's 7 dtypes,
#    testframework.h:187-206 — int and float value types) ---------------------

@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32,
                                   np.float64])
@pytest.mark.parametrize("fmt", ["coo", "csr", "ell", "hyb"])
def test_value_dtype_roundtrip_and_spmv(dtype, fmt):
    import scipy.sparse as sp
    rng = np.random.RandomState(31)
    S = sp.random(60, 60, density=0.08, random_state=rng)
    S = sp.coo_matrix((np.round(S.data * 10).astype(dtype) + 1,
                       (S.row, S.col)), shape=S.shape)
    A = build(S, fmt)
    assert np.dtype(A.dtype) == np.dtype(dtype)
    np.testing.assert_array_equal(dense_of(A), S.todense())
    x = np.arange(60).astype(dtype)
    y = np.asarray(ct.multiply(A, x))
    np.testing.assert_allclose(y, S @ x, rtol=1e-6, atol=1e-6)

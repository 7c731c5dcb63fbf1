import io

import numpy as np
import jax.numpy as jnp
import pytest

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu.ops import blas, format_utils
from cusp_autotuned_tpu.ops.transpose import transpose
from cusp_autotuned_tpu.ops.elementwise import add, subtract, elementwise
from cusp_autotuned_tpu.ops.sort import sort_by_row_and_column, counting_sort_by_key
from cusp_autotuned_tpu.ops.verify import (
    is_valid_matrix, assert_is_valid_matrix, assert_same_dimensions,
)
from cusp_autotuned_tpu.ops.printing import print_matrix, spy
from tests.util import ALL_FORMATS, build, dense_of, example_matrices


@pytest.mark.parametrize("fmt", ALL_FORMATS)
@pytest.mark.parametrize("name", ["small4x4", "rect3x5", "widerow"])
def test_transpose(fmt, name):
    S = example_matrices()[name]
    A = build(S, fmt)
    At = transpose(A)
    np.testing.assert_allclose(dense_of(At), S.T.todense(), rtol=1e-6)


@pytest.mark.parametrize("fmt", ["coo", "csr", "ell"])
def test_elementwise(fmt):
    S1 = example_matrices()["small4x4"]
    S2 = example_matrices()["small4x4"].T.tocoo()
    A, B = build(S1, fmt), build(S2, fmt)
    np.testing.assert_allclose(dense_of(add(A, B)),
                               (S1 + S2).todense(), rtol=1e-6)
    np.testing.assert_allclose(dense_of(subtract(A, B)),
                               (S1 - S2).todense(), rtol=1e-6)
    C = elementwise(A, B, np.maximum)
    np.testing.assert_allclose(
        dense_of(C), np.maximum(np.asarray(S1.todense()),
                                np.asarray(S2.todense())), rtol=1e-6)


@pytest.mark.parametrize("fa", ["coo", "csr", "dia"])
@pytest.mark.parametrize("fb", ["coo", "csr", "ell"])
def test_spgemm(fa, fb):
    S1 = example_matrices()["rect3x5"]
    S2 = example_matrices()["rect3x5"].T.tocoo()
    A, B = build(S1, fa), build(S2, fb)
    C = ct.multiply(A, B)
    np.testing.assert_allclose(dense_of(C), (S1 @ S2).todense(),
                               rtol=1e-5, atol=1e-6)


def test_spgemm_large_random():
    import scipy.sparse as sp
    rng = np.random.RandomState(5)
    S1 = sp.random(120, 90, density=0.05, random_state=rng).astype(np.float32)
    S2 = sp.random(90, 150, density=0.05, random_state=rng).astype(np.float32)
    C = ct.multiply(build(S1, "csr"), build(S2, "csr"))
    np.testing.assert_allclose(dense_of(C), (S1 @ S2).todense(),
                               rtol=1e-4, atol=1e-5)


def test_generalized_spgemm_min_plus():
    S1 = example_matrices()["small4x4"]
    A = build(S1, "coo")
    C = ct.generalized_spgemm(A, A, None, lambda a, b: a + b, min)
    # oracle
    D = np.asarray(S1.todense())
    n = 4
    expect = np.full((n, n), np.inf)
    for i in range(n):
        for k in range(n):
            if D[i, k] == 0:
                continue
            for j in range(n):
                if D[k, j] == 0:
                    continue
                expect[i, j] = min(expect[i, j], D[i, k] + D[k, j])
    got = dense_of(C)
    mask = np.isfinite(expect)
    np.testing.assert_allclose(got[mask], expect[mask], rtol=1e-6)


def test_format_utils_roundtrip():
    S = example_matrices()["rand50x40"]
    A = build(S, "csr")
    rows = format_utils.offsets_to_indices(A.indptr, A.nnz_padded)
    back = format_utils.indices_to_offsets(rows, A.num_rows)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(A.indptr))


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_extract_diagonal(fmt):
    S = example_matrices()["small4x4"]
    A = build(S, fmt)
    d = format_utils.extract_diagonal(A)
    np.testing.assert_allclose(np.asarray(d),
                               np.asarray(S.todense()).diagonal(), rtol=1e-6)


def test_count_diagonals():
    S = example_matrices()["tri37"]
    assert format_utils.count_diagonals(37, 37, S.row, S.col) == 3


def test_sorting():
    row = jnp.array([2, 0, 1, 0], jnp.int32)
    col = jnp.array([1, 2, 0, 0], jnp.int32)
    val = jnp.array([1.0, 2.0, 3.0, 4.0])
    r, c, v = sort_by_row_and_column(row, col, val)
    np.testing.assert_array_equal(np.asarray(r), [0, 0, 1, 2])
    np.testing.assert_array_equal(np.asarray(c), [0, 2, 0, 1])
    np.testing.assert_array_equal(np.asarray(v), [4.0, 2.0, 3.0, 1.0])
    k, p = counting_sort_by_key(jnp.array([3, 1, 2]), jnp.array([30, 10, 20]))
    np.testing.assert_array_equal(np.asarray(p), [10, 20, 30])


def test_verify():
    S = example_matrices()["small4x4"]
    for fmt in ALL_FORMATS:
        A = build(S, fmt)
        assert is_valid_matrix(A)
        assert_is_valid_matrix(A)
    # corrupt a CSR
    A = build(S, "csr")
    import dataclasses
    bad = dataclasses.replace(A, indptr=A.indptr.at[0].set(1))
    assert not is_valid_matrix(bad)
    with pytest.raises(ct.InvalidInputException):
        assert_is_valid_matrix(bad)
    with pytest.raises(ct.InvalidInputException):
        assert_same_dimensions(build(S, "coo"),
                               build(example_matrices()["rect3x5"], "coo"))


def test_print_and_spy():
    S = example_matrices()["small4x4"]
    A = build(S, "coo")
    buf = io.StringIO()
    print_matrix(A, buf)
    out = buf.getvalue()
    assert "sparse matrix <4, 4> with 9 entries" in out
    buf = io.StringIO()
    spy(A, buf)
    assert "*" in buf.getvalue()


def test_blas_suite():
    rng = np.random.RandomState(0)
    x = rng.randn(16).astype(np.float32)
    y = rng.randn(16).astype(np.float32)
    np.testing.assert_allclose(float(blas.dot(x, y)), x @ y, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(blas.axpy(x, y, 2.0)), 2 * x + y,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(blas.axpby(x, y, 2.0, 3.0)),
                               2 * x + 3 * y, rtol=1e-5)
    np.testing.assert_allclose(float(blas.nrm2(x)), np.linalg.norm(x),
                               rtol=1e-5)
    np.testing.assert_allclose(float(blas.nrm1(x)), np.abs(x).sum(), rtol=1e-5)
    np.testing.assert_allclose(float(blas.nrmmax(x)), np.abs(x).max(),
                               rtol=1e-5)
    assert int(blas.amax(x)) == int(np.argmax(np.abs(x)))
    A = rng.randn(8, 8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(blas.gemv(A, x[:8])), A @ x[:8],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(blas.gemm(A, A)), A @ A, rtol=1e-4)
    L = np.tril(A) + 8 * np.eye(8, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(blas.trsv(L, x[:8], lower=True)),
                               np.linalg.solve(L, x[:8]), rtol=1e-3)


def test_lapack_suite():
    from cusp_autotuned_tpu.ops import lapack
    rng = np.random.RandomState(1)
    A = rng.randn(10, 10)
    A = A @ A.T + 10 * np.eye(10)
    b = rng.randn(10)
    np.testing.assert_allclose(np.asarray(lapack.gesv(A, b)),
                               np.linalg.solve(A, b), rtol=1e-8)
    L = lapack.potrf(A, lower=True)
    np.testing.assert_allclose(np.asarray(lapack.potrs(L, b, lower=True)),
                               np.linalg.solve(A, b), rtol=1e-8)
    w, v = lapack.syev(A)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(A), rtol=1e-8)
    alphas = np.array([2.0, 2.0, 2.0])
    betas = np.array([-1.0, -1.0])
    w, v = lapack.stev(alphas, betas)
    T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(T), rtol=1e-8)


def test_lapack_sytrf_indefinite_and_stsv():
    """sytrf is a real Bunch-Kaufman factorization (host LAPACK, the
    reference's own binding) — it must solve an INDEFINITE symmetric
    system; stsv solves tridiagonal in O(n) without densifying."""
    from cusp_autotuned_tpu.ops import lapack
    rng = np.random.RandomState(7)
    A = rng.randn(16, 16)
    A = (A + A.T) / 2                        # indefinite
    b = rng.randn(16)
    fact = lapack.sytrf(A)
    x = np.asarray(lapack.sytrs(fact, b))
    np.testing.assert_allclose(A @ x, b, rtol=2e-4, atol=2e-4)
    assert fact[0] == "bk"                   # not a plain LU fallback
    n = 200
    al = rng.rand(n) + 2.0
    be = rng.rand(n - 1) * 0.5
    T = np.diag(al) + np.diag(be, 1) + np.diag(be, -1)
    b1 = rng.randn(n)
    x1 = np.asarray(lapack.stsv(al, be, b1))
    np.testing.assert_allclose(T @ x1, b1, rtol=2e-4, atol=2e-4)
    B = rng.randn(n, 3)
    X = np.asarray(lapack.stsv(al, be, B))
    np.testing.assert_allclose(T @ X, B, rtol=2e-4, atol=2e-4)


def test_iterator_utils():
    from cusp_autotuned_tpu.ops import iterator_utils as it
    np.testing.assert_array_equal(np.asarray(it.counting_array(4, 2)),
                                  [2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(it.constant_array(3, 7.0)),
                                  [7.0, 7.0, 7.0])
    np.testing.assert_array_equal(
        np.asarray(it.join(jnp.array([1, 2]), jnp.array([3]))), [1, 2, 3])
    np.testing.assert_array_equal(
        np.asarray(it.strided(jnp.arange(10), 3)), [0, 3, 6, 9])
    r1 = np.asarray(it.random_array(16, seed=1))
    r2 = np.asarray(it.random_array(16, seed=1))
    np.testing.assert_array_equal(r1, r2)       # deterministic
    assert np.all((r1 >= 0) & (r1 < 1))


def test_spy_svg(tmp_path):
    from cusp_autotuned_tpu.ops.printing import spy_svg
    S = example_matrices()["tri37"]
    A = build(S, "coo")
    p = tmp_path / "spy.svg"
    spy_svg(A, p)
    content = p.read_text()
    assert content.startswith("<svg") and "circle" in content


def test_spy_plot(tmp_path):
    from cusp_autotuned_tpu.ops.printing import spy_plot
    S = example_matrices()["tri37"]
    A = build(S, "coo")
    p = tmp_path / "spy.png"
    fig = spy_plot(A, p)
    if fig is None:                      # matplotlib optional
        pytest.skip("matplotlib unavailable")
    assert p.stat().st_size > 0


def test_monitor_verbose(capsys):
    from cusp_autotuned_tpu.solvers import Monitor
    b = np.array([3.0, 4.0])
    m = Monitor(b, iteration_limit=5, relative_tolerance=0.1, verbose=True)
    m.finished(np.array([1.0, 0.0]))
    m.finished(np.array([0.1, 0.0]))
    out = capsys.readouterr().out
    assert "Iteration Number" in out
    assert "converged" in out


def test_generalized_spgemm_min_plus_10k_device():
    """The semiring path runs the same sliced device ESC as plain SpGEMM
    (no host dict loop) — a 10k-row min-plus product finishes in device
    time (parity: cusp/detail/multiply.inl:114-151)."""
    import time
    import scipy.sparse as sp
    rng = np.random.RandomState(5)
    n = 10_000
    S = (sp.random(n, n, density=3e-4, random_state=rng)
         + sp.eye(n)).tocsr().astype(np.float64)
    A = build(S.tocoo(), "coo")
    t0 = time.perf_counter()
    C = ct.generalized_spgemm(A, A, None, lambda a, b: a + b, min)
    elapsed = time.perf_counter() - t0
    assert elapsed < 60.0, f"semiring SpGEMM took {elapsed:.1f}s"
    Cs = ct.backend.reference.to_scipy(C).tocsr()
    # oracle on a random sample of rows via dense min-plus
    rows = rng.choice(n, 5, replace=False)
    D = np.asarray(S.todense())
    for i in rows:
        ks = np.nonzero(D[i])[0]
        exp = np.full(n, np.inf)
        for k in ks:
            js = np.nonzero(D[k])[0]
            exp[js] = np.minimum(exp[js], D[i, k] + D[k, js])
        got = np.full(n, np.inf)
        got[Cs[i].indices] = Cs[i].data
        finite = np.isfinite(exp)
        np.testing.assert_allclose(got[finite], exp[finite], rtol=1e-10)
        assert not np.isfinite(got[~finite]).any()


def test_spgemm_device_resident_single_slice():
    # single-slice products return a device-resident padded COO (only the
    # segment-count scalar syncs); result matches scipy exactly
    import scipy.sparse as sp
    from cusp_autotuned_tpu.ops.spgemm import spgemm
    from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy
    rng = np.random.RandomState(21)
    S1 = sp.random(80, 60, density=0.08, random_state=rng).tocsr()
    S2 = sp.random(60, 90, density=0.08, random_state=rng).tocsr()
    A = from_scipy(S1.tocoo(), "coo")
    B = from_scipy(S2.tocoo(), "coo")
    C = spgemm(A, B)
    assert C.format == "coo"
    assert not hasattr(C, "_host_coo")      # built from device arrays
    ref = (S1 @ S2).tocoo()
    got = to_scipy(C).tocoo()
    np.testing.assert_allclose(got.toarray(), ref.toarray(), rtol=1e-5,
                               atol=1e-6)
    # padding rows carry the out-of-range row id (COO convention)
    r = np.asarray(C.row)
    assert np.all(r[C.nnz:] == C.shape[0])


def test_spgemm_multi_slice_workspace(monkeypatch):
    # force the sliced path (workspace cap below one slice's expansion) and
    # check the cross-slice duplicate merge against scipy
    import scipy.sparse as sp
    import cusp_autotuned_tpu.ops.spgemm as SG
    from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy
    rng = np.random.RandomState(77)
    S1 = sp.random(120, 90, density=0.15, random_state=rng).tocsr()
    S2 = sp.random(90, 110, density=0.15, random_state=rng).tocsr()
    monkeypatch.setattr(SG, "MAX_WORKSPACE", 512)
    # transfer guard: the sliced path must never pull an O(nnz) array to
    # the host (parity: spgemm.h:229-257 slices within device memory) —
    # only Python-int scalar syncs are allowed
    import jax

    real_asarray = np.asarray
    big_pulls = []

    # O(num_rows) planning metadata (B's indptr) may cross; O(nnz) may not
    limit = max(S1.shape + S2.shape) + 1

    def guarded(a, *args, **kw):
        if isinstance(a, jax.Array) and getattr(a, "size", 0) > limit:
            big_pulls.append(a.shape)
        return real_asarray(a, *args, **kw)

    monkeypatch.setattr(np, "asarray", guarded)
    C = SG.spgemm(from_scipy(S1.tocoo(), "coo"), from_scipy(S2.tocoo(), "coo"))
    monkeypatch.setattr(np, "asarray", real_asarray)
    assert not big_pulls, f"host pulls in sliced spgemm: {big_pulls}"
    import jax.numpy as jnp
    assert isinstance(C.row, jax.Array)     # device-resident result
    ref = (S1 @ S2).tocoo()
    np.testing.assert_allclose(to_scipy(C).toarray(), ref.toarray(),
                               rtol=1e-5, atol=1e-6)
    r = np.asarray(C.row)
    assert np.all(r[C.nnz:] == C.shape[0])  # padded sorted COO convention


def test_spgemm_multi_slice_semiring(monkeypatch):
    import scipy.sparse as sp
    import cusp_autotuned_tpu.ops.spgemm as SG
    from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy
    rng = np.random.RandomState(78)
    S1 = sp.random(60, 60, density=0.2, random_state=rng).tocsr()
    S2 = sp.random(60, 60, density=0.2, random_state=rng).tocsr()
    monkeypatch.setattr(SG, "MAX_WORKSPACE", 256)
    C = SG.spgemm(from_scipy(S1.tocoo(), "coo"), from_scipy(S2.tocoo(), "coo"),
                  combine=np.add, reduce=np.minimum)
    # oracle: min-plus over explicit entries
    import collections
    acc = {}
    S1c, S2c = S1.tocoo(), S2.tocsr()
    for r, c1, v in zip(S1c.row, S1c.col, S1c.data):
        lo, hi = S2c.indptr[c1], S2c.indptr[c1 + 1]
        for c2, v2 in zip(S2c.indices[lo:hi], S2c.data[lo:hi]):
            k = (r, c2)
            t = v + v2
            acc[k] = min(acc[k], t) if k in acc else t
    got = to_scipy(C).tocoo()
    gotd = {(r, c): v for r, c, v in zip(got.row, got.col, got.data)}
    assert set(gotd) == set(acc)
    for k in acc:
        np.testing.assert_allclose(gotd[k], acc[k], rtol=1e-5)


def test_functional_parity():
    from cusp_autotuned_tpu.ops import functional as fn
    x = np.array([1.0, 4.0, 9.0])
    np.testing.assert_allclose(np.asarray(fn.divide_value(2.0)(x)), x / 2)
    np.testing.assert_allclose(
        np.asarray(fn.modulus_value(3)(np.array([4, 5, 6]))), [1, 2, 0])
    a, b = (x, x * 2), (x * 3, x * 4)
    s = fn.sum_pair(a, b)
    np.testing.assert_allclose(np.asarray(s[0]), x * 4)
    np.testing.assert_allclose(np.asarray(fn.constant_functor(7.0)(x)),
                               np.full(3, 7.0))
    v = fn.valid_index(5)(np.array([-1, 0, 4, 5]))
    np.testing.assert_array_equal(np.asarray(v), [False, True, True, False])


def test_jsparse_vendor_adapter():
    """BCOO round trip + vendor SpMV baseline (parity: the reference's
    cusparse adapter paths, cusp/system/cuda/detail/cusparse/)."""
    import jax
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.backend.jsparse import (to_bcoo, from_bcoo,
                                                    bcoo_spmv)
    from cusp_autotuned_tpu.backend.reference import to_scipy
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    A = gallery.poisson5pt(20, 20, format="csr", dtype=np.float32)
    M = to_bcoo(A)
    B = from_bcoo(M, "csr")
    np.testing.assert_allclose(to_scipy(B).toarray(),
                               to_scipy(A).toarray(), rtol=1e-6)
    x = np.linspace(-1, 1, A.num_cols).astype(np.float32)
    y = np.asarray(jax.jit(bcoo_spmv(A))(x))
    np.testing.assert_allclose(y, to_scipy(A) @ x, rtol=1e-5, atol=1e-5)
    fn = build_spmv(A, {"impl": "bcoo"})
    np.testing.assert_allclose(np.asarray(fn(x)), to_scipy(A) @ x,
                               rtol=1e-5, atol=1e-5)

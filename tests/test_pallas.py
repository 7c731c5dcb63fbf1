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


def test_dia_auto_block_rows():
    # block_rows omitted (or 0) → VMEM-budget-fitting auto choice; the
    # builder must stay correct through it
    A = gallery.make_diagonal_symmetric_matrix(3000, 3000, 7, 9)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(A.num_cols).astype(np.float32))
    ref = reference_spmv(A, np.asarray(x))
    for cfg in ({}, {"block_rows": 0}):
        y = np.asarray(jax.jit(build_dia(A, cfg, interpret=True))(x))
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_dia_auto_block_rows_bounds():
    from cusp_autotuned_tpu.kernels.pallas_dia import (
        MIN_BLOCK_ROWS, MAX_BLOCK_ROWS, _auto_block_rows)
    for k in (1, 5, 27, 200):
        for rows in (1024, 65536, 4_000_000):
            for itemsize in (2, 4):
                br = _auto_block_rows(k, rows, itemsize)
                assert br % MIN_BLOCK_ROWS == 0
                assert MIN_BLOCK_ROWS <= br <= MAX_BLOCK_ROWS
    # small k + big matrix hits the cap; huge k falls back to the min tile
    assert _auto_block_rows(5, 4_000_000, 4) == MAX_BLOCK_ROWS
    assert _auto_block_rows(2000, 4_000_000, 4) == MIN_BLOCK_ROWS


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


# -- lane-binned kernels (binned / colsort) -----------------------------------

def _check_binned(S, builder_name, fmt="csr", **cfg):
    from cusp_autotuned_tpu.kernels import (
        pallas_binned, pallas_colsort, pallas_colsort2, pallas_routed,
    )
    A = from_scipy(S.tocoo(), fmt)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(A.num_cols).astype(np.float32))
    mod = {"build_binned": pallas_binned, "build_colsort": pallas_colsort,
           "build_colsort2": pallas_colsort2,
           "build_routed": pallas_routed}[builder_name]
    build = getattr(mod, builder_name)
    fn = build(A, cfg, interpret=True)
    y = np.asarray(jax.jit(fn)(x))
    ref = reference_spmv(A, np.asarray(x))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def _powerlaw(n, nnz, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(1.7, n).astype(np.int64), n // 2)
    deg = np.maximum(deg * nnz // max(1, deg.sum()), 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    return sp.coo_matrix(
        (rng.standard_normal(rows.size), (rows, cols)), shape=(n, n)).tocsr()


@pytest.mark.parametrize("builder", ["build_binned", "build_colsort"])
def test_binned_poisson9(builder):
    _check_binned(gallery.poisson9pt(35, 35, format="csr").to_scipy(),
                  builder, block_entries=2048, col_window=1024,
                  row_window=256)


@pytest.mark.parametrize("builder", ["build_binned", "build_colsort"])
def test_binned_random(builder):
    import scipy.sparse as sp
    rng = np.random.RandomState(11)
    S = sp.random(600, 600, density=0.01, random_state=rng).tocsr() + sp.eye(600)
    _check_binned(S, builder, block_entries=512, col_window=1024,
                  row_window=256)


@pytest.mark.parametrize("builder", ["build_binned", "build_colsort"])
def test_binned_powerlaw_hub_spill(builder):
    # hub rows exceed the lane capacity and must route through the
    # segment-sum spill path
    S = _powerlaw(800, 8000, seed=3)
    _check_binned(S, builder, block_entries=512, col_window=2048,
                  row_window=256, hub_cap=8)


@pytest.mark.parametrize("builder", ["build_binned", "build_colsort"])
def test_binned_rectangular(builder):
    import scipy.sparse as sp
    rng = np.random.RandomState(13)
    S = sp.random(300, 900, density=0.01, random_state=rng).tocsr()
    _check_binned(S, builder, block_entries=512, col_window=1024,
                  row_window=256)


@pytest.mark.parametrize("fmt", ["coo", "ell", "hyb"])
def test_binned_other_formats(fmt):
    import scipy.sparse as sp
    S = sp.diags([np.ones(499), 2 * np.ones(500), 3 * np.ones(499)],
                 [-1, 0, 1]).tocsr()
    _check_binned(S, "build_binned", fmt=fmt, block_entries=512,
                  col_window=1024, row_window=128)


@pytest.mark.parametrize("builder", ["build_binned", "build_colsort"])
def test_binned_pack16(builder):
    # int16 metadata packing (block sublanes % 16 == 0 makes it eligible)
    S = _powerlaw(900, 9000, seed=5)
    _check_binned(S, builder, block_entries=2048, col_window=2048,
                  row_window=512, hub_cap=12, pack16=True)


def test_binned_pack16_rejects_wide_window():
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    A = from_scipy(_powerlaw(400, 2000, seed=6).tocoo(), "csr")
    with pytest.raises(Exception):
        build_binned(A, {"block_entries": 2048, "col_window": 8192,
                         "row_window": 512, "pack16": True}, interpret=True)


def test_pack16_plans_are_int16():
    # guard against silently falling back to the int32 layout
    from cusp_autotuned_tpu.kernels import pallas_binned
    S = gallery.poisson5pt(40, 40, format="csr").to_scipy()
    row, col, val, shape = (S.tocoo().row.astype(np.int64),
                            S.tocoo().col.astype(np.int64),
                            S.tocoo().data.astype(np.float64),
                            S.shape)
    vals, packs, *_ = pallas_binned.plan_binned(
        row, col, val, shape, 2048, 2048, 512, 16)
    q = packs >> 24
    rel = packs & ((1 << 24) - 1)
    repacked = (q << 12) | rel
    assert repacked.max() < (1 << 15)       # fits the int16 layout


@pytest.mark.parametrize("k", [3, 16])
def test_binned_spmm(k):
    # SpMM rail: entry blocks read once, fori over the k resident columns
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    S = gallery.poisson9pt(30, 30, format="csr").to_scipy()
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(9)
    X = jnp.asarray(rng.randn(A.num_cols, k).astype(np.float32))
    fn = build_binned(A, {"block_entries": 2048, "col_window": 1024,
                          "row_window": 256}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_binned_spmm_k_chunking():
    # force a tiny VMEM budget so k=12 splits across several kernel calls
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    from cusp_autotuned_tpu.utils.config import get_config, configure
    S = gallery.poisson5pt(40, 40, format="csr").to_scipy()
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(12)
    X = jnp.asarray(rng.randn(A.num_cols, 12).astype(np.float32))
    old = get_config().vmem_budget_bytes
    try:
        # budget admits ~3 columns per chunk at this size
        configure(vmem_budget_bytes=(2 * (A.num_cols // 128 + 20) * 128 * 4))
        fn = build_binned(A, {"block_entries": 512, "col_window": 1024,
                              "row_window": 256}, interpret=True)
        Y = np.asarray(jax.jit(fn)(X))
    finally:
        configure(vmem_budget_bytes=old)
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_binned_spmm_hub_spill():
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    S = _powerlaw(500, 5000, seed=4)
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(10)
    X = jnp.asarray(rng.randn(A.num_cols, 5).astype(np.float32))
    fn = build_binned(A, {"block_entries": 512, "col_window": 2048,
                          "row_window": 256, "hub_cap": 8}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hub_rows", [8, 32])
def test_colsort_hub_rows_axis(hub_rows):
    # hub-pass rows-per-group is a tuning axis; degree-ordered grouping
    S = _powerlaw(900, 9000, seed=8)
    _check_binned(S, "build_colsort", block_entries=2048, col_window=2048,
                  row_window=512, hub_cap=10, hub_rows=hub_rows)


def test_binned_streamed_spmv():
    # forced streamed rail: aligned windows, x/y pipelined via index maps
    S = gallery.poisson9pt(40, 40, format="csr").to_scipy()
    _check_binned(S, "build_binned", block_entries=2048, col_window=1024,
                  row_window=256, stream_x=1)


def test_binned_streamed_irregular_and_spill():
    S = _powerlaw(700, 7000, seed=9)
    _check_binned(S, "build_binned", block_entries=512, col_window=2048,
                  row_window=256, hub_cap=8, stream_x=1)


def test_binned_streamed_empty_row_windows():
    import scipy.sparse as sp
    # rows 600..1199 empty: their windows are never visited by the kernel
    # and must come back masked to zero, not garbage
    S = sp.coo_matrix((np.ones(600), (np.arange(600), np.arange(600))),
                      shape=(1800, 1800)).tocsr()
    S = S + sp.coo_matrix((2 * np.ones(100),
                           (1700 + np.arange(100) % 100,
                            np.arange(100))), shape=(1800, 1800))
    _check_binned(S, "build_binned", block_entries=512, col_window=1024,
                  row_window=256, stream_x=1)


def test_binned_streamed_spmm():
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    S = gallery.poisson9pt(30, 30, format="csr").to_scipy()
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(17)
    X = jnp.asarray(rng.randn(A.num_cols, 7).astype(np.float32))
    fn = build_binned(A, {"block_entries": 2048, "col_window": 1024,
                          "row_window": 256, "stream_x": 1}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_binned_auto_streams_past_vmem_budget():
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned
    from cusp_autotuned_tpu.utils.config import get_config, configure
    S = gallery.poisson5pt(50, 50, format="csr").to_scipy()
    A = from_scipy(S.tocoo(), "csr")
    x = jnp.asarray(np.random.RandomState(1).randn(A.num_cols)
                    .astype(np.float32))
    old = get_config().vmem_budget_bytes
    try:
        configure(vmem_budget_bytes=4096)   # force the auto-stream branch
        fn = build_binned(A, {"block_entries": 512, "col_window": 512,
                              "row_window": 128}, interpret=True)
        y = np.asarray(jax.jit(fn)(x))
    finally:
        configure(vmem_budget_bytes=old)
    np.testing.assert_allclose(y, reference_spmv(A, np.asarray(x)),
                               rtol=1e-4, atol=1e-4)


def test_binned_single_dense_row():
    import scipy.sparse as sp
    # one row holding everything: all entries hub-spill
    S = sp.coo_matrix((np.ones(500), (np.zeros(500, int), np.arange(500))),
                      shape=(500, 500)).tocsr() + sp.eye(500)
    _check_binned(S, "build_binned", block_entries=512, col_window=1024,
                  row_window=128, hub_cap=16)


# -- DIA SpMM (block right-hand sides) ----------------------------------------

@pytest.mark.parametrize("k", [100, 130])
def test_dia_spmm(k):
    A = gallery.poisson5pt(40, 45, format="dia", dtype=np.float32)
    rng = np.random.RandomState(17)
    X = jnp.asarray(rng.randn(A.num_cols, k).astype(np.float32))
    fn = build_dia(A, {"block_rows": 1024}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    from cusp_autotuned_tpu.backend.reference import to_scipy
    ref = to_scipy(A).astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_dia_spmm_small_k_xla_fallback():
    """k <= 64 routes to the XLA fused path built from the SAME planned
    data arrays (measured faster there than any Pallas spelling); the
    planned operator must WORK for narrow blocks — factored AMG operators
    applied to block vectors, lobpcg, cg_m — not raise the tuner-facing
    skippable exception."""
    A = gallery.poisson5pt(40, 45, format="dia", dtype=np.float32)
    fn = build_dia(A, {"block_rows": 1024}, interpret=True)
    rng = np.random.RandomState(3)
    X = jnp.asarray(rng.randn(A.num_cols, 32).astype(np.float32))
    Y = np.asarray(fn(X))
    from cusp_autotuned_tpu.backend.reference import to_scipy
    ref = to_scipy(A).astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_dia_spmm_rectangular():
    import scipy.sparse as sp
    S = sp.diags([np.ones(300), 2 * np.ones(300), 3 * np.ones(200)],
                 [0, 150, 320], shape=(300, 520)).tocoo()
    A = from_scipy(S, "dia")
    rng = np.random.RandomState(19)
    X = jnp.asarray(rng.randn(520, 80).astype(np.float32))
    fn = build_dia(A, {"block_rows": 1024}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = S.astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_tuner_spmm_signature_and_iteration():
    """SpMM routes through the tuner with a per-k signature; SpMV-only
    variants become skippable results rather than errors."""
    from cusp_autotuned_tpu.autotune.tuner import Tuner, matrix_signature
    A = gallery.poisson5pt(20, 20, format="dia", dtype=np.float32)
    x1 = np.ones(A.num_cols, np.float32)
    x2 = np.ones((A.num_cols, 8), np.float32)
    assert matrix_signature(A, x1) != matrix_signature(A, x2)
    t = Tuner()
    from cusp_autotuned_tpu.backend.reference import reference_spmv
    results = t.tune(A, x2, reference_computation=reference_spmv)
    assert any(r.is_valid() for r in results)
    y = t.tune_iteration(A, x2)
    ref = reference_spmv(A, x2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [21, 22])
def test_colsort_streamed(seed):
    S = _powerlaw(900, 9000, seed=seed)
    _check_binned(S, "build_colsort", block_entries=2048, col_window=2048,
                  row_window=1024, hub_cap=12, stream_x=1)


def test_colsort_streamed_empty_buckets():
    import scipy.sparse as sp
    # rows 1100..2199 empty: untouched row buckets must come back zero
    S = (sp.coo_matrix((np.ones(1100), (np.arange(1100), np.arange(1100))),
                       shape=(3000, 3000))
         + sp.coo_matrix((np.ones(700), (2300 + np.arange(700),
                                         np.arange(700))),
                         shape=(3000, 3000))).tocsr()
    _check_binned(S, "build_colsort", block_entries=512, col_window=1024,
                  row_window=1024, stream_x=1)


def test_colsort_auto_streams_past_budget():
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort
    from cusp_autotuned_tpu.utils.config import get_config, configure
    S = _powerlaw(600, 6000, seed=23)
    A = from_scipy(S.tocoo(), "csr")
    x = jnp.asarray(np.random.RandomState(2).randn(A.num_cols)
                    .astype(np.float32))
    old = get_config().vmem_budget_bytes
    try:
        configure(vmem_budget_bytes=2048)
        fn = build_colsort(A, {"block_entries": 512, "col_window": 1024,
                               "row_window": 1024, "hub_cap": 10},
                           interpret=True)
        y = np.asarray(jax.jit(fn)(x))
    finally:
        configure(vmem_budget_bytes=old)
    np.testing.assert_allclose(y, reference_spmv(A, np.asarray(x)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 9])
def test_colsort_spmm(k):
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort
    S = _powerlaw(700, 7000, seed=14)
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(15)
    X = jnp.asarray(rng.randn(A.num_cols, k).astype(np.float32))
    fn = build_colsort(A, {"block_entries": 2048, "col_window": 2048,
                           "row_window": 512, "hub_cap": 10}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_colsort_spmm_all_hub():
    # every row exceeds hub_cap: SpMM routes entirely through the hub
    # k-loop kernel (no main pass exists)
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort
    n = 400
    S = (sp.eye(n) + sp.diags(np.full(n - 1, 2.0), 1)
         + sp.diags(np.full(n - 1, 3.0), -1)).tocsr()   # 2-3 entries/row
    A = from_scipy(S.tocoo(), "csr")
    fn = build_colsort(A, {"block_entries": 512, "col_window": 1024,
                           "row_window": 256, "hub_cap": 1}, interpret=True)
    rng = np.random.RandomState(16)
    X = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    Y = np.asarray(jax.jit(fn)(X))
    ref = S.astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)
    # and the SpMV path agrees on the same all-hub build
    xv = jnp.asarray(rng.randn(n).astype(np.float32))
    np.testing.assert_allclose(np.asarray(jax.jit(fn)(xv)),
                               S @ np.asarray(xv, np.float64),
                               rtol=1e-4, atol=1e-4)


def test_binned_streamed_rectangular():
    import scipy.sparse as sp
    rng = np.random.RandomState(41)
    S = sp.random(700, 2200, density=0.004, random_state=rng).tocsr()
    _check_binned(S, "build_binned", block_entries=512, col_window=1024,
                  row_window=256, stream_x=1)


def test_binned_streamed_pack16_off():
    S = gallery.poisson9pt(30, 30, format="csr").to_scipy()
    _check_binned(S, "build_binned", block_entries=512, col_window=1024,
                  row_window=256, stream_x=1, pack16=False)


@pytest.mark.parametrize("k", [3, 9])
def test_colsort_streamed_spmm(k):
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort
    S = _powerlaw(700, 7000, seed=31)
    A = from_scipy(S.tocoo(), "csr")
    fn = build_colsort(A, {"block_entries": 512, "col_window": 1024,
                           "row_window": 1024, "hub_cap": 10,
                           "stream_x": 1}, interpret=True)
    rng = np.random.RandomState(32)
    X = jnp.asarray(rng.randn(A.num_cols, k).astype(np.float32))
    Y = np.asarray(jax.jit(fn)(X))
    ref = A.to_scipy().astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


# -- colsort2 (plane-aligned virtual rows, MXU matmul scatter) -----------------

def test_colsort2_poisson9():
    _check_binned(gallery.poisson9pt(35, 35, format="csr").to_scipy(),
                  "build_colsort2")


def test_colsort2_powerlaw_hub_region():
    # heavy rows route through the degree-sorted hub region (scatter fold)
    S = _powerlaw(800, 8000, seed=3)
    _check_binned(S, "build_colsort2", hub_cap=8)


def test_colsort2_lane_cap_spill():
    # an aggressive lane cap forces the XLA COO spill side path
    S = _powerlaw(800, 8000, seed=4)
    _check_binned(S, "build_colsort2", lane_cap=2)


@pytest.mark.parametrize("planes", [1, 4])
def test_colsort2_vrow_planes(planes):
    import scipy.sparse as sp
    rng = np.random.RandomState(11)
    S = sp.random(700, 700, density=0.02, random_state=rng).tocsr() \
        + sp.eye(700)
    _check_binned(S, "build_colsort2", vrow_planes=planes)


def test_colsort2_windowed_gather():
    # col_window below num_cols exercises the dynamic 128-aligned window
    # slice path instead of the full-width static gather
    import scipy.sparse as sp
    rng = np.random.RandomState(12)
    S = sp.random(400, 40000, density=0.001, random_state=rng).tocsr()
    _check_binned(S, "build_colsort2", col_window=16384)


def test_colsort2_rectangular():
    import scipy.sparse as sp
    rng = np.random.RandomState(13)
    _check_binned(sp.random(300, 900, density=0.02, random_state=rng).tocsr(),
                  "build_colsort2")
    _check_binned(sp.random(900, 300, density=0.02, random_state=rng).tocsr(),
                  "build_colsort2")


def test_colsort_plan_stats():
    """Both scattered builders expose the plan diagnostics (nb, W, fill,
    XLU lane-op bound) used for roofline statements."""
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    S = _powerlaw(800, 8000, seed=5)
    A = from_scipy(S.tocoo(), "csr")
    f1 = build_colsort(A, {"block_entries": 2048, "col_window": 16384,
                           "row_window": 2048}, interpret=True)
    st1 = f1.plan_stats
    assert st1["impl"] == "colsort" and st1["nnz"] == S.nnz
    assert 0 < st1.get("fill_main", 1) <= 1
    assert st1["xlu_cycles_per_rhs"] > 0
    f2 = build_colsort2(A, {}, interpret=True)
    st2 = f2.plan_stats
    assert st2["impl"] == "colsort2"
    assert st2["nnz"] == S.nnz and st2["spill"] >= 0
    assert 0 < st2["fill"] <= 1
    # fill is consistent with its definition
    assert abs(st2["fill"]
               - (st2["nnz"] - st2["spill"]) / st2["slots"]) < 1e-3
    assert st2["xlu_cycles_per_rhs"] == st2["nb"] * st2["Bs"] * st2["W"]


@pytest.mark.parametrize("mix", [2, 4, 8])
def test_colsort2_mix_chunks(mix):
    # chunk-mixed sublanes: up to `mix` chunks share a sublane, scattered
    # with `mix` one-hot dots (lifts the Poisson column-lane fill bound)
    S = _powerlaw(800, 8000, seed=6)
    _check_binned(S, "build_colsort2", vrow_planes=1, hub_cap=8,
                  mix_chunks=mix)


@pytest.mark.parametrize("mode", ["bf16x3", "bf16"])
def test_colsort2_scatter_dot_modes(mode):
    """Reduced-precision scatter dots: bf16x3 (3-way operand split,
    ~f32-faithful — the one-hot side is 0/1-exact in bf16) and bf16
    (single pass, coarser).  bf16x3 must hold the normal tolerance."""
    S = _powerlaw(800, 8000, seed=6)
    if mode == "bf16x3":
        _check_binned(S, "build_colsort2", vrow_planes=1, mix_chunks=4,
                      scatter_dot=mode)
    else:
        from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
        from cusp_autotuned_tpu.backend.reference import from_scipy
        A = from_scipy(S.tocsr().astype(np.float32), "csr")
        fn = build_colsort2(A, {"vrow_planes": 1, "mix_chunks": 4,
                                "scatter_dot": mode}, interpret=True)
        x = np.random.RandomState(0).randn(A.num_cols).astype(np.float32)
        ref = S @ x
        scale = max(np.abs(ref).max(), 1e-9)
        err = np.abs(np.asarray(fn(x)) - ref).max() / scale
        assert err < 5e-2, err   # single-pass bf16 rounds the products


@pytest.mark.parametrize("span", [8, 32, 64])
def test_colsort2_perm_sigma_fold(span):
    # sigma-fold scatter (mix_chunks='perm'): plan-time per-lane sublane
    # permutation + reshape fold replaces the one-hot dots; the capped
    # colorer guarantees the per-(block, vlane, qrel) slot capacity
    S = _powerlaw(800, 8000, seed=6)
    _check_binned(S, "build_colsort2", vrow_planes=1, hub_cap=8,
                  mix_chunks="perm", vrow_span=span)


def test_colsort2_perm_spmm():
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(31)
    S = sp.random(1200, 900, density=0.004, random_state=rng).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    X = rng.randn(A.num_cols, 5).astype(np.float32)
    fn = build_colsort2(A, {"mix_chunks": "perm", "vrow_span": 32},
                        interpret=True)
    ref = S.astype(np.float64) @ X.astype(np.float64)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(X))), ref,
                               rtol=1e-4, atol=1e-4)


def test_colsort2_perm_beats_uniform_fill():
    # dropping the chunk constraint must not use more sublanes than the
    # uniform plan (it is the same coloring minus one constraint, modulo
    # the sigma slot capacity)
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(21)
    S = (sp.random(2000, 2000, density=0.002, random_state=rng)
         + sp.eye(2000)).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    cfg = {"vrow_planes": 1, "hub_cap": 8, "block_entries": 2048}
    nb1 = build_colsort2(A, cfg, interpret=True) \
        .planned_arrays["v2v"].shape[0]
    nbp = build_colsort2(A, dict(cfg, mix_chunks="perm", vrow_span=8),
                         interpret=True).planned_arrays["v2v"].shape[0]
    assert nbp <= nb1, (nbp, nb1)


def test_colsort2_mix_chunks_raises_fill():
    # on light scatter the mixed plan must place the same entries in
    # fewer sublanes than the uniform plan
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(21)
    S = (sp.random(2000, 2000, density=0.002, random_state=rng)
         + sp.eye(2000)).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    cfg = {"vrow_planes": 1, "hub_cap": 8, "block_entries": 2048}
    nb1 = build_colsort2(A, cfg, interpret=True) \
        .planned_arrays["v2v"].shape[0]
    nb4 = build_colsort2(A, dict(cfg, mix_chunks=4), interpret=True) \
        .planned_arrays["v2v"].shape[0]
    assert nb4 < nb1, (nb4, nb1)


def test_colsort2_mix_pack16_and_spmm():
    # int16 metadata with the mix-slot bits packed above qrel; SpMM rail
    S = _powerlaw(900, 9000, seed=7)
    _check_binned(S, "build_colsort2", vrow_planes=1, hub_cap=8,
                  mix_chunks=4, block_entries=2048, pack16="auto")
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(8)
    X = rng.randn(A.num_cols, 6).astype(np.float32)
    fn = build_colsort2(A, {"vrow_planes": 1, "hub_cap": 8,
                            "mix_chunks": 4}, interpret=True)
    Y = np.asarray(fn(jnp.asarray(X)))
    ref = S.astype(np.float64) @ X.astype(np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)


def test_colsort2_mix_streamed():
    import scipy.sparse as sp
    rng = np.random.RandomState(22)
    S = sp.random(700, 30000, density=0.001, random_state=rng).tocsr()
    _check_binned(S, "build_colsort2", vrow_planes=1, mix_chunks=4,
                  stream_x=1, col_window=8192, block_entries=2048)


def test_colsort2_single_dense_row():
    import scipy.sparse as sp
    row = np.zeros(500, np.int64)
    col = np.arange(500) * 3 % 1500
    S = sp.coo_matrix((np.random.RandomState(5).randn(500), (row, col)),
                      shape=(4, 1500)).tocsr()
    _check_binned(S, "build_colsort2", hub_cap=16)


def test_colsort2_via_variants_and_tuner_config():
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    A = gallery.poisson5pt(30, 30, format="csr", dtype=np.float32)
    fn = build_spmv(A, {"impl": "colsort2", "block_entries": 2048,
                        "col_window": 2048, "vrow_planes": 2})
    x = np.linspace(-1, 1, A.num_cols).astype(np.float32)
    y = np.asarray(jax.jit(fn)(x))
    np.testing.assert_allclose(y, reference_spmv(A, x), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [1, 10])
def test_colsort2_spmm(k):
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(17)
    S = sp.random(500, 700, density=0.02, random_state=rng).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    fn = build_colsort2(A, {"spmm_kb": 4}, interpret=True)
    X = rng.randn(A.num_cols, k).astype(np.float32)
    Y = np.asarray(fn(X))
    np.testing.assert_allclose(Y, (S @ X).astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_colsort2_spmm_hub_and_spill():
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    S = _powerlaw(600, 6000, seed=9)
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(18)
    fn = build_colsort2(A, {"hub_cap": 8, "lane_cap": 2}, interpret=True)
    X = rng.randn(A.num_cols, 6).astype(np.float32)
    Y = np.asarray(fn(X))
    np.testing.assert_allclose(Y, np.asarray(S @ X, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_colsort2_streamed_spmv_spmm():
    # forced streamed rail: aligned windows, index-mapped x/y, fold mask
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(21)
    S = (sp.random(3000, 2500, density=0.004, random_state=rng)
         .tocsr().astype(np.float32))
    A = from_scipy(S.tocoo(), "csr")
    fn = build_colsort2(A, {"stream_x": 1}, interpret=True)
    assert "v2wm" in fn.planned_arrays        # streamed fold mask present
    x = rng.randn(A.num_cols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(x)), S @ x, rtol=1e-4,
                               atol=1e-4)
    X = rng.randn(A.num_cols, 4).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(X)), S @ X, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("mix", [1, 4])
def test_colsort2_streamed_many_windows(mix):
    """Regression: streamed colsort2 with a SMALL column window (several
    x windows per matrix) packed entries of different windows into one
    block — the aligned block cut ran searchsorted over an unsorted
    su_wid segment (caught on chip by the Economics exhaustive walk:
    ValidationFailed at stream_x=1, col_window=2048, rel err ~0.5)."""
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    rng = np.random.RandomState(33)
    S = (sp.random(4000, 40000, density=3e-4, random_state=rng)
         .tocsr().astype(np.float32))
    A = from_scipy(S.tocoo(), "csr")
    fn = build_colsort2(A, {"stream_x": 1, "col_window": 2048,
                            "block_entries": 2048, "vrow_planes": 1,
                            "mix_chunks": mix}, interpret=True)
    x = rng.randn(A.num_cols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(x)), S @ x, rtol=1e-4,
                               atol=1e-4)


def test_colsort2_auto_streams_past_vmem_budget():
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    from cusp_autotuned_tpu.utils import config as C
    S = _powerlaw(3000, 30000, seed=5).astype(np.float32).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    rng = np.random.RandomState(22)
    old = C.get_config().vmem_budget_bytes
    C.configure(vmem_budget_bytes=10_000)
    try:
        fn = build_colsort2(A, {}, interpret=True)
    finally:
        C.configure(vmem_budget_bytes=old)
    assert "v2wm" in fn.planned_arrays        # auto chose the streamed rail
    x = rng.randn(A.num_cols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(x)), S @ x, rtol=1e-4,
                               atol=1e-4)


# -- routed rail (take/transpose/take gather, reshape-sum scatter) ------------

def test_routed_random_scatter():
    import scipy.sparse as sp
    rng = np.random.RandomState(11)
    S = sp.random(4000, 4000, density=6e-4, random_state=rng,
                  dtype=np.float32) + sp.eye(4000, dtype=np.float32)
    _check_binned(S, "build_routed")


def test_routed_hub_rows_go_to_tail():
    """Hub rows cannot ride the routed blocks (a take cannot sum) — they
    must come back through the colsort2 tail sub-plan, correctly."""
    import scipy.sparse as sp
    rng = np.random.RandomState(3)
    S = sp.random(3000, 3000, density=8e-4, random_state=rng,
                  dtype=np.float32)
    hub = sp.coo_matrix(
        (rng.randn(400).astype(np.float32),
         (np.full(400, 7), rng.choice(3000, 400, replace=False))),
        shape=(3000, 3000))
    _check_binned((S + hub).tocsr(), "build_routed", hub_cap=32)


@pytest.mark.parametrize("cfg", [{"vrow_span": 128},
                                 {"vrow_planes": 2, "vrow_span": 64},
                                 {"win_group": 2},
                                 {"pack8": 1},
                                 {"pack8": 1, "vrow_span": 128},
                                 {"tail_mix": 2},
                                 {"tail_mix": 2, "vrow_span": 128},
                                 {"tail_cw": 32768},
                                 {"tail_cw": 32768, "tail_bs": 4096,
                                  "tail_rsp": 64}])
def test_routed_axes(cfg):
    import scipy.sparse as sp
    rng = np.random.RandomState(5)
    S = sp.random(5000, 5000, density=5e-4, random_state=rng,
                  dtype=np.float32) + sp.eye(5000, dtype=np.float32)
    _check_binned(S, "build_routed", **cfg)


def test_routed_tail_auto_search():
    """A big tail triggers the host-side tail-plan model search
    (VERDICT r4 item 1): the chosen tail configuration must score no
    worse than the pre-round-5 default on the take+dot model AND stay
    numerically exact."""
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_routed import (
        build_routed, _plan_routed, _TailShim, _tail_score)
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    from cusp_autotuned_tpu.backend.reference import from_scipy

    rng = np.random.RandomState(9)
    S = (sp.random(6000, 6000, density=1.5e-3, random_state=rng,
                   dtype=np.float32)
         + sp.eye(6000, dtype=np.float32)).tocsr()
    A = from_scipy(S, "csr")
    fn_auto = build_routed(A, {"plan_budget_bytes": 1 << 33,
                               "tail_search_min": 1000}, interpret=True)
    ts = fn_auto.plan_stats["tail_stats"]
    assert ts is not None

    # old default tail = full-width Bs128 colsort2 on the same triplets
    C = S.tocoo()
    tail = _plan_routed(C.row.astype(np.int64), C.col.astype(np.int64),
                        C.data.astype(np.float64), S.shape,
                        K=1, RSp=64, Wr=1, hub_cap=0,
                        tail_min_fill=0.25)[-1]
    shim = _TailShim(*tail, S.shape, np.dtype(np.float32))
    st_old = build_colsort2(shim, {"plan_only": True, "vrow_planes": 1,
                                   "mix_chunks": 4})
    assert _tail_score(ts) <= _tail_score(st_old) + 1e-9
    x = rng.randn(6000).astype(np.float32)
    want = S @ x
    np.testing.assert_allclose(np.asarray(fn_auto(x)), want, rtol=1e-4,
                               atol=1e-4 * np.abs(want).max())


def test_colsort2_plan_only_probe():
    """plan_only returns the plan stats without building device arrays —
    the tail auto-search's pricing path."""
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    from cusp_autotuned_tpu.backend.reference import from_scipy
    rng = np.random.RandomState(2)
    S = sp.random(2000, 2000, density=2e-3, random_state=rng,
                  dtype=np.float32).tocsr()
    A = from_scipy(S, "csr")
    st = build_colsort2(A, {"plan_only": True, "mix_chunks": 4,
                            "col_window": 16384})
    assert isinstance(st, dict) and st["impl"] == "colsort2"
    assert st["nb"] > 0 and st["W"] == 1 and 0 < st["fill"] <= 1
    # and the real build under the same config matches the probe's shape
    fn = build_colsort2(A, {"mix_chunks": 4, "col_window": 16384},
                        interpret=True)
    assert fn.plan_stats["nb"] == st["nb"]
    assert fn.plan_stats["W"] == st["W"]


def test_routed_rectangular_and_spmm():
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    rng = np.random.RandomState(9)
    S = sp.random(3000, 5000, density=5e-4, random_state=rng,
                  dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    fn = build_routed(A, {}, interpret=True)
    x = rng.randn(5000).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))),
                               reference_spmv(A, x), rtol=1e-4, atol=1e-4)
    X = rng.randn(5000, 5).astype(np.float32)
    ref = (S.astype(np.float64) @ X.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(X))), ref,
                               rtol=1e-4, atol=1e-4)


def test_routed_tail_dominant_is_skippable():
    """A pattern whose plan is mostly tail (extreme power law at small n)
    raises the skippable conversion failure — plain colsort2 serves it."""
    from cusp_autotuned_tpu.utils.exceptions import FormatConversionException
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    S = _powerlaw(3000, 15000, seed=1)
    A = from_scipy(S.tocoo().astype(np.float32), "csr")
    with pytest.raises(FormatConversionException):
        build_routed(A, {}, interpret=True)


def test_routed_python_fallback_matches_native():
    import scipy.sparse as sp
    from cusp_autotuned_tpu import native
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    rng = np.random.RandomState(13)
    S = sp.random(2000, 2000, density=1e-3, random_state=rng,
                  dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    x = jnp.asarray(rng.randn(2000).astype(np.float32))
    ref = reference_spmv(A, np.asarray(x))
    y_nat = np.asarray(build_routed(A, {}, interpret=True)(x))
    orig = native.route_cells
    native.route_cells = lambda *a: None
    try:
        y_py = np.asarray(build_routed(A, {}, interpret=True)(x))
    finally:
        native.route_cells = orig
    np.testing.assert_allclose(y_nat, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y_py, ref, rtol=1e-4, atol=1e-4)


def test_routed_plan_stats():
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    rng = np.random.RandomState(17)
    S = sp.random(4000, 4000, density=8e-4, random_state=rng,
                  dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    fn = build_routed(A, {}, interpret=True)
    st = fn.plan_stats
    assert st["impl"] == "routed"
    assert st["nb"] >= 1 and 0 < st["fill"] <= 1
    assert st["xlu_passes_per_rhs"] == st["nb"] * (st["Wr"] + 2)
    # fill is rounded to 4 decimals: consistency within rounding error
    assert abs(st["tail"] + st["fill"] * st["slots"] - st["nnz"]) \
        <= 1e-4 * st["slots"] + 1


def test_routed_streamed_rail():
    """stream_x=1: index-mapped x window-group / y band BlockSpecs over
    the naturally aligned plan; SpMV + SpMM match, fold mask present."""
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    rng = np.random.RandomState(23)
    S = sp.random(5000, 5000, density=5e-4, random_state=rng,
                  dtype=np.float32) + sp.eye(5000, dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    fn = build_routed(A, {"stream_x": 1}, interpret=True)
    assert fn.plan_stats["streamed"]
    assert "rwm" in fn.planned_arrays
    x = rng.randn(A.num_cols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), S @ x,
                               rtol=1e-4, atol=1e-4)
    X = rng.randn(A.num_cols, 4).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(X))), S @ X,
                               rtol=1e-4, atol=1e-4)


def test_routed_auto_streams_past_vmem_budget():
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
    from cusp_autotuned_tpu.utils import config as C
    rng = np.random.RandomState(29)
    S = sp.random(4000, 4000, density=6e-4, random_state=rng,
                  dtype=np.float32) + sp.eye(4000, dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    old = C.get_config().vmem_budget_bytes
    C.configure(vmem_budget_bytes=10_000)
    try:
        fn = build_routed(A, {}, interpret=True)
    finally:
        C.configure(vmem_budget_bytes=old)
    assert fn.plan_stats["streamed"]          # auto chose the streamed rail
    x = rng.randn(A.num_cols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), S @ x,
                               rtol=1e-4, atol=1e-4)


def test_routed_via_variants_and_tuner_config():
    import scipy.sparse as sp
    from cusp_autotuned_tpu.kernels.variants import build_spmv, tuning_space
    rng = np.random.RandomState(19)
    S = sp.random(3000, 3000, density=8e-4, random_state=rng,
                  dtype=np.float32) + sp.eye(3000, dtype=np.float32)
    A = from_scipy(S.tocoo(), "csr")
    x = jnp.asarray(rng.randn(3000).astype(np.float32))
    fn = build_spmv(A, {"impl": "routed", "vrow_span": 64})
    np.testing.assert_allclose(np.asarray(fn(x)),
                               reference_spmv(A, np.asarray(x)),
                               rtol=1e-4, atol=1e-4)
    cfgs = list(tuning_space(A).configurations())
    assert any(c["impl"] == "routed" for c in cfgs)


def test_dia_spmm_wide_short_matrix():
    """ADVICE r3 (low): a WIDE matrix (n much larger than the padded row
    count plus max offset) made the XLA SpMM path compute a negative
    bottom pad and raise; the pad clamps at 0 now."""
    import scipy.sparse as sp
    S = sp.diags([np.ones(8), 2 * np.ones(8)], [0, 1],
                 shape=(8, 300)).tocoo()
    A = from_scipy(S, "dia")
    rng = np.random.RandomState(23)
    X = jnp.asarray(rng.randn(300, 16).astype(np.float32))
    fn = build_dia(A, {"block_rows": 1024}, interpret=True)
    Y = np.asarray(jax.jit(fn)(X))
    ref = S.astype(np.float64) @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4)

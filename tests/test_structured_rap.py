"""Closed-form structured smoothed-prolongator + Galerkin RAP
(precond/aggregation/structured_rap.py, VERDICT r4 item 2).

The stencil-algebra level build must agree with the generic scipy path to
machine precision — the generic triple product is the oracle (reference
bar: the device-resident generic setup, smoothed_aggregation.inl:134-165).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from cusp_autotuned_tpu.gallery import poisson5pt, poisson9pt
from cusp_autotuned_tpu.backend.reference import to_scipy
from cusp_autotuned_tpu.precond.aggregation.aggregate import (
    detect_grid, structured_aggregate)
from cusp_autotuned_tpu.precond.aggregation.tentative import fit_candidates
from cusp_autotuned_tpu.precond.aggregation.strength import rho_Dinv_A
from cusp_autotuned_tpu.precond.aggregation.structured_rap import (
    structured_smooth_rap, get_band, offset_histogram, csr_to_band,
    band_mul, band_transpose, band_to_scipy, container_from_csr)


def _level(gen, shape, blk, dtype=np.float64):
    A = gen(*shape, format="csr", dtype=dtype)
    grid = detect_grid(A)
    assert grid is not None
    agg, roots = structured_aggregate(A, block=blk, grid=grid)
    T, Bc = fit_candidates(agg, np.ones(A.num_rows, dtype))
    rho = rho_Dinv_A(A)
    return A, grid, T, (4.0 / 3.0) / rho


@pytest.mark.parametrize("gen,shape,blk", [
    (poisson5pt, (20, 33), (3, 3)),
    (poisson9pt, (17, 23), (3, 3)),
    (poisson5pt, (16, 16), (2, 2)),     # exact blocks
    (poisson9pt, (31, 9), (3, 2)),      # partial blocks, asymmetric block
])
def test_matches_generic_triple_product(gen, shape, blk):
    A, grid, T, scale = _level(gen, shape, blk)
    Ssp = to_scipy(A).tocsr().astype(np.float64)
    Tsp = to_scipy(T).tocsr().astype(np.float64)
    d = Ssp.diagonal()
    d = np.where(d != 0, d, 1.0)
    P_ref = (Tsp - scale * (sp.diags(1.0 / d) @ Ssp @ Tsp)).tocsr()
    Ac_ref = (P_ref.T @ Ssp @ P_ref).tocsr()

    P, Ac = structured_smooth_rap(Ssp, np.asarray(Tsp.data), grid, blk,
                                  scale, band=get_band(A))
    assert abs(P - P_ref).max() < 1e-12
    assert abs(Ac - Ac_ref).max() < 1e-12
    # same sparsity (no spurious raster-wrap entries)
    assert P.nnz == P_ref.nnz and Ac.nnz == Ac_ref.nnz


def test_coarse_operator_recurses_structured():
    """The closed-form coarse operator must itself be a raster stencil so
    the structured rail (and this closed form) recurse down the levels."""
    A, grid, T, scale = _level(poisson5pt, (30, 30), (3, 3))
    Ssp = to_scipy(A).tocsr().astype(np.float64)
    Tsp = to_scipy(T).tocsr().astype(np.float64)
    P, Ac = structured_smooth_rap(Ssp, np.asarray(Tsp.data), grid, (3, 3),
                                  scale, band=get_band(A))
    C = container_from_csr(Ac, np.float64)
    assert detect_grid(C) == (10, 10)


def test_hierarchy_iterations_match_generic(monkeypatch):
    """smoothed_aggregation's closed-form structured path must produce
    the same AMG-CG iteration count as the generic scipy path."""
    import cusp_autotuned_tpu.precond.aggregation as agg
    import cusp_autotuned_tpu.precond.aggregation.structured_rap as srap
    from cusp_autotuned_tpu import solvers
    from cusp_autotuned_tpu.solvers.monitor import Monitor

    A = poisson5pt(96, 96, format="csr", dtype=np.float32)
    b = np.ones(A.num_rows, np.float32)
    M1 = agg.smoothed_aggregation(A, spmv_config={})
    x1, m1 = solvers.cg(A, b, M=M1, monitor=Monitor(b, 80, 1e-8))

    def boom(*a, **k):
        raise RuntimeError("forced generic")
    monkeypatch.setattr(srap, "structured_smooth_rap", boom)
    M2 = agg.smoothed_aggregation(A, spmv_config={})
    x2, m2 = solvers.cg(A, b, M=M2, monitor=Monitor(b, 80, 1e-8))
    assert m1.converged() and m2.converged()
    assert m1.iteration_count() == m2.iteration_count()


def test_offset_histogram_matches_unique():
    rng = np.random.RandomState(0)
    S = sp.random(40, 40, density=0.1, random_state=rng, format="csr")
    offs, counts, off = offset_histogram(S)
    C = S.tocoo()
    u, c = np.unique(C.col.astype(np.int64) - C.row.astype(np.int64),
                     return_counts=True)
    np.testing.assert_array_equal(offs, u)
    np.testing.assert_array_equal(counts, c)


def test_band_roundtrip_and_algebra():
    rng = np.random.RandomState(1)
    n = 64
    S = sp.diags([rng.randn(n - 3), rng.randn(n), rng.randn(n - 8)],
                 [-3, 0, 8]).tocsr()
    offs, data = csr_to_band(S)
    assert abs(band_to_scipy(offs, data, S.shape) - S).max() < 1e-14
    # transpose
    to, td = band_transpose(offs, data)
    assert abs(band_to_scipy(to, td, S.shape) - S.T).max() < 1e-14
    # product
    B = sp.diags([rng.randn(n - 1), rng.randn(n), rng.randn(n - 2)],
                 [-1, 0, 2]).tocsr()
    ob, db = csr_to_band(B)
    oc, dc = band_mul(offs, data, ob, db)
    assert abs(band_to_scipy(oc, dc, S.shape) - S @ B).max() < 1e-12


def test_get_band_caches_and_rejects_wide_patterns():
    A = poisson5pt(12, 12, format="csr", dtype=np.float32)
    b1 = get_band(A)
    b2 = get_band(A)
    assert b1 is b2 and b1 is not None
    rng = np.random.RandomState(2)
    from cusp_autotuned_tpu.backend.reference import from_scipy
    W = from_scipy(sp.random(300, 300, density=0.05, random_state=rng,
                             format="csr").astype(np.float32), "csr")
    assert get_band(W) is None      # > MAX_BAND distinct diagonals


def test_container_from_csr_has_mirrors():
    S = sp.diags([np.ones(99), 2 * np.ones(100)], [-1, 0]).tocsr()
    C = container_from_csr(S, np.float32)
    assert C._host_scipy is not None and C._host_coo is not None
    got = to_scipy(C)
    assert abs(got - S).max() == 0
    from cusp_autotuned_tpu.backend.reference import reference_spmv
    x = np.linspace(0, 1, 100).astype(np.float32)
    from cusp_autotuned_tpu.ops.multiply import multiply
    np.testing.assert_allclose(np.asarray(multiply(C, x)),
                               reference_spmv(C, x), rtol=1e-5, atol=1e-5)

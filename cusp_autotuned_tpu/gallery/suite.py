"""Stand-ins for the Williams/Bell-Garland SpMV benchmark suite.

Parity target: the 14 unstructured matrices + 5 Laplacian stencils driven by
performance/spmv/scripts/benchmark.py:13-37.  The originals live on
SuiteSparse (no network egress here), so each entry is SYNTHESIZED with the
same structural character — size class, nnz/row distribution, bandedness or
scatter, hub tails, rectangularity — scaled to fit the single-chip bench
budget (~0.3-1.5M nnz).  Structural parameters follow the published
SuiteSparse statistics for each matrix.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from cusp_autotuned_tpu.backend.reference import from_scipy


def _fem_band(n, nnz_per_row, block=6, jitter=0.3, seed=0):
    """FEM-style banded matrix: dense node blocks coupled to nearby nodes —
    the pattern family of consph/cant/pwtk/shipsec/rma10."""
    rng = np.random.default_rng(seed)
    nodes = n // block
    half = max(1, nnz_per_row // (2 * block))
    rows, cols = [], []
    for b in range(block):
        # each node couples to `half` neighbors each side, with jitter
        offs = np.arange(-half, half + 1)
        for o in offs:
            i = np.arange(nodes)
            j = i + o + rng.integers(-int(half * jitter),
                                     int(half * jitter) + 1, nodes)
            j = np.clip(j, 0, nodes - 1)
            for bb in range(block):
                rows.append(i * block + b)
                cols.append(j * block + bb)
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = rng.standard_normal(r.size)
    A = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def _qcd_stencil(L=12, dof=12, seed=0):
    """QCD-like: 4-D periodic lattice, nearest neighbors, narrow dof
    coupling per link (qcd5_4: 49k rows, 39 nnz/row, perfectly regular)."""
    rng = np.random.default_rng(seed)
    sites = L ** 4
    idx = np.arange(sites).reshape(L, L, L, L)
    rows, cols = [np.arange(sites)], [np.arange(sites)]
    for axis in range(4):
        for d in (-1, 1):
            rows.append(np.arange(sites))
            cols.append(np.roll(idx, d, axis=axis).reshape(-1))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    # per link, couple dof d -> {d-1, d, d+1} (mod dof): ~27 + 12 nnz/row
    dd = np.arange(dof)
    rr, cc = [], []
    for shift in (-1, 0, 1):
        rr.append((r[:, None] * dof + dd[None, :]).reshape(-1))
        cc.append((c[:, None] * dof + (dd + shift) % dof).reshape(-1))
    rr = np.concatenate(rr)
    cc = np.concatenate(cc)
    vv = rng.standard_normal(rr.size)
    A = sp.coo_matrix((vv, (rr, cc)),
                      shape=(sites * dof, sites * dof)).tocsr()
    A.sum_duplicates()
    return A


def _powerlaw(n, nnz_target, a=2.1, seed=0):
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(a, n).astype(np.int64), n // 4)
    deg = np.maximum(deg * nnz_target // max(1, deg.sum()), 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def _scattered(n, nnz_per_row, seed=0):
    """Economics/accelerator-like: light rows, mildly clustered columns."""
    rng = np.random.default_rng(seed)
    deg = np.maximum(rng.poisson(nnz_per_row, n), 1)
    rows = np.repeat(np.arange(n), deg)
    # half local, half anywhere
    local = rows + rng.integers(-n // 50, n // 50 + 1, rows.size)
    anywhere = rng.integers(0, n, rows.size)
    take_local = rng.random(rows.size) < 0.5
    cols = np.clip(np.where(take_local, local, anywhere), 0, n - 1)
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def _lp_rect(m=1000, n=260_000, nnz_per_row=650, seed=0):
    """LP (rail4284)-like: few very dense rows, wide rectangular."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), nnz_per_row)
    cols = rng.integers(0, n, rows.size)
    return sp.coo_matrix((np.ones(rows.size), (rows, cols)),
                         shape=(m, n)).tocsr()


def williams_suite(scale: float = 1.0):
    """OrderedDict name -> scipy CSR stand-in (structure-matched, scaled)."""
    from collections import OrderedDict
    from cusp_autotuned_tpu.gallery import poisson5pt, poisson9pt, poisson7pt
    s = scale

    def build():
        yield "Dense", sp.csr_matrix(
            np.random.RandomState(0).randn(int(700 * s), int(700 * s)))
        yield "Protein", _fem_band(int(12_000 * s), 100, block=8, jitter=0.5,
                                   seed=1)
        yield "FEM/Spheres", _fem_band(int(16_000 * s), 70, block=6, seed=2)
        yield "FEM/Cantilever", _fem_band(int(16_000 * s), 60, block=3,
                                          seed=3)
        yield "Wind Tunnel", _fem_band(int(24_000 * s), 50, block=6, seed=4)
        yield "FEM/Harbor", _fem_band(int(12_000 * s), 50, block=2,
                                      jitter=0.8, seed=5)
        yield "QCD", _qcd_stencil(L=int(10 * max(s, 0.5)), dof=12, seed=6)
        yield "FEM/Ship", _fem_band(int(20_000 * s), 55, block=6, seed=7)
        yield "Economics", _scattered(int(120_000 * s), 6, seed=8)
        yield "Epidemiology", sp.csr_matrix(
            __import__("cusp_autotuned_tpu.backend.reference",
                       fromlist=["to_scipy"]).to_scipy(
                poisson5pt(int(500 * s), int(500 * s), format="csr")))
        yield "FEM/Accelerator", _scattered(int(70_000 * s), 21, seed=9)
        yield "Circuit", _powerlaw(int(100_000 * s), int(600_000 * s),
                                   a=2.2, seed=10)
        yield "Webbase", _powerlaw(int(200_000 * s), int(700_000 * s),
                                   a=1.8, seed=11)
        yield "LP", _lp_rect(int(1000 * s), int(260_000 * s),
                             int(650 * s) or 650, seed=12)

    return OrderedDict(build())


def stencil_suite(scale: float = 1.0):
    """The 5 Laplacian stencils (3/5/7/9/27-pt) as containers."""
    from collections import OrderedDict
    from cusp_autotuned_tpu import gallery
    s = scale
    out = OrderedDict()
    n1 = int(1_000_000 * s)
    g2 = int(1000 * np.sqrt(s))
    g3 = int(100 * s ** (1 / 3))
    T = sp.diags([np.full(n1 - 1, -1.0), np.full(n1, 2.0),
                  np.full(n1 - 1, -1.0)], [-1, 0, 1], format="coo")
    out["Laplacian_3pt"] = from_scipy(T.astype(np.float32), "dia")
    out["Laplacian_5pt"] = gallery.poisson5pt(g2, g2, format="dia")
    out["Laplacian_7pt"] = gallery.poisson7pt(g3, g3, g3, format="dia")
    out["Laplacian_9pt"] = gallery.poisson9pt(g2, g2, format="dia")
    out["Laplacian_27pt"] = gallery.poisson27pt(g3, g3, g3, format="dia")
    return out

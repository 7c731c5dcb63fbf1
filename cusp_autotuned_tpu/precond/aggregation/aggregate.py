"""Aggregation: standard (greedy Vanek) and MIS(2)-based.

Parity: cusp/precond/aggregation/system/detail/generic/
{standard_aggregate, mis_aggregate}.h — returns (aggregate ids, roots)."""

from __future__ import annotations

import numpy as np

def _adj(C):
    """Host CSR adjacency of the strength graph.  Goes through the
    to_scipy host-mirror cache: setup-time planning must NEVER pull
    container arrays back through the device relay — the on-chip trace
    read 153 s for this stage at 1M unknowns when it converted on device
    (CUSP_TPU_SETUP_TRACE, 2026-08-19)."""
    from cusp_autotuned_tpu.backend.reference import to_scipy
    S = to_scipy(C)
    if not hasattr(S, "tocsr"):  # dense container
        import scipy.sparse as sp
        S = sp.csr_matrix(S)
    else:
        S = S.tocsr()
    return np.asarray(S.indptr), np.asarray(S.indices)


def standard_aggregate(C):
    """Vanek's three-pass greedy aggregation over the strength graph C.
    Returns (aggregates (n,), roots (n_agg,)).  Uses the native C++
    implementation when available."""
    n = C.num_rows
    indptr, col = _adj(C)
    from cusp_autotuned_tpu import native
    nat = native.standard_aggregate(indptr, col)
    if nat is not None:
        agg, roots = nat
        return np.asarray(agg), np.asarray(roots)
    agg = np.full(n, -1, np.int64)
    roots = []
    # pass 1: nodes whose whole neighborhood is unaggregated seed aggregates
    for i in range(n):
        nbrs = col[indptr[i]: indptr[i + 1]]
        nbrs = nbrs[nbrs != i]
        if agg[i] == -1 and np.all(agg[nbrs] == -1):
            a = len(roots)
            agg[i] = a
            agg[nbrs] = a
            roots.append(i)
    # pass 2: attach remaining nodes to an adjacent aggregate
    attach = agg.copy()
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = col[indptr[i]: indptr[i + 1]]
        hit = nbrs[agg[nbrs] != -1]
        if hit.size:
            attach[i] = agg[hit[0]]
    agg = attach
    # pass 3: leftovers become their own aggregates (with their unaggregated
    # neighbors)
    for i in range(n):
        if agg[i] != -1:
            continue
        a = len(roots)
        agg[i] = a
        roots.append(i)
        nbrs = col[indptr[i]: indptr[i + 1]]
        for j in nbrs:
            if agg[j] == -1:
                agg[j] = a
    return agg.astype(np.int32), np.asarray(roots, np.int32)


def mis_aggregate(C, seed: int = 0):
    """MIS(2)-rooted aggregation (parity: generic/mis_aggregate.h:117-197):
    roots form an MIS(2) of the strength graph; every other vertex joins the
    nearest root (two rounds of propagation)."""
    from cusp_autotuned_tpu.graph.mis import maximal_independent_set
    n = C.num_rows
    count, stencil = maximal_independent_set(C, k=2, seed=seed)
    stencil = np.asarray(stencil)
    roots = np.nonzero(stencil)[0]
    indptr, col = _adj(C)
    agg = np.full(n, -1, np.int64)
    agg[roots] = np.arange(roots.size)
    # two propagation rounds (every vertex is within 2 hops of a root)
    for _ in range(2):
        newagg = agg.copy()
        for i in range(n):
            if agg[i] != -1:
                continue
            nbrs = col[indptr[i]: indptr[i + 1]]
            hit = nbrs[agg[nbrs] != -1]
            if hit.size:
                newagg[i] = agg[hit[0]]
        agg = newagg
    # safety: stragglers become singletons
    stray = np.nonzero(agg == -1)[0]
    if stray.size:
        extra = np.arange(stray.size) + roots.size
        agg[stray] = extra
        roots = np.concatenate([roots, stray])
    return agg.astype(np.int32), roots.astype(np.int32)

"""Matrix orderings: pseudo-peripheral vertex and symmetric RCM.

Parity: cusp::graph::pseudo_peripheral_vertex / symmetric_rcm (returns a
permutation usable to symmetrically permute the matrix).  Host-side setup
ops — orderings are computed once and produce static permutations.
"""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.formats.permutation import PermutationMatrix, permutation_matrix
from cusp_autotuned_tpu.ops.convert import convert


def _adjacency(G):
    C = convert(G, "csr")
    indptr = np.asarray(C.indptr)
    col = np.asarray(C.col)[: C.nnz]
    return indptr, col


def _bfs_levels_host(indptr, col, src, n):
    levels = np.full(n, -1, np.int64)
    levels[src] = 0
    frontier = [src]
    lvl = 0
    while frontier:
        nxt = []
        for u in frontier:
            for v in col[indptr[u]: indptr[u + 1]]:
                if levels[v] < 0:
                    levels[v] = lvl + 1
                    nxt.append(v)
        frontier = nxt
        lvl += 1
    return levels


def pseudo_peripheral_vertex(G) -> int:
    """A vertex of (near-)maximal eccentricity, found by repeated BFS
    (George–Liu).  Uses the native C++ implementation when available."""
    n = G.num_rows
    indptr, col = _adjacency(G)
    from cusp_autotuned_tpu import native
    v = native.pseudo_peripheral(indptr, col)
    if v is not None:
        return v
    degrees = np.diff(indptr)
    x = int(np.argmin(degrees))
    ecc = -1
    while True:
        levels = _bfs_levels_host(indptr, col, x, n)
        far = levels.max()
        if far <= ecc:
            return x
        ecc = far
        last = np.nonzero(levels == far)[0]
        x = int(last[np.argmin(degrees[last])])


def symmetric_rcm(G) -> PermutationMatrix:
    """Reverse Cuthill–McKee permutation P; apply as P @ A @ P^T to reduce
    bandwidth (and make DIA conversion viable for unstructured matrices).
    Uses the native C++ implementation when available."""
    n = G.num_rows
    indptr, col = _adjacency(G)
    from cusp_autotuned_tpu import native
    perm = native.rcm(indptr, col)
    if perm is not None:
        return permutation_matrix(perm)
    degrees = np.diff(indptr)
    visited = np.zeros(n, bool)
    order = []
    start = pseudo_peripheral_vertex(G)
    pending = [start]
    while len(order) < n:
        if not pending:
            rest = np.nonzero(~visited)[0]
            pending = [int(rest[np.argmin(degrees[rest])])]
        queue = []
        for u in pending:
            if visited[u]:
                continue
            visited[u] = True
            queue.append(u)
        pending = []
        qi = 0
        while qi < len(queue):
            u = queue[qi]
            qi += 1
            order.append(u)
            nbrs = [v for v in col[indptr[u]: indptr[u + 1]]
                    if not visited[v]]
            nbrs.sort(key=lambda v: degrees[v])
            for v in nbrs:
                visited[v] = True
                queue.append(v)
    perm = np.asarray(order[::-1], np.int32)   # reverse for RCM
    return permutation_matrix(perm)

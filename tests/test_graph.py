import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from cusp_autotuned_tpu import gallery, graph
from cusp_autotuned_tpu.backend.reference import from_scipy, to_scipy
from cusp_autotuned_tpu.ops.multiply import multiply
from tests.util import build


def _grid_graph(m=6, n=6):
    return gallery.grid2d(m, n, format="csr")


def _two_components():
    A = sp.block_diag([
        sp.coo_matrix(np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])),
        sp.coo_matrix(np.array([[0, 1], [1, 0]])),
    ]).tocoo()
    return build(A, "csr")


def test_bfs_levels():
    G = _grid_graph(5, 5)
    levels = np.asarray(graph.breadth_first_search(G, 0))
    S = to_scipy(G).tocsr()
    expect = csgraph.breadth_first_order(S, 0, return_predecessors=True)
    dist = csgraph.shortest_path(S, unweighted=True, indices=0)
    np.testing.assert_array_equal(levels, dist.astype(np.int64))


def test_bfs_unreachable():
    G = _two_components()
    levels = np.asarray(graph.breadth_first_search(G, 0))
    assert np.all(levels[:3] >= 0)
    assert np.all(levels[3:] == -1)


def test_bfs_predecessors():
    G = _grid_graph(4, 4)
    pred = np.asarray(graph.breadth_first_search(G, 0, mark_levels=False))
    S = to_scipy(G).tocsr()
    dist = csgraph.shortest_path(S, unweighted=True, indices=0)
    # predecessor must be a true neighbor one level closer
    assert pred[0] == 0
    for v in range(1, G.num_rows):
        p = pred[v]
        assert S[p, v] != 0
        assert dist[p] == dist[v] - 1


def test_connected_components():
    G = _two_components()
    count, labels = graph.connected_components(G)
    labels = np.asarray(labels)
    assert count == 2
    assert len(set(labels[:3])) == 1
    assert len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


@pytest.mark.parametrize("k", [1, 2])
def test_mis(k):
    G = _grid_graph(6, 6)
    count, stencil = graph.maximal_independent_set(G, k=k)
    stencil = np.asarray(stencil)
    S = to_scipy(G).tocsr()
    dist = csgraph.shortest_path(S, unweighted=True)
    sel = np.nonzero(stencil)[0]
    assert count == sel.size > 0
    # independence: pairwise distance > k
    for i in sel:
        for j in sel:
            if i != j:
                assert dist[i, j] > k
    # maximality: every vertex within k hops of the set
    for v in range(G.num_rows):
        assert dist[v, sel].min() <= k


def test_vertex_coloring():
    G = _grid_graph(6, 6)
    ncolors, colors = graph.vertex_coloring(G)
    colors = np.asarray(colors)
    S = to_scipy(G).tocoo()
    for u, v in zip(S.row, S.col):
        if u != v:
            assert colors[u] != colors[v]
    assert ncolors == colors.max() + 1


def test_pseudo_peripheral():
    G = gallery.grid2d(2, 10, format="csr")  # path-like grid
    v = graph.pseudo_peripheral_vertex(G)
    S = to_scipy(G).tocsr()
    dist = csgraph.shortest_path(S, unweighted=True)
    ecc = dist.max(axis=1)
    assert ecc[v] == ecc.max()


def test_symmetric_rcm_reduces_bandwidth():
    rng = np.random.RandomState(0)
    S = gallery.poisson5pt(12, 12, format="coo")
    # random symmetric permutation to scramble bandwidth
    n = S.num_rows
    p = rng.permutation(n)
    Ssc = to_scipy(S).tocsr()[p][:, p].tocoo()
    A = build(Ssc, "csr")
    P = graph.symmetric_rcm(A)
    perm = np.asarray(P.perm)
    reordered = Ssc.tocsr()[perm][:, perm].tocoo()
    bw_before = np.abs(Ssc.row - Ssc.col).max()
    bw_after = np.abs(reordered.row - reordered.col).max()
    assert bw_after < bw_before
    assert np.array_equal(np.sort(perm), np.arange(n))


def test_hilbert_curve():
    rng = np.random.RandomState(1)
    pts = rng.rand(1000, 2)
    parts = np.asarray(graph.hilbert_curve(pts, 4))
    counts = np.bincount(parts, minlength=4)
    assert parts.min() == 0 and parts.max() == 3
    assert counts.max() - counts.min() <= 1
    # locality: same-part points are closer on average than cross-part
    pts3 = rng.rand(500, 3)
    parts3 = np.asarray(graph.hilbert_curve(pts3, 8))
    assert np.bincount(parts3, minlength=8).min() > 0


def test_cc_multi_component_symmetric():
    """Pointer-jumped label propagation matches scipy on a symmetric graph
    with several components (CC semantics are undirected, like the
    reference's)."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as cg
    rng = np.random.RandomState(0)
    blocks = [sp.random(200, 200, density=0.015, random_state=rng)
              + sp.eye(200) for _ in range(4)]
    S = sp.block_diag(blocks).tocsr()
    S = (S + S.T).tocsr()
    A = from_scipy(S.tocoo(), "csr")
    nc, lab = graph.connected_components(A)
    nc_ref, lab_ref = cg.connected_components(S, directed=False)
    assert nc == nc_ref
    pairs = set(zip(np.asarray(lab).tolist(), lab_ref.tolist()))
    assert len(pairs) == nc_ref

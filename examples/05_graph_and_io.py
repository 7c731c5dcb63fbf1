"""Graph algorithms and matrix I/O (reference: examples/Graph,
examples/InputOutput)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np

from cusp_autotuned_tpu import gallery, graph, io


def main():
    G = gallery.grid2d(8, 8, format="csr")

    levels = graph.breadth_first_search(G, src=0)
    print("BFS levels from vertex 0:", np.asarray(levels)[:10], "...")

    count, labels = graph.connected_components(G)
    print("connected components:", count)

    ncolors, colors = graph.vertex_coloring(G)
    print("vertex coloring uses", ncolors, "colors")

    P = graph.symmetric_rcm(G)
    print("RCM permutation head:", np.asarray(P.perm)[:8])

    with tempfile.NamedTemporaryFile(suffix=".mtx") as f:
        io.write_matrix_market_file(G, f.name)
        H = io.read_matrix_market_file(f.name, format="csr")
        print("MatrixMarket roundtrip nnz:", H.nnz)


if __name__ == "__main__":
    main()

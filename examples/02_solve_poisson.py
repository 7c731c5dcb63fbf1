"""The reference README's "simple example": load/build a matrix, solve with
CG, inspect convergence (reference: examples/Algorithms, examples/Monitors)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cusp_autotuned_tpu import gallery, solvers


def main():
    # 2-D Poisson problem on a 100x100 grid, HYB format
    A = gallery.poisson5pt(100, 100, format="hyb", dtype=np.float32)
    b = np.ones(A.num_rows, np.float32)

    monitor = solvers.Monitor(b, iteration_limit=1000,
                              relative_tolerance=1e-6, verbose=False)
    x, monitor = solvers.cg(A, b, monitor=monitor)
    monitor.print()


if __name__ == "__main__":
    main()

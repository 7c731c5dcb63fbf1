"""Matrix-free operators, unordered-triplet assembly, and custom monitors.

Covers three reference example families in one script:
  - examples/LinearOperator/stencil.cu — a user-defined operator (here a
    jit-compiled 5-point stencil apply, no stored matrix) driving cg();
  - examples/MatrixAssembly/unordered_triplets.cu — building a COO matrix
    from unsorted (i, j, v) triplets with duplicates summed;
  - examples/Monitors/{monitor,verbose_monitor}.cu — configuring the
    convergence monitor and reading its statistics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from cusp_autotuned_tpu import solvers
from cusp_autotuned_tpu.formats.coo import coo_matrix
from cusp_autotuned_tpu.operators import make_linear_operator
from cusp_autotuned_tpu.ops.printing import print_matrix


def assembly():
    # ten unordered triplets on a 3x3 grid, duplicates summed (reference
    # sorts with two stable sorts then reduces by (i, j) key)
    I = [2, 0, 1, 2, 1, 0, 2, 0, 1, 0]
    J = [0, 2, 1, 0, 1, 0, 2, 0, 0, 0]
    V = [10.0] * 10
    A = coo_matrix(I, J, V, (3, 3), sum_duplicates=True)
    print(f"assembled 3x3 from 10 triplets -> {A.nnz} unique entries")
    print_matrix(A)
    return A


def matrix_free_cg(nx=64, ny=64):
    # y = A x for the 2-D 5-point Laplacian, written directly on the grid:
    # no matrix is ever stored — the operator is just a jittable function
    def laplacian_apply(x):
        u = x.reshape(nx, ny)
        y = 4.0 * u
        y = y.at[1:, :].add(-u[:-1, :])
        y = y.at[:-1, :].add(-u[1:, :])
        y = y.at[:, 1:].add(-u[:, :-1])
        y = y.at[:, :-1].add(-u[:, 1:])
        return y.reshape(nx * ny)

    A = make_linear_operator(laplacian_apply, shape=(nx * ny, nx * ny))
    b = np.ones(nx * ny, np.float32)

    # a configured monitor: iteration cap, relative tolerance, verbose
    # per-iteration residual printing (reference verbose_monitor.cu)
    monitor = solvers.Monitor(b, iteration_limit=400,
                              relative_tolerance=1e-6, verbose=True)
    x, monitor = solvers.cg(A, b, monitor=monitor)
    print(f"matrix-free CG: {monitor.iteration_count()} iterations, "
          f"converged={monitor.converged()}")
    print(f"geometric convergence rate: "
          f"{monitor.geometric_rate():.4f}")
    r = b - np.asarray(laplacian_apply(jnp.asarray(x)))
    print(f"true residual: {np.linalg.norm(r) / np.linalg.norm(b):.3e}")


def main():
    assembly()
    matrix_free_cg()


if __name__ == "__main__":
    main()

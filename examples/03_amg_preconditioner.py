"""Smoothed-aggregation AMG as a CG preconditioner
(reference: examples/Preconditioners)."""

import numpy as np

from cusp_autotuned_tpu import gallery, precond, solvers


def main():
    A = gallery.poisson5pt(150, 150, format="csr", dtype=np.float64)
    b = np.random.RandomState(0).randn(A.num_rows)

    M = precond.smoothed_aggregation(A)
    M.print()                      # hierarchy + complexity report

    x, mon_amg = solvers.cg(A, b, M=M, monitor=solvers.Monitor(b, 100, 1e-8))
    _, mon_cg = solvers.cg(A, b, monitor=solvers.Monitor(b, 2000, 1e-8))
    print(f"AMG-CG: {mon_amg.iteration_count()} iterations; "
          f"plain CG: {mon_cg.iteration_count()}")


if __name__ == "__main__":
    main()

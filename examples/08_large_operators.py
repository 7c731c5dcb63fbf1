"""Large unstructured operators: planned kernels as solver arguments.

The tuned SpMV kernels plan their entry layout on the host; wrapping the
plan in a PlannedOperator makes the planned arrays pytree LEAVES, so a
jitted Krylov solve receives them as arguments (no embedded constants —
no compile-request size cap, no re-upload per recompile).  Past the VMEM
budget the binned kernel switches to its streamed-window rail
automatically: x and y blocks are pipelined per kernel step, so matrix
size is bounded only by HBM."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cusp_autotuned_tpu import gallery, solvers, autotune
from cusp_autotuned_tpu.operators import planned_operator


def main():
    # an unstructured operator (CSR); the binned kernel plans it
    # (sizes kept small so the example runs in interpret mode on CPU;
    # on TPU the same code was measured at 2.3M rows / 20.8M nnz)
    A = gallery.poisson9pt(120, 120, format="csr", dtype=np.float32)
    op = planned_operator(A, {"impl": "binned", "block_entries": 4096,
                              "col_window": 2048, "row_window": 512})
    b = np.ones(A.num_rows, np.float32)
    x, mon = solvers.cg(op, b, monitor=solvers.Monitor(b, 2000, 1e-5))
    print(f"planned-operator CG: converged={mon.converged()} "
          f"in {mon.iteration_count()} iterations")

    # or let the autotuner pick the configuration (offline search + cache)
    op2 = autotune.tuned_operator(A)
    y = op2(b)
    print(f"tuned operator applied: ||y|| = {float(np.linalg.norm(y)):.3e}")

    # beyond the VMEM budget the streamed rail engages automatically
    # (kept small here so the example stays fast; scale the grid up and
    # the same code runs at tens of millions of nonzeros)
    B = gallery.poisson9pt(150, 150, format="csr", dtype=np.float32)
    op3 = planned_operator(B, {"impl": "binned", "block_entries": 4096,
                               "col_window": 2048, "row_window": 1024,
                               "stream_x": 1})
    r = op3(np.ones(B.num_cols, np.float32))
    print(f"streamed-rail SpMV on {B.num_rows} rows: "
          f"finite={bool(np.all(np.isfinite(np.asarray(r))))}")


if __name__ == "__main__":
    main()

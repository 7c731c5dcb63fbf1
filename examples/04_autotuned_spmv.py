"""The KTT layer reborn: dynamic and offline SpMV autotuning
(reference: the fork's cusp/ktt API, testing/ktt.cu, main.cu)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu import autotune, gallery
from cusp_autotuned_tpu.backend.reference import reference_spmv


def main():
    A = gallery.make_diagonal_symmetric_matrix(100_000, 100_000, 3, 9)
    x = np.random.RandomState(0).randn(A.num_cols).astype(np.float32)

    # offline tuning with per-configuration validation against the oracle
    results = autotune.tune(A, x, reference_computation=reference_spmv)
    for r in results:
        print(f"  {r.status.value:20s} {r.duration_ms:10.3f} ms  "
              f"{r.configuration}")
    best = autotune.get_tuner().best_configuration(A)
    print("best configuration:", best)

    # dynamic mode: every multiply takes one tuning step until the space is
    # exhausted, then runs the best configuration
    autotune.enable()
    for _ in range(3):
        y = ct.multiply(A, x)
    autotune.disable()

    # fixed configuration
    y = autotune.multiply(A, x, configuration=best)


if __name__ == "__main__":
    main()

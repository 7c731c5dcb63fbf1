#!/usr/bin/env python
"""Headline benchmark: DIA SpMV throughput on the 2-D 5-point Poisson
operator (the reference's flagship autotuned format/workload —
performance/spmv + cusp/system/cuda/ktt/dia_multiply.h), via the Pallas
TPU kernel.

Prints ONE JSON line.  value = effective GB/s against the per-format
useful-byte model (analogue of performance/spmv/bytes_per_spmv.h).
vs_baseline = SpMV bandwidth / *measured* stream bandwidth on the same chip
in the same process — a self-calibrated roofline fraction (the reference
publishes no absolute numbers, BASELINE.md, and the tunneled TPU's effective
speed varies per session, so a same-process stream baseline is the honest
denominator; 1.0 = memory-bound optimum).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmarks.harness import time_fn as _timeit, stream_bandwidth_gbps


def main():
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.kernels.variants import build_spmv

    grid = 1000
    A = gallery.poisson5pt(grid, grid, format="dia", dtype=np.float32)
    n = A.num_rows
    x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))

    on_tpu = jax.default_backend() == "tpu"
    config = ({"impl": "pallas", "block_rows": 4096} if on_tpu
              else {"impl": "slices", "block_rows": 0})
    spmv = jax.jit(build_spmv(A, config))
    t_spmv = _timeit(spmv, x)

    itemsize = 4
    k = A.num_diagonals
    useful = (k * A.rows_padded + 2 * n) * itemsize
    spmv_gbps = useful / t_spmv / 1e9

    stream_gbps = stream_bandwidth_gbps(useful)

    print(json.dumps({
        "metric": f"SpMV DIA poisson5pt({grid}x{grid}) bandwidth "
                  f"(stream baseline {stream_gbps:.0f} GB/s)",
        "value": round(spmv_gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(spmv_gbps / stream_gbps, 4),
    }))


if __name__ == "__main__":
    main()

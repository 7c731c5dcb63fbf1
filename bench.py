#!/usr/bin/env python
"""Headline benchmark: DIA SpMV throughput on the 2-D 5-point Poisson
operator (the reference's flagship autotuned format/workload —
performance/spmv + cusp/system/cuda/ktt/dia_multiply.h).

Prints ONE JSON line: effective GB/s against the per-format useful-byte
model (analogue of performance/spmv/bytes_per_spmv.h) and vs_baseline =
fraction of the chip's HBM roofline (the reference publishes no absolute
numbers — BASELINE.md — so roofline fraction is the portable comparison).
"""

import json
import time

import numpy as np


def hbm_peak_gbps(device_kind: str) -> float:
    kind = device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def main():
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.ops.multiply import multiply

    grid = 1000
    A = gallery.poisson5pt(grid, grid, format="dia", dtype=np.float32)
    n = A.num_rows
    x = jnp.ones(n, jnp.float32)

    # chain many SpMVs in one dispatch so device time, not host->device RPC
    # latency, is measured (the damping keeps f32 from overflowing)
    inner = 50

    @jax.jit
    def spmv_chain(A, x):
        return jax.lax.fori_loop(
            0, inner, lambda i, v: multiply(A, v) * 0.125, x)

    jax.block_until_ready(spmv_chain(A, x))  # compile + warm

    reps = 10
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(spmv_chain(A, x))
        best = min(best, (time.perf_counter() - t0) / inner)

    itemsize = 4
    k = A.num_diagonals
    useful_bytes = (k * A.rows_padded * itemsize   # diagonal data read
                    + n * itemsize                 # x read once
                    + n * itemsize)                # y write
    gbps = useful_bytes / best / 1e9
    peak = hbm_peak_gbps(jax.devices()[0].device_kind)
    print(json.dumps({
        "metric": f"SpMV DIA poisson5pt({grid}x{grid}) bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
    }))


if __name__ == "__main__":
    main()

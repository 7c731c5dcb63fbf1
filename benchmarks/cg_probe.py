"""On-chip probe: true per-iteration device time of the jitted CG loop
(plain and AMG-preconditioned), isolated from the fixed ~28 ms dispatch
cost by differencing two forced iteration counts.

Motivation: at 1M unknowns the warm AMG-CG wall reads ~10 ms/iter while
the V-cycle times at ~1.15 ms marginal and the tuned SpMV at ~0.1 ms —
either the combined while_loop program has a hog (loop-carried copies,
an XLA-fallback apply) or the wall methodology overstates per-iter cost.
Forcing rtol=atol=0 makes keep_going run exactly `limit` iterations, so
  per_iter = (wall(limit=K2) - wall(limit=K1)) / (K2 - K1)
cancels the dispatch cost AND any per-solve overhead exactly.

Usage: python benchmarks/cg_probe.py [N] [amg|plain|both]
"""
from __future__ import annotations

import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cusp_autotuned_tpu import gallery, autotune                 # noqa: E402
from cusp_autotuned_tpu.solvers.cg import _cg_loop               # noqa: E402
from cusp_autotuned_tpu.operators import as_operator             # noqa: E402
from cusp_autotuned_tpu.precond.aggregation import \
    smoothed_aggregation                                         # noqa: E402
from cusp_autotuned_tpu.utils.config import enable_compile_cache  # noqa: E402
from benchmarks.harness import time_fn_marginal                  # noqa: E402


def per_iter(op, M, b, k1=12, k2=96, outer=3):
    """Forced-iteration two-point timing of the full jitted solve."""
    Mop = as_operator(M)

    def run(limit, bb):
        x, state = _cg_loop(op, Mop, bb, None, limit, 0.0, 0.0)
        jax.block_until_ready(x)

    run(k1, b)   # compile both executables before timing
    run(k2, b)
    t1 = t2 = float("inf")
    for i in range(outer):
        bb = jax.block_until_ready(b * (1.0 + 0.31 * (i + 1)))
        t0 = time.perf_counter()
        run(k1, bb)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(k2, bb)
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1), t1, t2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    enable_compile_cache()

    A = gallery.poisson5pt(n, n, format="csr", dtype=np.float32)
    print(f"poisson5pt {n}x{n}: {A.num_rows} rows, {A.num_entries} nnz")
    op = autotune.tuned_operator(A)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(A.num_rows).astype(np.float32))

    tm, traw = time_fn_marginal(jax.jit(lambda v, o: o(v)), b, op)
    print(f"tuned SpMV ({getattr(op, 'impl', '?')}): {tm*1e6:.1f} us "
          f"marginal ({traw*1e3:.3f} ms/call)")

    if which in ("plain", "both"):
        it, t1, t2 = per_iter(op, None, b)
        print(f"plain CG per-iter (forced {12} vs {96}): {it*1e3:.3f} ms  "
              f"walls {t1*1e3:.1f}/{t2*1e3:.1f} ms")

    if which in ("amg", "both"):
        t0 = time.perf_counter()
        M = smoothed_aggregation(A, spmv_config={})
        print(f"AMG setup {time.perf_counter()-t0:.1f} s")
        tv, tvraw = time_fn_marginal(jax.jit(lambda v, M_: M_(v)), b, M)
        print(f"V-cycle: {tv*1e3:.3f} ms marginal ({tvraw*1e3:.3f} ms/call)")
        it, t1, t2 = per_iter(op, M, b)
        print(f"AMG-CG per-iter (forced {12} vs {96}): {it*1e3:.3f} ms  "
              f"walls {t1*1e3:.1f}/{t2*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""On-chip probe: where does the AMG V-cycle's per-iteration time go?

BASELINE round 3 records AMG-CG at poisson5pt 1000^2 at 56.6 ms/iter and
at 500^2 at 40.5/25.3 ms/iter — but the sum of the cycle's SpMVs (4 per
level at the measured marginal kernel rates) prices a V-cycle at ~2-3 ms.
This probe times every stage of the built hierarchy marginally so the gap
has a name (a fallback XLA segment-sum on some operator, a per-level
re-preparation, loop-carried copies of the planned arrays, ...).

Usage: python benchmarks/amg_probe.py [N] [spmv_config]
  N           grid side (default 500 -> 250k unknowns)
  spmv_config 'default' (fill-matched binned), 'tune', or 'none'
"""
from __future__ import annotations

import sys
import time

import jax

if __name__ == "__main__" and \
        __import__("os").environ.get("JAX_PLATFORMS") == "cpu":
    # the ambient sitecustomize pins the axon relay; honor an explicit
    # JAX_PLATFORMS=cpu so the probe can be smoke-tested off-chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cusp_autotuned_tpu import gallery                          # noqa: E402
from cusp_autotuned_tpu.precond.aggregation import \
    smoothed_aggregation                                        # noqa: E402
from cusp_autotuned_tpu.ops.multiply import multiply            # noqa: E402
from benchmarks.harness import time_fn_marginal                 # noqa: E402


def _t(label, fn, *args):
    """args[0] MUST be the vector (time_fn chains on the first argument;
    an operator-first signature silently degrades to raw per-call timing,
    marg == raw == the ~0.93 ms relay floor — that bug polluted the first
    round-3 AMG stage numbers)."""
    try:
        t, raw = time_fn_marginal(jax.jit(fn), *args)
        flag = "" if t < 0.97 * raw else "  [UNCHAINED]"
        print(f"  {label:34s} {t*1e6:10.1f} us marginal "
              f"({raw*1e3:7.3f} ms/call){flag}")
        return t
    except Exception as e:  # noqa: BLE001
        print(f"  {label:34s} SKIP {str(e)[:80]}")
        return 0.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    mode = sys.argv[2] if len(sys.argv) > 2 else "default"
    cfg = {"default": {}, "tune": "tune", "none": None}[mode]
    A = gallery.poisson5pt(n, n, format="csr", dtype=np.float32)
    print(f"poisson5pt {n}x{n}: {A.num_rows} rows, {A.num_entries} nnz, "
          f"spmv_config={mode}")
    t0 = time.perf_counter()
    M = smoothed_aggregation(A, spmv_config=cfg)
    print(f"setup {time.perf_counter()-t0:.1f} s")
    M.print()
    for i, lvl in enumerate(M.levels):
        kinds = []
        for nm in ("Aop", "Rop", "Pop"):
            op = getattr(lvl, nm)
            kinds.append(
                f"{nm}={'-' if op is None else getattr(op, 'impl', '?')}")
        print(f"  level {i}: {' '.join(kinds)}")

    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(A.num_rows).astype(np.float32))

    print("stages (marginal):")
    tv = _t("full V-cycle M(b)", lambda b_, M_: M_(b_), b, M)

    total = 0.0
    for i, lvl in enumerate(M.levels):
        nr = lvl.A.num_rows
        v = jnp.asarray(rng.randn(nr).astype(np.float32))
        ta = _t(f"L{i} A apply ({nr} rows)",
                lambda x, op: multiply(op, x, use_autotuning=False),
                v, lvl.apply_op)
        tr = _t(f"L{i} R apply",
                lambda x, op: multiply(op, x, use_autotuning=False),
                v, lvl.restrict_op)
        vc = jnp.asarray(rng.randn(lvl.P.num_cols).astype(np.float32))
        tp = _t(f"L{i} P apply",
                lambda x, op: multiply(op, x, use_autotuning=False),
                vc, lvl.prolong_op)
        ts = _t(f"L{i} postsmooth",
                lambda x_, sm_, op, b_: sm_.postsmooth(op, b_, x_),
                v, lvl.smoother, lvl.apply_op, v)
        tpre = _t(f"L{i} presmooth",
                  lambda b_, sm_, op: sm_.presmooth(op, b_),
                  v, lvl.smoother, lvl.apply_op)
        total += 2 * ta + tr + tp + ts + tpre
    vcoarse = jnp.asarray(rng.randn(M.coarse.n).astype(np.float32))
    total += _t(f"coarse LU inv@b ({M.coarse.n})",
                lambda b_, C: C(b_), vcoarse, M.coarse)
    print(f"  sum of stages                      {total*1e6:10.1f} us "
          f"vs full V-cycle {tv*1e6:.1f} us")


if __name__ == "__main__":
    main()

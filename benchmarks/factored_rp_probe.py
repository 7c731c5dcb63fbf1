"""On-chip probe: factored vs monolithic smoothed-prolongator applies.

The AMG V-cycle is ~2/3 R/P applies (93 us each at poisson5pt 500^2,
amg_probe) while the A applies ride via_dia at 9-12 us.  The smoothed
prolongator is P = (I - s D^-1 A) T with s = omega/rho (parity:
cusp/precond/aggregation/system/detail/generic/smooth_prolongator.h:52-151),
so its apply factors into

    P e = T e - s * Dinv * (A (T e))          (one tentative apply,
    R r = T^T (r - s * A (Dinv * r))           one via_dia A apply,
                                               one elementwise)

where T (tentative) has EXACTLY one entry per row with near-monotone
columns — the easiest possible pattern for the scattered rails — and A
rides the already-planned structured rail.  This probe prices both forms
marginally on chip to decide whether Multilevel should store (T, A, Dinv)
factored operators instead of planning the wide scattered P/R.

Usage: python benchmarks/factored_rp_probe.py [N]
"""
from __future__ import annotations

import sys

import jax

if __name__ == "__main__" and \
        __import__("os").environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cusp_autotuned_tpu import gallery                              # noqa: E402
from cusp_autotuned_tpu.precond.aggregation.strength import (       # noqa: E402
    symmetric_strength_of_connection, rho_Dinv_A)
from cusp_autotuned_tpu.precond.aggregation.aggregate import \
    standard_aggregate                                              # noqa: E402
from cusp_autotuned_tpu.precond.aggregation.tentative import \
    fit_candidates                                                  # noqa: E402
from cusp_autotuned_tpu.precond.aggregation.smooth import \
    smooth_prolongator                                              # noqa: E402
from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy  # noqa: E402
from cusp_autotuned_tpu.ops.multiply import multiply                # noqa: E402
from benchmarks.harness import time_fn_marginal                     # noqa: E402


def _plan(Mx, label):
    from cusp_autotuned_tpu.operators import planned_operator
    from cusp_autotuned_tpu.autotune.cost_model import recommend_config
    cfg, est = recommend_config(Mx)
    op = planned_operator(Mx, cfg)
    print(f"  plan {label:6s} {Mx.shape} nnz={Mx.num_entries:>9} "
          f"-> {cfg.get('impl')} (model {est:.1f} us)")
    return op


def _t(label, fn, *args):
    try:
        t, raw = time_fn_marginal(jax.jit(fn), *args)
        flag = "" if t < 0.97 * raw else "  [UNCHAINED]"
        print(f"  {label:36s} {t*1e6:10.1f} us marginal "
              f"({raw*1e3:7.3f} ms/call){flag}")
        return t
    except Exception as e:  # noqa: BLE001
        print(f"  {label:36s} SKIP {str(e)[:90]}")
        return 0.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    A = gallery.poisson5pt(n, n, format="csr", dtype=np.float32)
    print(f"poisson5pt {n}x{n}: {A.num_rows} rows, {A.num_entries} nnz")

    rho = rho_Dinv_A(A)
    C = symmetric_strength_of_connection(A, 0.0)
    aggregates, _ = standard_aggregate(C)
    B = np.ones(A.num_rows, np.float32)
    T, _ = fit_candidates(aggregates, B)
    P = smooth_prolongator(A, T, omega=4.0 / 3.0, rho_DinvA=rho)
    Psp = to_scipy(P)
    R = from_scipy(Psp.T.tocsr(), "csr", dtype=Psp.dtype)
    Tsp = to_scipy(T)
    Tt = from_scipy(Tsp.T.tocsr(), "csr", dtype=Tsp.dtype)
    scale = np.float32(4.0 / 3.0 / max(rho, 1e-30))
    d = to_scipy(A).diagonal().astype(np.float32)
    dinv = jnp.asarray(np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 1.0))

    Aop = _plan(A, "A")
    Pop = _plan(P, "P")
    Rop = _plan(R, "R")
    Top = _plan(T, "T")
    Ttop = _plan(Tt, "T^T")

    rng = np.random.RandomState(0)
    e = jnp.asarray(rng.randn(P.num_cols).astype(np.float32))
    r = jnp.asarray(rng.randn(A.num_rows).astype(np.float32))

    def p_mono(e_, op):
        return multiply(op, e_, use_autotuning=False)

    def p_fact(e_, top, aop, dv):
        te = multiply(top, e_, use_autotuning=False)
        return te - scale * dv * multiply(aop, te, use_autotuning=False)

    def r_mono(r_, op):
        return multiply(op, r_, use_autotuning=False)

    def r_fact(r_, ttop, aop, dv):
        w = r_ - scale * multiply(aop, dv * r_, use_autotuning=False)
        return multiply(ttop, w, use_autotuning=False)

    # correctness first (host oracle)
    en, rn = np.asarray(e), np.asarray(r)
    ref_p = Psp @ en
    ref_r = Psp.T @ rn
    got_p = np.asarray(p_fact(e, Top, Aop, dinv))
    got_r = np.asarray(r_fact(r, Ttop, Aop, dinv))
    print(f"  factored P err {np.abs(got_p - ref_p).max():.2e}   "
          f"factored R err {np.abs(got_r - ref_r).max():.2e}")

    print("marginal timings:")
    tap = _t("A apply (planned)", p_mono, r, Aop)
    tpm = _t("P apply monolithic", p_mono, e, Pop)
    tt = _t("T apply (planned)", p_mono, e, Top)
    tpf = _t("P apply factored", p_fact, e, Top, Aop, dinv)
    trm = _t("R apply monolithic", r_mono, r, Rop)
    ttt = _t("T^T apply (planned)", r_mono, r, Ttop)
    trf = _t("R apply factored", r_fact, r, Ttop, Aop, dinv)
    print(f"\nsummary: P {tpm*1e6:.0f} -> {tpf*1e6:.0f} us  "
          f"R {trm*1e6:.0f} -> {trf*1e6:.0f} us  "
          f"(A {tap*1e6:.0f}, T {tt*1e6:.0f}, T^T {ttt*1e6:.0f})")


if __name__ == "__main__":
    main()

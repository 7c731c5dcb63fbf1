#!/usr/bin/env python
"""Per-matrix SpMV sweep over the Williams/Bell-Garland stand-in suite.

Parity: performance/spmv/scripts/benchmark.py driving performance/spmv over
the 14-matrix suite + stencils.  For each matrix, a curated set of kernel
configurations is timed (the full tuner space is exhaustive-validated in
tests; here we sweep the distinct STRATEGIES), and the winner is reported
as GB/s against the per-format useful-byte model plus the fraction of
matched-size stream bandwidth.

Usage: python benchmarks/spmv_suite.py [--scale 1.0] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.harness import (setup_backend, time_fn, time_fn_marginal, stream_bandwidth_gbps)


def candidate_configs(rect: bool):
    cfgs = [
        ("segsum", {"impl": "segsum"}),
        ("binned", {"impl": "binned", "block_entries": 4096,
                    "col_window": 2048, "row_window": 512}),
        ("binned-wide", {"impl": "binned", "block_entries": 8192,
                         "col_window": 8192, "row_window": 1024}),
        ("colsort", {"impl": "colsort", "block_entries": 4096,
                     "col_window": 16384, "row_window": 2048}),
        ("colsort-wide", {"impl": "colsort", "block_entries": 16384,
                          "col_window": 131072, "row_window": 4096}),
        ("colsort-wide-h32", {"impl": "colsort", "block_entries": 16384,
                              "col_window": 131072, "row_window": 4096,
                              "hub_rows": 32}),
        ("onehot", {"impl": "pallas", "block_entries": 2048,
                    "col_window": 4096}),
        ("colsort2", {"impl": "colsort2"}),
        ("colsort2-w1", {"impl": "colsort2", "col_window": 16384}),
        ("colsort2-hub8", {"impl": "colsort2", "hub_cap": 8}),
        ("colsort2-k1", {"impl": "colsort2", "vrow_planes": 1}),
        ("colsort2-mix8", {"impl": "colsort2", "vrow_planes": 1,
                           "mix_chunks": 8}),
        ("colsort2-mix4", {"impl": "colsort2", "vrow_planes": 1,
                           "mix_chunks": 4}),
        ("colsort2-mix8-hub8", {"impl": "colsort2", "vrow_planes": 1,
                                "mix_chunks": 8, "hub_cap": 8}),
        ("routed", {"impl": "routed"}),
        ("routed-r128", {"impl": "routed", "vrow_span": 128}),
        ("routed-w2", {"impl": "routed", "win_group": 2}),
        ("routed-r128-hub8", {"impl": "routed", "vrow_span": 128,
                              "hub_cap": 8}),
        # bf16 plan-value storage halves the dominant HBM stream (f32
        # accumulate); validated against the f64 oracle at 1e-2 tolerance
        # by the tuner, here it must still pass the suite's 1e-4 gate on
        # well-conditioned rows or read BADVAL (recorded, not hidden)
        # the Pallas inner kernel is REQUIRED for the bf16 win: XLA's
        # fused path hoists a bf16->f32 convert of the whole data array
        # (measured tie on QCD), while the Pallas kernel upcasts in-reg
        # (measured 28 vs 53 us, benchmarks/dia_qcd_probe.py)
        ("via_dia-bf16", {"impl": "via_dia", "dia_impl": "pallas",
                          "value_dtype": "bfloat16"}),
    ]
    if not rect:
        cfgs.append(("via_dia", {"impl": "via_dia", "dia_impl": "pallas",
                                 "block_rows": 4096}))
    # plain MXU GEMV for dense-enough patterns (guard skips sparse ones)
    cfgs.append(("via_dense", {"impl": "via_dense"}))
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated matrix-name filter (substring match)")
    ap.add_argument("--configs", type=str, default=None,
                    help="comma-separated config-label filter (exact match)")
    ap.add_argument("--no-stencil", action="store_true")
    ap.add_argument("--tuned", action="store_true",
                    help="also run the offline tuner per matrix and report "
                         "its pick (persistent cache reused) — shows the "
                         "search finds the winner without hand-curation")
    ap.add_argument("--out", type=str, default="/tmp/spmv_suite_results.json")
    args = ap.parse_args()

    setup_backend()
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu.gallery.suite import williams_suite, stencil_suite
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.kernels.variants import build_spmv

    # one full-size stream calibration for the whole sweep: the probe's
    # working set must overflow VMEM, so "matched-size" per-row probes are
    # meaningless (a 7 MB probe stays VMEM-resident and reads >5 TB/s)
    stream_gbps = stream_bandwidth_gbps()
    print(json.dumps({"stream_gbps": round(stream_gbps, 1)}))

    suite = williams_suite(args.scale)
    if args.quick:
        keep = ("Protein", "QCD", "Epidemiology", "Webbase", "LP")
        suite = {k: v for k, v in suite.items() if k in keep}
    if args.only:
        pats = [p.strip().lower() for p in args.only.split(",")]
        suite = {k: v for k, v in suite.items()
                 if any(p in k.lower() for p in pats)}

    rows_out = []
    for name, S in suite.items():
        m, n = S.shape
        A = from_scipy(S.tocoo().astype(np.float32), "csr")
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n).astype(np.float32))
        useful = S.nnz * 8 + m * 8
        ref = S.astype(np.float64) @ np.asarray(x, np.float64)
        scale_ref = np.linalg.norm(ref) or 1.0

        results = {}
        cfgs = candidate_configs(rect=(m != n))
        if args.configs:
            want = {c.strip() for c in args.configs.split(",")}
            cfgs = [(lb, c) for lb, c in cfgs if lb in want]
        for label, cfg in cfgs:
            try:
                fn = jax.jit(build_spmv(A, cfg))
                y = np.asarray(jax.block_until_ready(fn(x)))
                err = np.linalg.norm(y - ref) / scale_ref
                # explicit bf16 value storage trades ~3 digits for half
                # the HBM stream; gate it at its own precision class
                tol = 1e-2 if cfg.get("value_dtype") == "bfloat16" else 1e-4
                if err > tol:
                    results[label] = ("BADVAL", err)
                    continue
                tm, t = time_fn_marginal(fn, x)
                results[label] = (t, err, tm)
            except Exception as e:  # noqa: BLE001 — skippable (KTT semantics)
                results[label] = ("SKIP", str(e)[:60])

        st = stream_gbps
        timed = {k: v[0] for k, v in results.items()
                 if isinstance(v[0], float)}
        if not timed:
            print(f"{name}: no config succeeded: {results}")
            continue
        # rank strategies by the MARGINAL (two-point) rate: the fixed
        # ~28 ms dispatch cost over 30 chained reps otherwise drowns every
        # fast kernel at ~0.95 ms/call and the ranking degenerates
        marg = {k: v[2] for k, v in results.items()
                if isinstance(v[0], float)}
        best = min(marg, key=marg.get)
        t_best = timed[best]
        t_marg = max(marg[best], 1e-9)
        base = timed.get("segsum", float("nan"))
        gbps = useful / t_best / 1e9
        marg_gbps = useful / t_marg / 1e9
        row = {
            "matrix": name, "rows": m, "cols": n, "nnz": int(S.nnz),
            "best": best, "ms": round(t_best * 1e3, 3),
            "marginal_ms": round(t_marg * 1e3, 3),
            "gbps": round(gbps, 2), "stream_gbps": round(st, 1),
            "frac": round(gbps / st, 2),
            "marginal_gbps": round(marg_gbps, 2),
            "frac_marginal": round(marg_gbps / st, 2),
            "speedup_vs_default": (round(base / t_best, 1)
                                   if base == base else None),
            "all": {k: (round(v[2] * 1e3, 3) if isinstance(v[0], float)
                        else v[0]) for k, v in results.items()},
        }
        if args.tuned:
            # the real search (testing/ktt.cu spirit): exhaustive walk with
            # oracle validation; its pick is then timed with the same
            # marginal methodology as the curated rows above
            try:
                from cusp_autotuned_tpu.autotune.tuner import Tuner
                from cusp_autotuned_tpu.backend.reference import (
                    reference_spmv,
                )
                tuner = Tuner()
                tuner.tune(A, np.asarray(x),
                           reference_computation=reference_spmv)
                cfg_t = tuner.best_configuration(A, np.asarray(x))
                fn_t = jax.jit(build_spmv(A, cfg_t))
                jax.block_until_ready(fn_t(x))
                tm_t, t_t = time_fn_marginal(fn_t, x)
                row["tuned"] = {
                    "config": cfg_t,
                    "marginal_ms": round(max(tm_t, 1e-9) * 1e3, 3),
                    "marginal_gbps": round(useful / max(tm_t, 1e-9) / 1e9,
                                           2),
                    "vs_curated_best": round(max(tm_t, 1e-9) / t_marg, 2),
                }
            except Exception as e:  # noqa: BLE001
                row["tuned"] = {"error": str(e)[:120]}
            print(json.dumps({"matrix": name, "tuned": row["tuned"]}))
        rows_out.append(row)
        print(json.dumps(row))

    # stencil suite: DIA pallas kernel
    for name, A in ({} if args.no_stencil
                    else stencil_suite(min(args.scale, 1.0))).items():
        m, n = A.shape
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n).astype(np.float32))
        k = A.num_diagonals
        useful = (k * A.rows_padded + 2 * m) * 4
        try:
            fn = jax.jit(build_spmv(A, {"impl": "pallas",
                                        "block_rows": 4096}))
            jax.block_until_ready(fn(x))
            tm, t = time_fn_marginal(fn, x)
        except Exception:  # noqa: BLE001
            fn = jax.jit(build_spmv(A, {"impl": "slices"}))
            jax.block_until_ready(fn(x))
            tm, t = time_fn_marginal(fn, x)
        st = stream_gbps
        gbps = useful / t / 1e9
        marg_gbps = useful / max(tm, 1e-9) / 1e9
        row = {"matrix": name, "rows": m, "nnz": int(k * m),
               "best": "dia-pallas", "ms": round(t * 1e3, 3),
               "marginal_ms": round(tm * 1e3, 3),
               "gbps": round(gbps, 2), "stream_gbps": round(st, 1),
               "frac": round(gbps / st, 2),
               "marginal_gbps": round(marg_gbps, 2),
               "frac_marginal": round(marg_gbps / st, 2)}
        rows_out.append(row)
        print(json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(rows_out, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CPU-side cost-model comparison of the scattered-pattern SpMV rails.

The round-3 finding (docs/roadmap.md): the scattered kernel class is
XLU-bound — the take_along_axis passes dominate, one (128, 128)-tile take
costs ~136 ns on chip, and the one-hot scatter dots ride the otherwise
idle MXU.  A plan's speed-of-light is therefore proportional to its
TILE-TAKE PASS COUNT per rhs, which the planners compute entirely on the
host.  This tool builds the competing plans WITHOUT touching the chip and
prints each one's pass count, fill, and predicted ratio, so planner work
can iterate at CPU speed and the chip only confirms the winner.

Units: one pass = one take/transpose over a (128, 128) tile.
  colsort2: (W + 1) passes per (Bs/128)-tile block → nb * Bs/128 * (W+1)
  routed:   (Wr + 2) passes per 128-row block      → nb * (Wr + 2)
            + its colsort2 tail sub-plan's passes
(parity note: the reference picks kernels by measured time via KTT —
cusp/system/cuda/ktt/multiply.h:106-153; this model is the TPU-side
analytic analogue used to pre-rank before on-chip tuning.)

Usage: python benchmarks/plan_model.py [--scale 1.0] [--only Economics,LP]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCATTERED = ("Dense", "Economics", "FEM/Accelerator", "Circuit",
             "Webbase", "LP")


def tile_passes(stats) -> float:
    """Tile-take passes per rhs implied by a plan_stats dict."""
    if stats["impl"] == "colsort2":
        return stats["nb"] * (stats["Bs"] / 128.0) * (stats["W"] + 1)
    if stats["impl"] == "routed":
        p = stats["nb"] * (stats["Wr"] + 2)
        ts = stats.get("tail_stats")
        if ts:
            p += ts["nb"] * (ts["Bs"] / 128.0) * (ts["W"] + 1)
        return p
    raise ValueError(stats["impl"])


def plan_rows(A, configs):
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    out = {}
    for label, cfg in configs:
        try:
            fn = build_spmv(A, dict(cfg))
            st = getattr(fn, "plan_stats", None)
            if st is None:
                out[label] = {"error": "no plan_stats"}
                continue
            out[label] = {
                "passes": round(tile_passes(st), 1),
                "nb": st["nb"], "fill": st.get("fill"),
                "tail_frac": (round(st["tail"] / max(st["nnz"], 1), 3)
                              if "tail" in st else None),
                "pred_us": round(tile_passes(st) * 0.136, 1),
            }
        except Exception as e:  # noqa: BLE001 — skippable, KTT semantics
            out[label] = {"skip": str(e)[:80]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/plan_model.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    from cusp_autotuned_tpu.backend.reference import from_scipy

    configs = [
        ("colsort2-mix4", {"impl": "colsort2", "vrow_planes": 1,
                           "mix_chunks": 4}),
        ("colsort2-mix8-hub8", {"impl": "colsort2", "vrow_planes": 1,
                                "mix_chunks": 8, "hub_cap": 8}),
        ("routed", {"impl": "routed"}),
        ("routed-r128", {"impl": "routed", "vrow_span": 128}),
        ("routed-w2", {"impl": "routed", "win_group": 2}),
        ("routed-r128-hub8", {"impl": "routed", "vrow_span": 128,
                              "hub_cap": 8}),
    ]

    suite = williams_suite(args.scale)
    names = [n for n in suite if n in SCATTERED]
    if args.only:
        pats = [p.strip().lower() for p in args.only.split(",")]
        names = [n for n in suite if any(p in n.lower() for p in pats)]

    rows = []
    for name in names:
        S = suite[name]
        A = from_scipy(S.tocoo().astype(np.float32), "csr")
        res = plan_rows(A, configs)
        ok = {k: v["passes"] for k, v in res.items() if "passes" in v}
        row = {"matrix": name, "nnz": int(S.nnz),
               "best": (min(ok, key=ok.get) if ok else None),
               "plans": res}
        rows.append(row)
        print(json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

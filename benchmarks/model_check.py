#!/usr/bin/env python
"""Validate the analytic cost model against the archived on-chip sweep.

Parity note: the reference has no analytic selector — it measures every
configuration (KTT Tune, cusp/system/cuda/ktt/multiply.h:106-153).  The TPU
rebuild's `autotune.cost_model.recommend_config` predicts the winning
strategy CLASS host-side with zero compiles; this script checks those
predictions against the measured winners archived by the last full on-chip
sweep (benchmarks/results/williams_r3.json) and prints an agreement table.

Runs entirely on the host (no chip, no XLA compiles): the stand-in suite
is regenerated at the archived scale and the model is asked for its pick.

Usage: python benchmarks/model_check.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _archive_path() -> str:
    """Newest archived full sweep (williams_rN.json with the largest N)."""
    import glob
    import re
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results")
    cands = [p for p in glob.glob(os.path.join(base, "williams_r*.json"))
             if re.fullmatch(r"williams_r(\d+)\.json", os.path.basename(p))]

    def rank(p):
        return int(re.search(r"williams_r(\d+)", p).group(1))
    return max(cands, key=rank) if cands else os.path.join(
        base, "williams_r3.json")


ARCHIVE = _archive_path()

# measured strategy label -> model class label
_CLASS = {
    "segsum": "default",
    "via_dense": "via_dense",
    "via_dia": "via_dia", "via_dia-bf16": "via_dia",
}


def measured_class(label: str) -> str:
    if label in _CLASS:
        return _CLASS[label]
    return "scattered"   # binned / colsort* / routed* / onehot


class _HostCSR:
    """Minimal container shim carrying only what the cost model reads
    (format tag, dtype, host COO mirror) — keeps this check 100% host-side:
    building real containers would upload every suite matrix through the
    device relay when run under the TPU backend (bench.py's sweep)."""

    format = "csr"

    def __init__(self, S):
        C = S.tocoo()
        self.dtype = C.dtype
        self.shape = tuple(C.shape)
        self.nnz = int(C.nnz)
        self._host_coo = (C.row, C.col, C.data, tuple(C.shape))


def check() -> dict:
    """Host-only model-vs-archive comparison; returns the summary dict."""
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    from cusp_autotuned_tpu.autotune.cost_model import predict

    archive = json.load(open(ARCHIVE))
    raw = archive["rows"] if isinstance(archive, dict) else archive
    rows = {r["matrix"]: r for r in raw if "best" in r}
    suite = williams_suite(1.0)

    out, agree = [], 0
    for name, S in suite.items():
        if name not in rows:
            continue
        r = rows[name]
        A = _HostCSR(S.astype(np.float32))
        pred = predict(A)
        feasible = {k: v for k, v in pred.items() if "us" in v}
        best = min(feasible, key=lambda k: feasible[k]["us"])
        want = measured_class(r["best"])
        ok = best == want
        agree += ok
        out.append(dict(
            matrix=name,
            measured_best=r["best"], measured_class=want,
            model_class=best,
            model_us=round(feasible[best]["us"], 1),
            measured_marginal_us=round(r["marginal_ms"] * 1e3, 1),
            agree=ok,
        ))

    return dict(agree=agree, total=len(out), rows=out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    summary = check()
    out = summary["rows"]
    agree = summary["agree"]
    if args.json:
        print(json.dumps(summary, indent=1))
    else:
        print(f"model picks the measured winner class on "
              f"{agree}/{len(out)} Williams rows\n")
        hdr = (f"{'matrix':<16} {'measured':<16} {'class':<10} "
               f"{'model':<10} {'model us':>9} {'meas us':>9}  ok")
        print(hdr)
        for o in out:
            print(f"{o['matrix']:<16} {o['measured_best']:<16} "
                  f"{o['measured_class']:<10} {o['model_class']:<10} "
                  f"{o['model_us']:>9} {o['measured_marginal_us']:>9}  "
                  f"{'Y' if o['agree'] else 'N'}")
    return summary


if __name__ == "__main__":
    main()

"""Offline tuning driver: `python -m cusp_autotuned_tpu.autotune A.mtx`.

The front door the reference exposes through its profiling driver
(main.cu): load a matrix, run the exhaustive offline search with oracle
validation, report every configuration's status/time and the winner, and
leave the result in the persistent cache so later `multiply`/solver runs
dispatch the tuned kernel immediately.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m cusp_autotuned_tpu.autotune",
        description="Offline-tune SpMV for a matrix (KTT tune() analogue)")
    ap.add_argument("matrix", help=".mtx/.bin path, poisson5pt:N[xM], "
                    "or suite:<Williams name>[:scale] (structure-matched "
                    "stand-in, e.g. suite:Economics)")
    ap.add_argument("--format", default="csr",
                    help="container format to tune (default csr)")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--choose-format", action="store_true",
                    help="also search across formats and report the best")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line instead of the table")
    ap.add_argument("--budget", type=float, default=None, metavar="SECONDS",
                    help="stop the walk after this much wall time "
                    "(TuningDuration stop condition); implies the "
                    "model-guided order so the likely winners are "
                    "measured before the long tail")
    ap.add_argument("--order", choices=["deterministic", "model", "random"],
                    default=None,
                    help="walk order (default: model when --budget is "
                    "set, else deterministic)")
    args = ap.parse_args(argv)

    from cusp_autotuned_tpu import autotune, gallery, io
    from cusp_autotuned_tpu.backend.reference import reference_spmv
    from cusp_autotuned_tpu.utils.config import enable_compile_cache

    # offline walks are compile-dominated (one XLA compile per config);
    # the persistent executable cache makes re-walks execution-bound
    enable_compile_cache()

    # a full walk can run for an hour on a slow-relay day: always stream
    # per-config progress to stderr (the table/JSON stays on stdout)
    tuner = autotune.get_tuner()
    if tuner.log_fn is None:
        tuner.log_fn = lambda m: print(m, file=sys.stderr, flush=True)

    dtype = np.dtype(args.dtype)
    if args.matrix.startswith("poisson5pt:"):
        dims = args.matrix.split(":", 1)[1]
        nx, _, ny = dims.partition("x")
        A = gallery.poisson5pt(int(nx), int(ny or nx), format=args.format,
                               dtype=dtype)
    elif args.matrix.startswith("suite:"):
        from cusp_autotuned_tpu.backend.reference import from_scipy
        from cusp_autotuned_tpu.gallery.suite import williams_suite
        parts = args.matrix.split(":")
        name, scale = parts[1], float(parts[2]) if len(parts) > 2 else 1.0
        def norm(t):
            return t.lower().replace("/", "").replace(" ", "")
        suite = williams_suite(scale)
        match = [S for n, S in suite.items() if norm(n) == norm(name)]
        if not match:
            ap.error(f"unknown suite matrix {name!r}; "
                     f"one of {list(suite)}")
        S, = match
        A = from_scipy(S.tocoo().astype(dtype), args.format)
    elif args.matrix.endswith(".bin"):
        A = io.read_binary_file(args.matrix, format=args.format)
    else:
        A = io.read_matrix_market_file(args.matrix, format=args.format,
                                       dtype=dtype)

    rng = np.random.RandomState(0)
    x = rng.randn(A.num_cols).astype(dtype)

    searcher = stop = None
    order = args.order or ("model" if args.budget else None)
    if order == "model":
        from cusp_autotuned_tpu.autotune.search import ModelGuidedSearcher
        searcher = ModelGuidedSearcher(A)
    elif order == "random":
        from cusp_autotuned_tpu.autotune.search import RandomSearcher
        searcher = RandomSearcher()
    if args.budget:
        from cusp_autotuned_tpu.autotune.search import TuningDuration
        stop = TuningDuration(args.budget)

    results = autotune.tune(A, x, reference_computation=reference_spmv,
                            searcher=searcher, stop_condition=stop)
    best = autotune.get_tuner().best_configuration(A, x)
    rows = [{"config": r.configuration, "status": r.status.value,
             "time_ms": (round(r.duration_ms, 3)
                         if np.isfinite(r.duration_ms) else None)}
            for r in results]
    out = {"matrix": args.matrix, "format": A.format,
           "shape": [A.num_rows, A.num_cols], "nnz": int(A.nnz),
           "configs": len(rows),
           "ok": sum(r["status"] == "Ok" for r in rows),
           "best": best}
    if args.budget:
        out["budget_s"] = args.budget
    if order:
        out["order"] = order
    if args.choose_format:
        B, cfg = autotune.choose_format(A, x)
        out["best_format"] = B.format
        out["best_format_config"] = cfg

    if args.json:
        print(json.dumps(out))
    else:
        for r in rows:
            t = f"{r['time_ms']:.3f} ms" if r["time_ms"] is not None else "-"
            print(f"{r['status']:24s} {t:>12s}  {r['config']}")
        print(f"\n{out['ok']}/{out['configs']} Ok; best: {best}")
        if args.choose_format:
            print(f"best format: {out['best_format']} "
                  f"({out['best_format_config']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

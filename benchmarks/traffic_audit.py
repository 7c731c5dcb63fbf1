"""Measured-traffic audit: profiler device time vs the analytic models.

The reference audits its kernels with hardware counters against an
analytic roofline (`dram_read_bytes` vs `min_read_bytes`,
/root/reference/main.cu:560-663).  The TPU analog (VERDICT r3 item 8):
capture a `jax.profiler` device trace — the trace's per-executable
`device_duration_ps` is MEASURED on-device time, independent of both the
host relay (~28 ms/dispatch) and of the two-point marginal methodology —
and compare three channels per kernel:

  measured_us   median per-dispatch device time from the trace
  marginal_us   two-point chained host timing (benchmarks.harness)
  model_us      the analytic prediction (bytes/stream for streaming
                rails; tile-take passes x take_ns for scattered rails)

Agreement of measured_us with marginal_us validates the timing
methodology every BASELINE number rests on; agreement with model_us
validates the byte/pass models the cost-model pre-ranking rests on.

Usage: python benchmarks/traffic_audit.py [--json]
"""
from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.harness import time_fn_marginal           # noqa: E402


from cusp_autotuned_tpu.utils.device_time import (      # noqa: E402
    capture_trace as _capture_trace,                       # noqa: F401
    device_us_per_call, hlo_breakdown,
)


def _row(name, fn, x, model_us, stream_gbps, bytes_model=None):
    jfn = jax.jit(fn)
    tm, _ = time_fn_marginal(jfn, x)
    meas = device_us_per_call(jfn, x)
    marginal_us = tm * 1e6
    out = {"kernel": name, "measured_us": round(meas, 1) if meas else None,
           "marginal_us": round(marginal_us, 1),
           "model_us": round(model_us, 1)}
    if meas:
        out["model_err"] = round(abs(meas - model_us) / meas, 3)
        out["marginal_vs_measured"] = round(marginal_us / meas, 3)
        if bytes_model:
            out["achieved_gbps"] = round(bytes_model / meas / 1e3, 1)
            out["frac_stream"] = round(
                bytes_model / meas / 1e3 / stream_gbps, 3)
    return out


def main():
    as_json = "--json" in sys.argv
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    from benchmarks.harness import stream_bandwidth_gbps
    from benchmarks.plan_model import tile_passes

    stream = stream_bandwidth_gbps()
    take_ns = 136.0
    try:
        from cusp_autotuned_tpu.autotune.calibrate import calibrate
        consts = calibrate(persist=True)
        stream = consts.get("stream_gbps", stream)
        take_ns = consts.get("tile_take_ns", take_ns)
    except Exception:  # noqa: BLE001 — fall back to the probe + literal
        pass

    rows = []

    # 1) DIA on poisson5pt 1M: pure streaming — model = bytes / stream
    A = gallery.poisson5pt(1000, 1000, format="dia", dtype=np.float32)
    fn = build_spmv(A, {"impl": "slices"})
    x = jnp.asarray(np.linspace(-1, 1, A.num_cols).astype(np.float32))
    k = len(A.offsets)
    nbytes = (k * A.rows_padded + 2 * A.num_rows) * 4
    rows.append(_row("dia poisson5pt 1M f32", fn, x,
                     nbytes / stream / 1e3, stream, nbytes))

    # 2) DIA bf16 values: the data stream halves
    fnb = build_spmv(A, {"impl": "slices", "value_dtype": "bfloat16"})
    nbytes_b = (k * A.rows_padded * 2 + 2 * A.num_rows * 4)
    rows.append(_row("dia poisson5pt 1M bf16", fnb, x,
                     nbytes_b / stream / 1e3, stream, nbytes_b))

    # 3) routed on Economics: scattered class — model = plan passes x take
    S = williams_suite(1.0)["Economics"]
    Ae = from_scipy(S.tocoo().astype(np.float32), "csr")
    fe = build_spmv(Ae, {"impl": "routed",
                         "plan_budget_bytes": 1 << 33})
    xe = jnp.asarray(np.random.RandomState(0)
                     .randn(Ae.num_cols).astype(np.float32))
    passes = tile_passes(fe.plan_stats)
    rows.append(_row("routed Economics f32", fe, xe,
                     passes * take_ns / 1e3, stream))

    # 4) colsort2 on Economics (the prior-generation scattered rail)
    fc = build_spmv(Ae, {"impl": "colsort2", "vrow_planes": 1,
                         "mix_chunks": 4, "plan_budget_bytes": 1 << 33})
    passes_c = tile_passes(fc.plan_stats)
    rows.append(_row("colsort2 Economics f32", fc, xe,
                     passes_c * take_ns / 1e3, stream))

    if "--hlo" in sys.argv:
        print("\nper-HLO breakdown: routed Economics (us/call)")
        for nm, us, nb, gbps in hlo_breakdown(jax.jit(fe), xe):
            print(f"  {nm[:56]:56s} {us:8.1f} us {nb/1e6:8.2f} MB "
                  f"{gbps:7.1f} GB/s")

    hdr = (f"{'kernel':28s} {'measured':>9s} {'marginal':>9s} "
           f"{'model':>8s} {'err':>6s} {'GB/s':>7s} {'x stream':>8s}")
    if as_json:
        print(json.dumps({"stream_gbps": round(stream, 1),
                          "take_ns": round(take_ns, 1), "rows": rows}))
    else:
        print(f"stream {stream:.0f} GB/s, tile-take {take_ns:.0f} ns")
        print(hdr)
        for r in rows:
            print(f"{r['kernel']:28s} {str(r['measured_us']):>9s} "
                  f"{r['marginal_us']:>9.1f} {r['model_us']:>8.1f} "
                  f"{str(r.get('model_err', '-')):>6s} "
                  f"{str(r.get('achieved_gbps', '-')):>7s} "
                  f"{str(r.get('frac_stream', '-')):>8s}")


if __name__ == "__main__":
    main()

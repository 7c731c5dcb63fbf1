"""Measured per-dispatch DEVICE time from a jax.profiler trace.

The trace's per-executable ``device_duration_ps`` is time measured ON the
TPU, independent of both the host relay (~28 ms fixed dispatch cost) and
the two-point marginal wall methodology — the rebuild's analog of the
reference's per-config hardware-counter profiling (launcher profile flag
/root/reference/cusp/system/cuda/ktt/dia_multiply.h:168-173, counter loop
/root/reference/main.cu:582-663).  Lives in the package (not just the
benchmarks) so the Tuner can rank walk configurations on this channel
(VERDICT r4 item 4); benchmarks/traffic_audit.py builds its audit on the
same capture.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile

import jax


def capture_trace(jfn, x, reps):
    """Run reps chained jfn dispatches under a jax.profiler trace and
    return (trace_events, device_pids), or (None, None) when no trace
    file appeared."""
    jax.block_until_ready(jfn(x))         # compile outside the trace
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            y = x
            for _ in range(reps):
                y = jfn(y * 1.0)          # fresh input defeats caching
            jax.block_until_ready(y)
        files = sorted(glob.glob(os.path.join(
            td, "plugins/profile/*/*.trace.json.gz")))
        if not files:
            return None, None
        trace = json.loads(gzip.open(files[-1]).read())
    evs = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    return evs, dev_pids


def device_us_per_call(fn, x, reps: int = 8, span_name: str = None):
    """Median measured device time (us) of one fn(x) dispatch, from a
    jax.profiler trace's top-level executable events; None when the trace
    carries no device spans (e.g. on the CPU backend).

    span_name: substring of the executable span to select.  Default wraps
    fn in a named jit; pass an inner jit's name (e.g. '_cg_loop') when fn
    cannot be traced whole (host-side monitor plumbing)."""

    if span_name is None:
        def audited_kernel_fn(v):         # names the trace spans
            return fn(v)
        jfn = jax.jit(audited_kernel_fn)
        span_name = "audited_kernel_fn"
    else:
        jfn = fn
    evs, dev_pids = capture_trace(jfn, x, reps)
    if evs is None:
        return None
    # executable spans carry device_duration_ps without an hlo_category;
    # per-HLO events live on other tids with hlo_category args
    spans = [e["dur"] for e in evs
             if e.get("ph") == "X" and e.get("pid") in dev_pids
             and "device_duration_ps" in e.get("args", {})
             and "hlo_category" not in e.get("args", {})
             and span_name in str(e.get("name", ""))]
    if not spans:
        return None
    spans.sort()
    return float(spans[len(spans) // 2])


def hlo_breakdown(fn, x, reps: int = 6, top: int = 12):
    """Per-HLO device-time breakdown of one dispatch: [(name, us/call,
    bytes_accessed, GB/s)] sorted by time.  Names where a kernel's time
    goes (e.g. routed main pallas vs its colsort2 tail vs the fold)."""
    evs, dev_pids = capture_trace(fn, x, reps)
    if evs is None:
        return []
    agg = {}
    for e in evs:
        a = e.get("args", {})
        if (e.get("ph") != "X" or e.get("pid") not in dev_pids
                or "hlo_category" not in a):
            continue
        nm = e["name"]
        cur = agg.setdefault(nm, [0.0, 0, 0])
        cur[0] += e["dur"]
        cur[1] += 1
        cur[2] = max(cur[2], int(a.get("bytes_accessed", 0) or 0))
    rows = []
    for nm, (tot, cnt, nbytes) in agg.items():
        per_call_us = tot / reps                    # all instances, 1 call
        inst = max(1, round(cnt / reps))            # instances per call
        gbps = (nbytes * inst / per_call_us / 1e3) if per_call_us else 0.0
        rows.append((nm, round(per_call_us, 1), nbytes * inst,
                     round(gbps, 1)))
    rows.sort(key=lambda r: -r[1])
    return rows[:top]

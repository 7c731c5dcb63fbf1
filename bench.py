#!/usr/bin/env python
"""Headline benchmark: DIA SpMV throughput on the 2-D 5-point Poisson
operator (the reference's flagship autotuned format/workload —
performance/spmv + cusp/system/cuda/ktt/dia_multiply.h), via the Pallas
TPU kernel.

Prints ONE JSON line.  value = effective GB/s against the per-format
useful-byte model (analogue of performance/spmv/bytes_per_spmv.h).
vs_baseline = SpMV bandwidth / *measured* stream bandwidth on the same chip
in the same process — a self-calibrated roofline fraction (the reference
publishes no absolute numbers, BASELINE.md, and the tunneled TPU's effective
speed varies per session, so a same-process stream baseline is the honest
denominator; 1.0 = memory-bound optimum).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmarks.harness import (time_fn as _timeit, time_fn_marginal,
                                stream_bandwidth_gbps)


def _sweep(on_tpu, budget_s: float = 300.0, dia_headline=None, x_headline=None,
           progress=None):
    """Compact multi-format sweep folded into the headline JSON so a
    driver-recorded run notices CSR/colsort/SpMM regressions, not just DIA.

    Self-truncating: on a slow-relay day each entry is skipped once the
    time budget is spent, so the headline JSON always prints within the
    driver's window."""
    import time as _time
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from cusp_autotuned_tpu.gallery.suite import _powerlaw
    from cusp_autotuned_tpu.gallery import poisson9pt, poisson5pt
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    from cusp_autotuned_tpu.kernels.pallas_dia import build_dia

    t_start = _time.perf_counter()

    def over_budget():
        return _time.perf_counter() - t_start > budget_s

    out = {}

    def checkpoint():
        """Re-emit the full (headline + sweep-so-far) JSON line after each
        completed step, so a mid-sweep hang/kill still leaves the driver
        the freshest complete line (VERDICT r3 item 1: one degraded
        compile must not erase the whole artifact)."""
        if progress is not None:
            progress(dict(out))

    def put_rate(key, fn, x, numer):
        """Store numer/t for both the chained per-call time (relay floor
        included — comparable to earlier rounds) and the two-point
        marginal time (kernel quality) under key and key+'_marg'."""
        tm, t = time_fn_marginal(fn, x)
        out[key] = round(numer / t / 1e9, 2)
        out[key + "_marg"] = round(numer / max(tm, 1e-9) / 1e9, 2)
        checkpoint()
    # CSR binned on poisson9pt 1M nnz
    A = poisson9pt(333, 333, format="csr", dtype=np.float32)
    cfg = ({"impl": "binned", "block_entries": 8192, "col_window": 2048,
            "row_window": 1024} if on_tpu else {"impl": "segsum"})
    fn = jax.jit(build_spmv(A, cfg))
    x = jnp.asarray(np.random.RandomState(0).randn(A.num_cols)
                    .astype(np.float32))
    useful = A.nnz * 8 + A.num_rows * 8
    put_rate("csr_binned_p9_1m_gbps", fn, x, useful)

    if over_budget():
        out["truncated"] = "budget"
        return out
    # colsort on a power-law matrix (hub pass exercised)
    S = _powerlaw(100_000, 1_000_000, a=1.7, seed=0)
    P = from_scipy(S.tocoo().astype(np.float32), "csr")
    cfg = ({"impl": "colsort", "block_entries": 16384, "col_window": 131072,
            "row_window": 4096} if on_tpu else {"impl": "segsum"})
    fn = jax.jit(build_spmv(P, cfg))
    xp = jnp.asarray(np.random.RandomState(1).randn(P.num_cols)
                     .astype(np.float32))
    put_rate("csr_colsort_powerlaw_1m_gbps", fn, xp,
             S.nnz * 8 + S.shape[0] * 8)

    if over_budget():
        out["truncated"] = "budget"
        return out
    # DIA SpMM k=128
    D = poisson5pt(300, 300, format="dia", dtype=np.float32)
    fn = jax.jit(build_dia(D, {}) if on_tpu
                 else build_spmv(D, {"impl": "slices"}))
    X = jnp.asarray(np.random.RandomState(2).randn(D.num_cols, 128)
                    .astype(np.float32))
    put_rate("dia_spmm_k128_gflops", fn, X, 2 * D.nnz * 128)

    if over_budget():
        out["truncated"] = "budget"
        return out
    # structured SpMM at k=16: the tuner's via_dia move serves CSR inputs
    # through the XLA DIA path (measured 913 GF/s marginal — the binned
    # k-loop rail recorded here in earlier rounds was both CSR-railed and
    # dispatch-floor-polluted at 10 GF/s)
    fn = jax.jit(build_spmv(A, {"impl": "via_dia", "dia_impl": "slices"}
                            if on_tpu else {"impl": "segsum"}))
    Xk = jnp.asarray(np.random.RandomState(3).randn(A.num_cols, 16)
                     .astype(np.float32))
    put_rate("spmm_p9_k16_via_dia_gflops", fn, Xk, 2 * A.nnz * 16)

    if over_budget():
        out["truncated"] = "budget"
        return out
    # scattered SpMM: colsort k-loop rail (Economics-like pattern — the
    # hub-heavy power law above keeps its SpMM in the segsum fallback)
    from cusp_autotuned_tpu.gallery.suite import _scattered
    Ss = _scattered(120_000, 6, seed=8)
    Ps = from_scipy(Ss.tocoo().astype(np.float32), "csr")
    cfg = ({"impl": "colsort", "block_entries": 16384,
            "col_window": 131072, "row_window": 4096, "hub_rows": 32}
           if on_tpu else {"impl": "segsum"})
    fn = jax.jit(build_spmv(Ps, cfg))
    Xp = jnp.asarray(np.random.RandomState(4).randn(Ps.num_cols, 16)
                     .astype(np.float32) * 0.1)
    put_rate("colsort_spmm_scattered_k16_gflops", fn, Xp, 2 * Ss.nnz * 16)

    if over_budget():
        out["truncated"] = "budget"
        return out
    # colsort2 (plane-aligned virtual rows, MXU scatter): SpMV on the
    # power law + SpMM on the scattered pattern
    from cusp_autotuned_tpu.operators import (PlannedOperator,
                                              jit_operator)
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    try:
        if not on_tpu:
            raise RuntimeError("skip: interpret mode too slow at 1M nnz")
        f2 = build_colsort2(P, {"plan_budget_bytes": 1 << 33,
                                "vrow_planes": 1, "mix_chunks": 8,
                                "hub_cap": 8})
        op2 = PlannedOperator(arrays=f2.planned_arrays, build=f2.apply,
                              shape=P.shape)
        put_rate("csr_colsort2_powerlaw_1m_gbps", jit_operator(op2), xp,
                 S.nnz * 8 + S.shape[0] * 8)
        f2s = build_colsort2(Ps, {"plan_budget_bytes": 1 << 33,
                                  "vrow_planes": 1, "mix_chunks": 4,
                                  "spmm_kb": 8})
        op2s = PlannedOperator(arrays=f2s.planned_arrays, build=f2s.apply,
                               shape=Ps.shape)
        put_rate("colsort2_spmm_scattered_k16_gflops", jit_operator(op2s), Xp,
                 2 * Ss.nnz * 16)
    except Exception as e:  # noqa: BLE001
        out["colsort2_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # routed rail (fixed-cost take/transpose/take gather + reshape-sum
    # scatter) SpMV on the scattered pattern; the CPU plan model
    # (benchmarks/plan_model.py) predicts ~1.4x over colsort2-mix4 here
    try:
        if not on_tpu:
            raise RuntimeError("skip: interpret mode too slow at 720k nnz")
        from cusp_autotuned_tpu.kernels.pallas_routed import build_routed
        fr = build_routed(Ps, {"vrow_span": 128,
                               "plan_budget_bytes": 1 << 33})
        opr = PlannedOperator(arrays=fr.planned_arrays, build=fr.apply,
                              shape=Ps.shape)
        xs = jnp.asarray(np.random.RandomState(5).randn(Ps.num_cols)
                         .astype(np.float32))
        put_rate("routed_spmv_scattered_gbps", jit_operator(opr), xs,
                 Ss.nnz * 8 + Ss.shape[0] * 8)
    except Exception as e:  # noqa: BLE001
        out["routed_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # bf16 value storage (TPU-native mixed precision): the same headline
    # DIA kernel with its diagonal data stored at bfloat16 — half the
    # dominant HBM stream; rate stated in f32-EQUIVALENT useful bytes so
    # the speedup reads directly against the f32 headline (solvers.refine
    # recovers f32 accuracy; docs/architecture.md)
    if dia_headline is not None and on_tpu:
        try:
            fb = jax.jit(build_dia(dia_headline,
                                   {"value_dtype": "bfloat16"}))
            useful32 = (dia_headline.num_diagonals
                        * dia_headline.rows_padded
                        + 2 * dia_headline.num_rows) * 4
            put_rate("dia_bf16_spmv_gbps_f32equiv", fb, x_headline, useful32)
        except Exception as e:  # noqa: BLE001
            out["bf16_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # on-chip exhaustive-walk summary (VERDICT r2 item 8): every DIA-space
    # configuration validated against the host oracle, on the real chip
    try:
        from cusp_autotuned_tpu import gallery as _g
        from cusp_autotuned_tpu.autotune.tuner import Tuner
        from cusp_autotuned_tpu.autotune.result import ResultStatus
        from cusp_autotuned_tpu.backend.reference import reference_spmv
        Aw = _g.make_diagonal_symmetric_matrix(512, 512, 2, 5)
        xw = np.linspace(0, 1, 512).astype(np.float32)
        res = Tuner().tune(Aw, xw, reference_computation=reference_spmv)
        ok = sum(r.status == ResultStatus.Ok for r in res)
        out["walk_dia"] = f"{ok}/{len(res)} ok, rest skippable"
        bad = [r for r in res
               if r.status not in (ResultStatus.Ok,
                                   ResultStatus.DeviceLimitsExceeded,
                                   ResultStatus.CompilationFailed)]
        if bad:
            out["walk_dia_bad"] = len(bad)
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["walk_error"] = str(e)[:120]

    # zero-compile strategy selection: the analytic cost model's pick vs
    # the archived on-chip Williams winners (host-only, no relay) —
    # reproducible via python benchmarks/model_check.py.  On chip, the
    # device constants are first re-measured + applied via the gated
    # calibrate() (VERDICT r4 #3: the agreement number must reflect
    # CALIBRATED constants, and a bad calibration must be auto-discarded).
    try:
        if on_tpu and not over_budget():
            try:
                from cusp_autotuned_tpu.autotune.calibrate import (
                    calibrate as _calibrate,
                )
                cal = _calibrate(persist=True, apply=True)
                out["calibration"] = (
                    "rejected" if cal.get("rejected") else
                    f"applied tile_take={cal['tile_take_ns']:.0f}ns "
                    f"stream={cal['stream_gbps']:.0f}GB/s")
            except Exception as e:  # noqa: BLE001
                out["calibration"] = f"error: {str(e)[:80]}"
        from benchmarks.model_check import check as _model_check
        mc = _model_check()
        out["model_vs_archive"] = f"{mc['agree']}/{mc['total']}"
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["model_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # AMG-CG wall clock (warm): the flagship end-to-end result
    try:
        import time as _t
        from cusp_autotuned_tpu import solvers
        from cusp_autotuned_tpu.precond.aggregation import (
            smoothed_aggregation,
        )
        from cusp_autotuned_tpu.solvers.monitor import Monitor
        Aa = poisson5pt(150, 150, format="csr", dtype=np.float64)
        ba = np.ones(Aa.num_rows, np.float64)
        Ma = smoothed_aggregation(Aa)
        xa, mona = solvers.cg(Aa, ba, M=Ma,
                              monitor=Monitor(ba, 100, 1e-10))  # compile
        # timed run solves a DIFFERENT system (the relay memoizes repeated
        # identical computations — BASELINE.md round-2 calibration note)
        ba2 = jnp.asarray(1.01 * np.random.RandomState(7)
                          .rand(Aa.num_rows) + 0.5)
        t0 = _t.perf_counter()
        xa, mona = solvers.cg(Aa, ba2, M=Ma,
                              monitor=Monitor(ba2, 100, 1e-10))
        jax.block_until_ready(xa)
        out["amg_cg_150sq_warm_s"] = round(_t.perf_counter() - t0, 3)
        out["amg_cg_iters"] = mona.iteration_count()
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["amg_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # SA-AMG setup wall at 1M unknowns (VERDICT r4 item 2): warm = second
    # build in-process; the closed-form structured RAP + band-cache setup
    # measured 2.11 s on chip (was ~12 s)
    try:
        import time as _t
        from cusp_autotuned_tpu.precond.aggregation import (
            smoothed_aggregation,
        )
        A1m = poisson5pt(1000, 1000, format="csr", dtype=np.float32)
        t0 = _t.perf_counter()
        M1m = smoothed_aggregation(A1m, spmv_config={})
        out["amg_setup_1m_cold_s"] = round(_t.perf_counter() - t0, 2)
        t0 = _t.perf_counter()
        M1m = smoothed_aggregation(A1m, spmv_config={})
        out["amg_setup_1m_warm_s"] = round(_t.perf_counter() - t0, 2)
        del M1m, A1m
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["amg_setup_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # planned-hierarchy V-cycle marginal (factored R/P + model-guided
    # per-level rails): the kernel-quality number for the AMG hot path
    try:
        from cusp_autotuned_tpu.precond.aggregation import (
            smoothed_aggregation,
        )
        Av = poisson5pt(500, 500, format="csr", dtype=np.float32)
        Mv = smoothed_aggregation(Av, spmv_config={})
        bv = jnp.asarray(np.random.RandomState(5)
                         .randn(Av.num_rows).astype(np.float32))
        tm, _raw = time_fn_marginal(jax.jit(lambda b_, M_: M_(b_)), bv, Mv)
        out["vcycle_500sq_marg_us"] = round(tm * 1e6, 1)
        out["vcycle_rp"] = getattr(Mv.levels[0].Pop, "impl", "?")
        checkpoint()
        # true AMG-CG per-iteration device time: rtol=atol=0 forces the
        # jitted while_loop to run exactly `limit` iterations, so the wall
        # difference of two limits cancels dispatch AND per-solve overhead
        # (benchmarks/cg_probe.py methodology)
        import time as _t
        from cusp_autotuned_tpu import solvers as _sv
        from cusp_autotuned_tpu.solvers.monitor import Monitor as _Mon
        from cusp_autotuned_tpu.autotune import tuned_operator as _tod
        opv = _tod(Av)
        lims = (12, 252)
        devs = []
        from benchmarks.traffic_audit import device_us_per_call
        for lim in lims:
            devs.append(device_us_per_call(
                lambda v, _l=lim: _sv.cg(
                    opv, v, M=Mv, monitor=_Mon(bv, _l, 0.0, 0.0))[0],
                bv, reps=4, span_name="_cg_loop"))
        if devs[0] and devs[1]:
            # profiler device_duration spans: measured ON-DEVICE time of
            # the forced-iteration solves — immune to the relay's wall
            # jitter that made a wall-difference version read negative
            out["amg_cg_500sq_periter_us"] = round(
                (devs[1] - devs[0]) / (lims[1] - lims[0]), 1)
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["vcycle_error"] = str(e)[:120]

    if over_budget():
        out["truncated"] = "budget"
        return out
    # the reference cg.cu headline config (performance/solver/cg.cu:14-42:
    # poisson5pt 1000x1000, rel-tol 1e-5, <=2000 iters) through
    # autotune.tuned_operator with NOTHING tuned — the analytic cost
    # model's zero-compile pick (via_dia for this stencil) carries the
    # whole monitored solve in one while_loop dispatch
    try:
        import time as _t
        from cusp_autotuned_tpu import autotune, solvers
        from cusp_autotuned_tpu.solvers.monitor import Monitor
        Ac = poisson5pt(1000, 1000, format="csr", dtype=np.float32)
        cfgc = autotune.get_tuner().best_configuration(Ac)
        out["cgcu_impl"] = cfgc.get("impl", "?")
        opc = autotune.tuned_operator(Ac)
        rngc = np.random.RandomState(3)
        bc = jnp.asarray(rngc.randn(Ac.num_rows).astype(np.float32))
        xc, monc = solvers.cg(opc, bc, monitor=Monitor(bc, 2000, 1e-5))
        jax.block_until_ready(xc)   # compile + warm
        bc2 = jnp.asarray(np.abs(rngc.randn(Ac.num_rows))
                          .astype(np.float32))
        t0 = _t.perf_counter()
        xc, monc = solvers.cg(opc, bc2, monitor=Monitor(bc2, 2000, 1e-5))
        jax.block_until_ready(xc)
        dt = _t.perf_counter() - t0
        itc = max(1, int(monc.iteration_count()))
        out["cgcu_1m_iters"] = itc
        out["cgcu_1m_s"] = round(dt, 3)
        out["cgcu_1m_ms_per_iter"] = round(1e3 * dt / itc, 3)
        checkpoint()
    except Exception as e:  # noqa: BLE001
        out["cgcu_error"] = str(e)[:120]
    return out


def main():
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    from cusp_autotuned_tpu.utils.config import enable_compile_cache

    # persistent executable cache: repeat driver runs skip the 20-40 s
    # first-compiles (cache keyed on HLO hash — stale entries impossible)
    try:
        enable_compile_cache()
    except Exception:  # noqa: BLE001 — caching is an optimization only
        pass

    grid = 1000
    A = gallery.poisson5pt(grid, grid, format="dia", dtype=np.float32)
    n = A.num_rows
    x = jnp.asarray(np.random.RandomState(0).randn(n).astype(np.float32))

    on_tpu = jax.default_backend() == "tpu"
    config = ({"impl": "pallas"} if on_tpu
              else {"impl": "slices", "block_rows": 0})
    spmv = jax.jit(build_spmv(A, config))
    t_marg, t_spmv = time_fn_marginal(spmv, x)

    itemsize = 4
    k = A.num_diagonals
    useful = (k * A.rows_padded + 2 * n) * itemsize
    spmv_gbps = useful / t_spmv / 1e9

    # full-size stream probe (working set must overflow VMEM; a useful-byte
    # matched probe stays VMEM-resident and reads >1 TB/s of non-HBM rate)
    stream_gbps = stream_bandwidth_gbps()

    # two-point marginal: the relay adds a FIXED ~28 ms per dispatch
    # (NOT a per-iteration floor — see harness.time_fn_marginal); the
    # differenced rate is the kernel-quality number
    marginal_gbps = useful / max(t_marg, 1e-9) / 1e9

    def emit(sweep):
        """Print + flush the COMPLETE metric line with whatever sweep
        content exists so far.  Called once right after the headline and
        again after every completed sweep step — the watchdog parent
        forwards the LAST complete line, so a mid-run relay hang costs
        only the steps that never finished, never the whole artifact
        (VERDICT r3 item 1; reference bar: the always-prints harness
        performance/spmv/benchmark.h:85-178)."""
        sweep = dict(sweep)
        sweep["dia_percall_gbps"] = round(spmv_gbps, 1)
        sweep["dispatch_fixed_ms"] = round(max(t_spmv - t_marg, 0) * 30e3, 1)
        print(json.dumps({
            "metric": f"SpMV DIA poisson5pt({grid}x{grid}) marginal "
                      f"bandwidth (stream baseline {stream_gbps:.0f} GB/s)",
            "value": round(marginal_gbps, 2),
            "unit": "GB/s",
            "vs_baseline": round(marginal_gbps / stream_gbps, 4),
            "sweep": sweep,
        }), flush=True)

    # the headline is measured — flush it NOW, before anything else can
    # hang; every subsequent emit supersedes this line
    emit({"partial": "headline-only"})

    try:
        sweep = _sweep(on_tpu, dia_headline=A, x_headline=x, progress=emit)
    except Exception as e:  # noqa: BLE001 — the headline must still print
        sweep = {"error": str(e)[:200]}
    emit(sweep)


def _fallback_line(err: str) -> str:
    return json.dumps({
        "metric": "SpMV DIA poisson5pt(1000x1000) bandwidth",
        "value": 0.0,
        "unit": "GB/s",
        "vs_baseline": 0.0,
        "error": err[:400],
        # NOT this run's numbers: prior-session on-chip measurements,
        # recorded so an outage run still points at the measured state
        # (full tables + methodology in BASELINE.md)
        "last_good_onchip": {
            "source": "BASELINE.md round-3 (marginal methodology)",
            "dia_headline_marginal_gbps": 875,
            "dia_headline_frac_of_stream": 0.89,
            "spmm_p9_k16_via_dia_gflops": 913,
            "economics_routed_spmv_us": 100,
            "economics_colsort2_spmm_k16_gflops": 15.9,
            "williams_best_marginal_frac": "via_dia rows 0.44-0.74, "
                                           "dense 0.91 (suite log)",
            "walk_dia_onchip": "68/68 ok (round-3 session)",
        },
    })


def _watchdog_reexec(seconds: int) -> int:
    """The relay has been observed to HANG outright (a bare jax.devices()
    blocking forever, immune to SIGALRM because the main thread is stuck
    inside a C call).  A crash is caught in the child below, but a hang
    would leave the driver with no JSON line at all — so the parent
    re-execs itself as a killable child and prints the fallback line if
    the child never delivers one."""
    import subprocess

    env = dict(os.environ, _BENCH_CHILD="1")

    def last_metric_line(stdout):
        """The child emits a complete superseding line after the headline
        and after every sweep step; the freshest one wins."""
        best = None
        for ln in (stdout or "").splitlines():
            if not ln.strip():
                continue
            try:
                if "metric" in json.loads(ln):
                    best = ln
            except (json.JSONDecodeError, TypeError):
                continue
        return best

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=seconds)
        sys.stderr.write(proc.stderr)
        ln = last_metric_line(proc.stdout)
        if ln is not None:
            print(ln)
            return proc.returncode
        print(_fallback_line(
            f"child exited {proc.returncode} without a JSON line"))
        return 1
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else \
                e.stderr.decode(errors="replace")
            sys.stderr.write(err)
        # a hang after N completed steps still leaves N fresh measurements
        # on the child's stdout — forward the last complete line (marked)
        # instead of erasing the run (BENCH_r03 rc=1 had no number at all)
        out = e.stdout if isinstance(e.stdout, str) else \
            (e.stdout.decode(errors="replace") if e.stdout else "")
        ln = last_metric_line(out)
        if ln is not None:
            payload = json.loads(ln)
            payload["watchdog"] = (f"truncated at {seconds}s; headline and "
                                   "completed sweep steps are fresh")
            print(json.dumps(payload))
            return 0
        print(_fallback_line(
            f"watchdog: bench exceeded {seconds}s "
            "(relay hang or degraded compile service)"))
        return 1


if __name__ == "__main__":
    if os.environ.get("_BENCH_CHILD") != "1" \
            and os.environ.get("BENCH_NO_WATCHDOG") != "1":
        sys.exit(_watchdog_reexec(int(os.environ.get("BENCH_WATCHDOG_S",
                                                     "540"))))
    try:
        main()
    except Exception as e:  # noqa: BLE001 — ALWAYS emit the JSON line: the
        # relay's compile service has shown 100x latency variance, hard
        # failures, and full hangs mid-session; a crash here must still
        # record a benchmark line for the driver
        print(_fallback_line(f"{type(e).__name__}: {str(e)[:300]}"))

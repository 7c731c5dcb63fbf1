"""Roofline profiling — the rebuild of the reference's KTT hardware-counter
path (main.cu:560-663: measured dram_read_bytes vs an analytic
min_read_bytes model).

TPU hardware counters aren't exposed here; instead the analytic byte model
is compared against a same-process measured stream bandwidth, and
jax.profiler traces can be captured for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses

import numpy as np


@dataclasses.dataclass
class RooflineReport:
    time_us: float
    model_bytes: int
    achieved_gbps: float
    stream_gbps: float
    roofline_fraction: float
    gflops: float

    def __str__(self):
        return (f"{self.time_us:.1f} us, {self.achieved_gbps:.1f} GB/s vs "
                f"stream {self.stream_gbps:.1f} GB/s "
                f"({self.roofline_fraction:.1%} of roofline), "
                f"{self.gflops:.2f} GFLOP/s")


def min_read_bytes(A) -> int:
    """Analytic minimum HBM traffic for one SpMV (main.cu:560-580 analogue,
    without the 32-byte-transaction quantization — TPU DMA is tile-granular
    and our arrays are lane-aligned)."""
    import sys
    sys.path.insert(0, ".")
    from benchmarks.bytes_per_spmv import bytes_per_spmv
    return bytes_per_spmv(A)


def profile_spmv(A, x, config=None) -> RooflineReport:
    import jax
    from benchmarks.harness import time_fn, stream_bandwidth_gbps
    from cusp_autotuned_tpu.kernels.variants import build_spmv, default_config

    fn = jax.jit(build_spmv(A, config or default_config(A)))
    x = jax.numpy.asarray(x)
    t = time_fn(fn, x)
    model = min_read_bytes(A)
    stream = stream_bandwidth_gbps()
    return RooflineReport(
        time_us=t * 1e6,
        model_bytes=model,
        achieved_gbps=model / t / 1e9,
        stream_gbps=stream,
        roofline_fraction=(model / t / 1e9) / stream,
        gflops=2 * A.nnz / t / 1e9,
    )


def kernel_speed_of_light(fn) -> dict | None:
    """Analytic speed-of-light for a built scattered-rail kernel, from its
    plan_stats: the kernel class is XLU-bound (docs/roadmap.md), so the
    bound is tile-take passes x ~136 ns per 128x128 tile.  Returns
    {passes, pred_us, fill, ...} or None when fn carries no plan.
    (Class analogue of min_read_bytes for the take-pass-bound rails;
    benchmarks/plan_model.py uses the same pricing to rank plans
    host-side.)"""
    st = getattr(fn, "plan_stats", None)
    if not st:
        return None
    import sys
    sys.path.insert(0, ".")
    try:
        from benchmarks.plan_model import tile_passes
        passes = tile_passes(st)
    except (ImportError, ValueError, KeyError):
        return None
    return {
        "impl": st["impl"],
        "tile_passes_per_rhs": passes,
        "pred_us_per_rhs": round(passes * 0.136, 1),
        "fill": st.get("fill"),
        "nb": st.get("nb"),
    }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

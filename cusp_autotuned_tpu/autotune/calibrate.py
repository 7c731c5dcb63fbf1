"""Measure the cost model's device constants on the CURRENT device.

The analytic pre-ranking (autotune.cost_model) prices strategy classes
with four primitive rates — HBM stream, the (128,128)-tile XLU take pass,
XLA random gather, XLA sorted segment-sum.  Those were one-session
literals measured on one v5e (VERDICT r3 weak #8): a different TPU
generation would silently mis-rank rails.  `calibrate()` re-measures all
four in ~5 s of device time and persists them beside the tuning cache,
keyed by `device_kind`; `load()` restores them, and cost_model auto-loads
on first use so the literals in DEVICE_MODEL serve only as fallback.

There is no reference analog — the reference re-measures every candidate
config per matrix (KTT Tune, cusp/system/cuda/ktt/multiply.h:106-153) and
never needs a device model; the TPU rebuild models because each candidate
costs an XLA compile.  The closest parity point is the measured-counter
calibration of main.cu:560-663 (dram_read_bytes vs an analytic model).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

LANE = 128


def default_path(device_kind: Optional[str] = None) -> str:
    """Persisted-calibration location: CUSP_TPU_CALIBRATION if set, else
    next to the tuning cache, else ~/.cache/cusp_autotuned_tpu/."""
    explicit = os.environ.get("CUSP_TPU_CALIBRATION")
    if explicit:
        return explicit
    if device_kind is None:
        import jax
        device_kind = jax.devices()[0].device_kind
    kind = device_kind.replace(" ", "_").replace("/", "_")
    cache = os.environ.get("CUSP_TPU_TUNING_CACHE")
    base = (os.path.dirname(os.path.abspath(cache)) if cache else
            os.path.join(os.path.expanduser("~"), ".cache",
                         "cusp_autotuned_tpu"))
    return os.path.join(base, f"device_model_{kind}.json")


def load(path: Optional[str] = None) -> Optional[Dict[str, float]]:
    """Constants persisted by a previous calibrate() on this device kind,
    or None.  Entries for a DIFFERENT device kind are ignored."""
    import jax
    kind = jax.devices()[0].device_kind
    path = path or default_path(kind)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            blob = json.load(f)
        if blob.get("device_kind") != kind:
            return None
        consts = blob.get("constants")
        return {k: float(v) for k, v in consts.items()} if consts else None
    except (OSError, ValueError, TypeError):
        return None


def _timer():
    """Two-point chained timing.  Prefers benchmarks.harness's
    time_fn_marginal (the validated methodology every archived number
    uses — its own chain was measured to under-read pallas kernels on the
    relay); the compact local chain is only the installed-package
    fallback."""
    import jax
    import jax.numpy as jnp

    try:
        from benchmarks.harness import time_fn_marginal

        def marginal_from_harness(fn, x, reps=None):
            return time_fn_marginal(jax.jit(fn), x)[0]
        return marginal_from_harness
    except ImportError:
        pass

    on_tpu = jax.default_backend() == "tpu"

    def marginal_s(fn, x, reps=(8, 64)):
        """Seconds per application of fn, fn: array -> same-shape array."""
        def chain(n, v):
            def body(i, u):
                return jax.lax.optimization_barrier(
                    fn(u) * 0.125 + v * 0.875)
            return jax.lax.fori_loop(0, n, body, v)

        jc = jax.jit(chain)
        r1, r2 = (reps if on_tpu else (2, 6))
        jc(jnp.asarray(r1, jnp.int32), x).reshape(-1)[0].item()  # compile
        times = []
        for j, r in enumerate((r1, r2)):
            best = float("inf")
            for i in range(2):
                # O(1)-scaled fresh inputs defeat the relay's
                # value-fingerprint request cache
                xi = jax.block_until_ready(x * (1.0 + (2 * j + i + 1) * 0.41))
                t0 = time.perf_counter()
                jc(jnp.asarray(r, jnp.int32), xi).reshape(-1)[0].item()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return max(times[1] - times[0], 1e-12) / (r2 - r1)

    return marginal_s


_TAKE_PASSES = (2, 18)  # two-point pass counts; difference isolates takes

# The probe isolates one take + masked-select step (~76 ns on the v5e it
# was anchored on); the scattered-rail plan models price an EFFECTIVE
# pass that also carries the per-block transposes, plan-plane reads and
# grid overhead amortized over W passes — fitted at ~136 ns from the
# round-5 per-block device-time law (BASELINE.md).  The probe is the
# device-scaling index; this factor is the kernel-structure overhead,
# assumed device-independent.
_EFFECTIVE_PASS_FACTOR = 136.0 / 76.0


def _take_probe_build(passes: int, idx, G: int):
    """(128,128)-tile take probe with INDEPENDENT takes: every pass reads
    the kernel's VMEM-resident x block through its OWN index plane, like
    the scattered rails do (kernels/pallas_routed.py:389-393 — plan index
    planes applied to the x window).  A dependent chain
    (`acc = take(acc, ix)` with one shared plane) measures ~68 ns on v5e
    — half the ~136 ns real kernels track — because the composed
    same-source permutations don't exercise the per-pass VMEM read the
    plan model prices (VERDICT r4 weak #1).  The output is the weighted
    sum of the per-pass takes, so tests can pin independence numerically:
    a chained implementation composes the permutations and produces a
    different value."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    p_max = max(_TAKE_PASSES)

    def kernel(idx_ref, x_ref, o_ref):
        # one pass = take + masked select, exactly the scattered rails'
        # per-window step (pallas_routed.run_rhs: g_w = take(x, lam);
        # t1 = where(wsel == w, g_w, t1)) — the select is part of the
        # pass the plan models price, and dropping it reads ~68 ns (the
        # bare take primitive) instead of the ~136 ns kernels track
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for p in range(passes):
            ix = idx_ref[p * LANE:(p + 1) * LANE, :]
            g = jnp.take_along_axis(x, ix, axis=1) * (1.0 + 0.001 * p)
            acc = jnp.where(ix % 2 == p % 2, g + acc, acc)
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((p_max * LANE, LANE), lambda g: (0, 0)),
                  pl.BlockSpec((LANE, LANE), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((LANE, LANE), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((G * LANE, LANE), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    return lambda x: call(idx, x)


def _take_probe_planes(rng) -> np.ndarray:
    """One distinct permutation plane per pass, stacked along sublanes."""
    p_max = max(_TAKE_PASSES)
    return np.concatenate(
        [np.stack([rng.permutation(LANE) for _ in range(LANE)])
         for _ in range(p_max)], axis=0).astype(np.int32)


def _measure_tile_take_ns(marginal_s) -> float:
    """One (128,128)-tile take_along_axis pass inside a Pallas kernel —
    the unit the scattered-class plan model prices (plan passes x this)."""
    import jax
    import jax.numpy as jnp

    G = 64 if jax.default_backend() == "tpu" else 2
    rng = np.random.RandomState(0)
    idx = jnp.asarray(_take_probe_planes(rng))

    x = jnp.asarray(rng.randn(G * LANE, LANE).astype(np.float32))
    p_lo, p_hi = _TAKE_PASSES
    t_lo = marginal_s(_take_probe_build(p_lo, idx, G), x)
    t_hi = marginal_s(_take_probe_build(p_hi, idx, G), x)
    return max(t_hi - t_lo, 1e-12) / (G * (p_hi - p_lo)) * 1e9


def _measure_xla_ns(marginal_s) -> Dict[str, float]:
    """Per-element cost of the XLA primitives the default path uses."""
    import jax
    import jax.numpy as jnp

    n = 200_000 if jax.default_backend() == "tpu" else 20_000
    rng = np.random.RandomState(1)
    gidx = jnp.asarray(rng.randint(0, n, size=n).astype(np.int32))
    seg = jnp.asarray(np.sort(rng.randint(0, n, size=n)).astype(np.int32))
    x = jnp.asarray(rng.randn(n).astype(np.float32))

    gather_s = marginal_s(lambda v: v[gidx], x)
    segsum_s = marginal_s(
        lambda v: jax.ops.segment_sum(v, seg, num_segments=n,
                                      indices_are_sorted=True), x)
    return dict(gather_ns=gather_s / n * 1e9, segsum_ns=segsum_s / n * 1e9)


def _model_check_guard(consts: Dict[str, float]) -> Optional[Dict]:
    """Run the archived model-vs-measured agreement check WITH `consts`
    temporarily applied.  Returns the summary dict, or None when the
    benchmarks package / archive isn't importable (installed-package use).
    The guard exists so a bad calibration (e.g. a probe methodology bug
    halving a rate) cannot silently re-rank every model-guided walk: the
    archive encodes 14 measured on-chip winners, and constants that stop
    the model from picking them are wrong for this device."""
    try:
        from benchmarks.model_check import check
    except ImportError:
        return None
    from cusp_autotuned_tpu.autotune import cost_model
    saved = dict(cost_model.DEVICE_MODEL)
    try:
        cost_model.DEVICE_MODEL.update(
            {k: v for k, v in consts.items() if k in cost_model.DEVICE_MODEL})
        cost_model._SLOT_NS.clear()
        return check()
    except Exception:  # noqa: BLE001 — missing archive == can't guard
        return None
    finally:
        cost_model.DEVICE_MODEL.clear()
        cost_model.DEVICE_MODEL.update(saved)
        cost_model._SLOT_NS.clear()


def calibrate(persist: bool = True, path: Optional[str] = None,
              apply: bool = True, guard: bool = True) -> Dict[str, float]:
    """Measure {stream_gbps, tile_take_ns, gather_ns, segsum_ns} on the
    current device (~5 s), optionally persist them (JSON beside the tuning
    cache) and apply them to cost_model.DEVICE_MODEL in place.

    Before persisting/applying, the constants are gated on the archived
    model-vs-measured check (benchmarks/model_check.py): if applying them
    would drop strategy-class agreement below total-1 (13/14 on the
    Williams archive), they are DISCARDED with a warning — returned dict
    gains ``{"rejected": True, "model_agree": a, "model_total": t}`` and
    neither DEVICE_MODEL nor the on-disk file changes (VERDICT r4 #3).
    Pass ``guard=False`` to skip (e.g. when measuring a brand-new device
    kind where the archive's winners may legitimately differ)."""
    import jax
    import warnings

    try:
        from benchmarks.harness import stream_bandwidth_gbps
        stream = float(stream_bandwidth_gbps())
    except ImportError:
        stream = _stream_gbps_local()

    marginal_s = _timer()
    consts: Dict[str, float] = dict(stream_gbps=stream)
    probe_ns = float(_measure_tile_take_ns(marginal_s))
    consts["tile_take_probe_ns"] = probe_ns
    consts["tile_take_ns"] = probe_ns * _EFFECTIVE_PASS_FACTOR
    consts.update(_measure_xla_ns(marginal_s))

    if guard and (persist or apply):
        mc = _model_check_guard(consts)
        if mc is not None:
            consts["model_agree"] = mc["agree"]
            consts["model_total"] = mc["total"]
            if mc["agree"] < mc["total"] - 1:
                warnings.warn(
                    f"calibrate(): measured constants rejected — model "
                    f"agreement {mc['agree']}/{mc['total']} < "
                    f"{mc['total'] - 1} on the archived sweep; keeping "
                    f"prior DEVICE_MODEL (pass guard=False to override)",
                    stacklevel=2)
                consts["rejected"] = True
                return consts
        else:
            warnings.warn(
                "calibrate(): model-check guard unavailable (benchmarks "
                "package or archive missing) — applying unguarded",
                stacklevel=2)

    kind = jax.devices()[0].device_kind
    if persist:
        p = path or default_path(kind)
        d = os.path.dirname(p)
        if d:   # bare filename = current directory, nothing to create
            os.makedirs(d, exist_ok=True)
        with open(p, "w") as f:
            json.dump({"device_kind": kind, "constants": consts,
                       "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")},
                      f, indent=1)
    if apply:
        from cusp_autotuned_tpu.autotune import cost_model
        cost_model.DEVICE_MODEL.update(
            {k: v for k, v in consts.items() if k in cost_model.DEVICE_MODEL})
        cost_model._SLOT_NS.clear()
    return consts


def _stream_gbps_local() -> float:
    """Fallback triad stream probe when benchmarks.harness is absent
    (installed-package use): Pallas read+read+write over a >VMEM working
    set, two-point chained."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    on_tpu = jax.default_backend() == "tpu"
    nbytes = (256 << 20) if on_tpu else (8 << 20)
    BR = 2048
    rows = max(BR, nbytes // (4 * LANE) // BR * BR)
    nb = rows // BR

    def triad_kernel(x_ref, y_ref):
        y_ref[...] = y_ref[...] * 0.5 + x_ref[...] * 0.25

    def total_s(reps, scale):
        call = pl.pallas_call(
            triad_kernel,
            grid=(reps, nb),
            in_specs=[pl.BlockSpec((BR, LANE), lambda r, b: (b, 0))],
            out_specs=pl.BlockSpec((BR, LANE), lambda r, b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            interpret=not on_tpu,
        )
        x = jnp.full((rows, LANE), np.float32(scale))
        jax.block_until_ready(call(x))
        t0 = time.perf_counter()
        call(x).reshape(-1)[0].item()
        return time.perf_counter() - t0

    r1, r2 = (4, 16) if on_tpu else (1, 2)
    t1 = total_s(r1, 1.0)
    t2 = total_s(r2, 1.37)
    per_rep = max(t2 - t1, 1e-9) / (r2 - r1)
    return rows * LANE * 4 * 3 / per_rep / 1e9

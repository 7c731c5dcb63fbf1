"""Shared benchmark harness (parity: performance/timer.h +
performance/spmv/benchmark.h:85-178 — repeated timed runs reporting GFLOP/s,
GB/s, and L2 error vs the host oracle).

Timing: N dispatches enqueued asynchronously, blocked once (device time, not
per-dispatch RPC latency), min over outer repetitions; plus a same-process
stream-bandwidth calibration so roofline fractions are meaningful on the
tunneled TPU whose effective speed varies per session."""

from __future__ import annotations

import time

import numpy as np


def setup_backend() -> None:
    """Honor JAX_PLATFORMS even under site customizations that register the
    TPU tunnel unconditionally (see .claude/skills/verify/SKILL.md)."""
    import os
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)


def _on_tpu() -> bool:
    import jax
    return jax.default_backend() == "tpu"


def _sink(out) -> None:
    """Force materialization by reading a VALUE back.  On the relayed TPU
    `block_until_ready` can return while the computation is still pending
    (measured: a 64 MB x 240-iteration chain "completed" in 0.2 ms but
    took 95 ms when its sum was read), so every timed call must end in a
    scalar readback; the extra fixed readback cost cancels in the
    two-point marginal."""
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "reshape") and getattr(leaf, "size", 0) > 0:
            leaf.reshape(-1)[0].item()


def time_fn(f, *args, reps: int | None = None, outer: int | None = None) -> float:
    """Seconds per call.

    When f maps its first argument to a same-shape/dtype output (the square
    SpMV / elementwise case), iterations are CHAINED — each output feeds the
    next input inside one jitted fori_loop — so the measurement cannot be
    served from any request cache and RPC latency amortizes.  Rectangular
    operators chain through a slice/pad projection back to the input space.
    Only shapeless results fall back to async-enqueue timing (repeated
    identical dispatches), which on relayed devices is only a lower bound.

    Callables that are pytrees (PlannedOperator etc.) ride the jitted chain
    as ARGUMENTS — closing over them would embed their planned arrays as
    constants in the compile request, which the relay size-caps."""
    import jax
    import jax.numpy as jnp
    if reps is None:
        reps = 30 if _on_tpu() else 3
    if outer is None:
        outer = 4 if _on_tpu() else 2

    x0 = args[0] if args else None
    rest = args[1:]
    y0 = None
    if isinstance(x0, jnp.ndarray):          # probe only when chainable
        try:
            y0 = f(*args)
        except Exception:  # noqa: BLE001
            y0 = None

    f_leaves = jax.tree_util.tree_leaves(f)
    f_is_pytree = bool(f_leaves) and not (len(f_leaves) == 1
                                          and f_leaves[0] is f)

    def proj(u):
        for ax in range(x0.ndim):
            if u.shape[ax] > x0.shape[ax]:
                u = jax.lax.slice_in_dim(u, 0, x0.shape[ax], axis=ax)
            elif u.shape[ax] < x0.shape[ax]:
                pad = [(0, 0)] * x0.ndim
                pad[ax] = (0, x0.shape[ax] - u.shape[ax])
                u = jnp.pad(u, pad)
        return u

    chainable = (isinstance(x0, jnp.ndarray) and isinstance(y0, jnp.ndarray)
                 and y0.dtype == x0.dtype and y0.ndim == x0.ndim)
    if chainable:
        # damping + mixing the ORIGINAL input back in each iteration:
        # damping keeps magnitudes bounded, the x-mix keeps the output
        # genuinely input-dependent (a pure contraction converges to an
        # input-independent fixed point, which the relay detects and serves
        # from its memo cache — reporting terabytes/s); the optimization
        # barrier forces each iteration to materialize
        # the iteration count rides the jitted chain as a dynamic argument
        # so a single executable serves every reps value (time_fn_marginal
        # re-times at a larger reps without a second compile)
        def chain_body(fop, n, x, *rest):
            def body(i, v):
                return jax.lax.optimization_barrier(
                    proj(fop(v, *rest)) * 0.125 + x * 0.875)
            return jax.lax.fori_loop(0, n, body, x)

        if f_is_pytree:
            chain_op = jax.jit(chain_body)

            def chain(n, x, *rest):
                return chain_op(f, n, x, *rest)
        else:
            @jax.jit
            def chain(n, x, *rest):
                return chain_body(f, n, x, *rest)

        # materially distinct input per outer repetition: the relay serves
        # repeated requests from a cache keyed on a LOW-PRECISION value
        # fingerprint (measured: a 2^-16 perturbation — invisible in bf16 —
        # still hits the cache), so scale by O(1) factors
        if jnp.issubdtype(x0.dtype, jnp.inexact):
            xs = [jax.block_until_ready(x0 * (1.0 + (i + 1) * 0.37))
                  for i in range(outer)]
        else:
            xs = [x0] * outer
        n_arr = jnp.asarray(reps, jnp.int32)
        _sink(chain(n_arr, x0, *rest))
        best = float("inf")
        for i in range(outer):
            t0 = time.perf_counter()
            _sink(chain(n_arr, xs[i], *rest))
            best = min(best, (time.perf_counter() - t0) / reps)
        if _marginal_ctx:
            _marginal_ctx[-1] = (chain, xs, rest, reps, best)
        return best

    _sink(f(*args))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        ys = [f(*args) for _ in range(reps)]
        _sink(ys[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


_marginal_ctx: list = []


def time_fn_marginal(f, *args, reps_scale: int = 8,
                     threshold_s: float = 3e-3):
    """(marginal_s, per_call_s): the two-point chained measurement.

    The relayed TPU adds a FIXED ~20-30 ms cost to every dispatch; a
    single chained timing at N reps therefore reads fixed/N + t_kernel
    per call (round 1/2 misread this as a "0.85 ms per-iteration floor"
    — it is 28 ms / 30 reps).  Timing the SAME compiled chain at N and
    at reps_scale*N reps and differencing cancels the fixed cost exactly:
    marginal = (T2 - T1) / (N2 - N1).  Skipped (marginal = per_call) when
    the first timing is already above `threshold_s` per call — the fixed
    cost is then noise — or when the call is not chainable."""
    import jax
    import jax.numpy as jnp
    _marginal_ctx.append(None)
    try:
        t1 = time_fn(f, *args)
        ctx = _marginal_ctx[-1]
    finally:
        _marginal_ctx.pop()
    if ctx is None or t1 > threshold_s or not _on_tpu():
        return t1, t1
    chain, xs, rest, reps1, best1 = ctx
    reps2 = reps1 * reps_scale
    n2 = jnp.asarray(reps2, jnp.int32)
    # FRESH input values: the relay dedups requests by a low-precision
    # value fingerprint of the ARRAYS — a different dynamic reps count
    # alone does not miss the cache (measured: a reused input read
    # 4.3 TB/s "stream")
    if jnp.issubdtype(xs[0].dtype, jnp.inexact):
        x2s = [jax.block_until_ready(xs[i] * (1.0 + (i + 1) * 0.53))
               for i in range(min(2, len(xs)))]
    else:
        x2s = xs[:2]
    best2 = float("inf")
    for xi in x2s:
        t0 = time.perf_counter()
        _sink(chain(n2, xi, *rest))
        best2 = min(best2, time.perf_counter() - t0)
    marg = max(best2 - best1 * reps1, 0.0) / (reps2 - reps1)
    if marg * reps2 < 15e-3:
        # delta below the dispatch jitter (~+-10 ms): refine at 8x reps
        reps3 = reps2 * 8
        n3 = jnp.asarray(reps3, jnp.int32)
        best3 = float("inf")
        for j, xi in enumerate(x2s):
            xj = jax.block_until_ready(xi * (1.0 + (j + 1) * 0.29))
            t0 = time.perf_counter()
            _sink(chain(n3, xj, *rest))
            best3 = min(best3, time.perf_counter() - t0)
        marg = max(best3 - best2, 0.0) / (reps3 - reps2)
    return max(marg, 0.0), t1


def stream_bandwidth_gbps(nbytes: int | None = None) -> float:
    """Measured streaming bandwidth for roofline calibration.

    The probe is a PALLAS triad kernel, not an XLA elementwise chain: the
    relay symbolically collapses simple affine XLA programs (a 64 MB FMA
    chain "ran" at 250 TB/s under every input perturbation tried), while
    Mosaic payloads execute for real.  Two-point chained timing cancels
    the fixed per-dispatch cost; counts the chain's 5 accesses x 4 bytes
    per element per iteration (pallas read+write, mix read+read+write)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    if nbytes is None:
        # the in+out working set must overflow VMEM (~128 MB) or the
        # revisited blocks never touch HBM and the probe reads >1.8 TB/s
        nbytes = (256 << 20) if _on_tpu() else (8 << 20)
    BR = 2048
    rows = max(BR, nbytes // (4 * 128) // BR * BR)
    nb = rows // BR

    def triad_kernel(x_ref, y_ref):
        # read y, read x, write y — exactly 3 accesses per visit, all
        # inside Mosaic (nothing for the relay to fold away)
        y_ref[...] = y_ref[...] * 0.5 + x_ref[...] * 0.25

    def total_s(reps, scale):
        call = pl.pallas_call(
            triad_kernel,
            grid=(reps, nb),
            in_specs=[pl.BlockSpec((BR, 128), lambda r, b: (b, 0))],
            out_specs=pl.BlockSpec((BR, 128), lambda r, b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), np.float32),
            interpret=not _on_tpu())
        f = jax.jit(call)
        a = jnp.asarray(
            (np.random.RandomState(3).randn(rows, 128) * scale)
            .astype(np.float32))
        _sink(f(a))
        best = float("inf")
        for i in range(2):
            ai = jax.block_until_ready(a * (1.3 + 0.7 * i))
            t0 = time.perf_counter()
            _sink(f(ai))
            best = min(best, time.perf_counter() - t0)
        return best

    # the fixed dispatch cost jitters by +-10 ms between calls; the rep
    # delta must dwarf it or the difference is noise (a 20-rep delta once
    # read 114 GB/s on a 1.6 TB/s chip)
    r1, r2 = (4, 96) if _on_tpu() else (1, 2)
    t1 = min(total_s(r1, 1.0), total_s(r1, 3.1))
    t2 = min(total_s(r2, 2.1), total_s(r2, 4.3))
    marg = max(t2 - t1, 1e-9) / (r2 - r1)
    return (rows * 128 * 3 * 4) / marg / 1e9


def l2_error(y, expected) -> float:
    y = np.asarray(y, np.float64)
    expected = np.asarray(expected, np.float64)
    denom = np.linalg.norm(expected)
    return float(np.linalg.norm(y - expected) / (denom if denom else 1.0))


def relay_floor_s() -> float:
    """The relay's per-chained-iteration latency floor for PALLAS calls,
    measured with the same chained harness on a near-empty one-step
    kernel.  (A plain XLA op chains at ~2 us/iter — the ~0.9 ms floor
    attaches to Pallas kernel dispatch through the relay, so the probe
    must be a pallas_call.)  Subtracting it from a chained per-call time
    gives the MARGINAL on-chip rate — the kernel-quality number; raw
    per-call times conflate tunnel latency with kernel speed."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def copy_kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.0000001 + 0.125

    tiny = jnp.asarray(
        np.random.RandomState(9).randn(8, 128).astype(np.float32))
    call = pl.pallas_call(
        copy_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), np.float32),
        interpret=not _on_tpu())
    return time_fn(jax.jit(call), tiny)

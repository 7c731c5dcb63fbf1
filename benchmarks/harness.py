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
        def chain_body(fop, x, *rest):
            def body(i, v):
                return jax.lax.optimization_barrier(
                    proj(fop(v, *rest)) * 0.125 + x * 0.875)
            return jax.lax.fori_loop(0, reps, body, x)

        if f_is_pytree:
            chain_op = jax.jit(chain_body)

            def chain(x, *rest):
                return chain_op(f, x, *rest)
        else:
            @jax.jit
            def chain(x, *rest):
                return chain_body(f, x, *rest)

        # materially distinct input per outer repetition: the relay serves
        # repeated requests from a cache keyed on a LOW-PRECISION value
        # fingerprint (measured: a 2^-16 perturbation — invisible in bf16 —
        # still hits the cache), so scale by O(1) factors
        if jnp.issubdtype(x0.dtype, jnp.inexact):
            xs = [jax.block_until_ready(x0 * (1.0 + (i + 1) * 0.37))
                  for i in range(outer)]
        else:
            xs = [x0] * outer
        jax.block_until_ready(chain(x0, *rest))
        best = float("inf")
        for i in range(outer):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(xs[i], *rest))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        ys = [f(*args) for _ in range(reps)]
        jax.block_until_ready(ys[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def stream_bandwidth_gbps(nbytes: int | None = None) -> float:
    """Measured streaming bandwidth for roofline calibration.

    Chained FMA passes separated by optimization barriers: uncacheable (each
    iteration depends on the last) and unfusable (the barrier forces one full
    read + write per iteration).  Counts 8 bytes/element/iteration."""
    import jax
    import jax.numpy as jnp
    if nbytes is None:
        nbytes = (64 << 20) if _on_tpu() else (8 << 20)
    a = jnp.asarray(np.random.randn(nbytes // 8).astype(np.float32))
    f = jax.jit(lambda v: v * 1.0000001 + 0.125)
    t = time_fn(f, a)
    # the chained harness body is a triad (read v, read x, write v):
    # 3 accesses x 4 bytes per element per iteration
    return (a.size * 3 * 4) / t / 1e9


def l2_error(y, expected) -> float:
    y = np.asarray(y, np.float64)
    expected = np.asarray(expected, np.float64)
    denom = np.linalg.norm(expected)
    return float(np.linalg.norm(y - expected) / (denom if denom else 1.0))


def relay_floor_s() -> float:
    """The relay's per-chained-iteration latency floor, measured with the
    same chained harness on a trivial 256-element op.  Subtracting it from
    a chained per-call time gives the MARGINAL on-chip rate — the kernel
    quality number; raw per-call times conflate tunnel latency with kernel
    speed (BASELINE.md calibration)."""
    import jax
    import jax.numpy as jnp
    tiny = jnp.asarray(np.random.RandomState(9).randn(256).astype(np.float32))
    return time_fn(jax.jit(lambda v: v * 1.0000001 + 0.125), tiny)

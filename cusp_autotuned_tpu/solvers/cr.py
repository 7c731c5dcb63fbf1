"""Conjugate residual (parity: cusp::krylov::cr, cusp/krylov/detail/cr.inl —
including the true-residual recomputation every 8 iterations)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cusp_autotuned_tpu.ops import blas
from cusp_autotuned_tpu.ops.multiply import multiply
from cusp_autotuned_tpu.operators import as_operator
from cusp_autotuned_tpu.solvers.monitor import (
    Monitor, default_monitor, monitor_init, monitor_record,
)

RECOMPUTE_R = 8


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _cr_loop(A, M, b, x0, limit, rtol, atol):
    if x0 is None:
        x0 = jnp.zeros_like(b)
    state0 = monitor_init(b, limit, rtol, atol)
    r = b - multiply(A, x0)
    state = monitor_record(state0, blas.nrm2(r))
    z = M(r)
    p = z
    y = multiply(A, p)
    Az = multiply(A, z)
    rz = blas.dotc(r, Az)

    def cond(carry):
        return carry[-1].keep_going()

    def body(carry):
        x, r, p, y, rz, state = carry
        alpha = rz / blas.dotc(y, y)
        x = x + alpha * p
        k = state.k
        r = jax.lax.cond(
            jnp.logical_and(k % RECOMPUTE_R != 0, k > 0),
            lambda _: r - alpha * y,
            lambda _: b - multiply(A, x),
            None)
        z = M(r)
        Az = multiply(A, z)
        rz_new = blas.dotc(r, Az)
        beta = rz_new / rz
        p = z + beta * p
        y = Az + beta * y
        state = monitor_record(state, blas.nrm2(r))
        return (x, r, p, y, rz_new, state)

    x, r, p, y, rz, state = jax.lax.while_loop(
        cond, body, (x0, r, p, y, rz, state))
    return x, state


def cr(A, b, x0=None, monitor: Monitor | None = None, M=None, mesh=None):
    b = jnp.asarray(b)
    if monitor is None:
        monitor = default_monitor(b)
    if mesh is not None:
        from cusp_autotuned_tpu.parallel.sharded import distribute_for_solve
        if x0 is None:
            x0 = jnp.zeros_like(b)
        A, b, x0 = distribute_for_solve(A, mesh, b, x0)
        with mesh:
            x, state = _cr_loop(A, as_operator(M), b, jnp.asarray(x0),
                                *monitor.spec())
    else:
        x0 = None if x0 is None else jnp.asarray(x0)
        x, state = _cr_loop(A, as_operator(M), b, x0, *monitor.spec())
    monitor.absorb_state(state)
    return x, monitor

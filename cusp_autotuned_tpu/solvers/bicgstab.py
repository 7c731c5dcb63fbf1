"""BiCGstab (parity: cusp::krylov::bicgstab, cusp/krylov/detail/bicgstab.inl
— same recurrence incl. the mid-iteration early exit when s already
converges).  One jitted lax.while_loop; the early exit is a lax.cond branch
carried as a done flag."""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp

from cusp_autotuned_tpu.ops import blas
from cusp_autotuned_tpu.ops.multiply import multiply
from cusp_autotuned_tpu.operators import as_operator
from cusp_autotuned_tpu.solvers.monitor import (
    Monitor, default_monitor, monitor_init, monitor_record,
)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _bicgstab_loop(A, M, b, x0, limit, rtol, atol):
    if x0 is None:
        x0 = jnp.zeros_like(b)
    state0 = monitor_init(b, limit, rtol, atol)
    r = b - multiply(A, x0)
    state = monitor_record(state0, blas.nrm2(r))
    r_star = r
    p = r
    rrs = blas.dotc(r_star, r)

    def cond(carry):
        x, r, p, rrs, state, done = carry
        return jnp.logical_and(jnp.logical_not(done), state.keep_going())

    def body(carry):
        x, r, p, rrs, state, done = carry
        Mp = M(p)
        AMp = multiply(A, Mp)
        alpha = rrs / blas.dotc(r_star, AMp)
        s = r - alpha * AMp
        s_norm = blas.nrm2(s)
        s_conv = s_norm <= state.tolerance

        def early(_):
            x2 = x + alpha * Mp
            st = monitor_record(state, s_norm)
            return (x2, s, p, rrs, st, jnp.asarray(True))

        def full(_):
            Ms = M(s)
            AMs = multiply(A, Ms)
            omega = blas.dotc(AMs, s) / blas.dotc(AMs, AMs)
            x2 = x + alpha * Mp + omega * Ms
            r2 = s - omega * AMs
            rrs_new = blas.dotc(r_star, r2)
            beta = (rrs_new / rrs) * (alpha / omega)
            p2 = r2 + beta * (p - omega * AMp)
            st = monitor_record(state, blas.nrm2(r2))
            return (x2, r2, p2, rrs_new, st, jnp.asarray(False))

        return jax.lax.cond(s_conv, early, full, None)

    init = (x0, r, p, rrs, state, jnp.asarray(False))
    x, r, p, rrs, state, done = jax.lax.while_loop(cond, body, init)
    return x, state


def bicgstab(A, b, x0=None, monitor: Monitor | None = None, M=None,
             mesh=None):
    b = jnp.asarray(b)
    if monitor is None:
        monitor = default_monitor(b)
    if mesh is not None:
        from cusp_autotuned_tpu.parallel.sharded import distribute_for_solve
        if x0 is None:
            x0 = jnp.zeros_like(b)
        A, b, x0 = distribute_for_solve(A, mesh, b, x0)
        with mesh:
            x, state = _bicgstab_loop(A, as_operator(M), b, jnp.asarray(x0),
                                      *monitor.spec())
    else:
        x0 = None if x0 is None else jnp.asarray(x0)
        x, state = _bicgstab_loop(A, as_operator(M), b, x0,
                                  *monitor.spec())
    monitor.absorb_state(state)
    return x, monitor

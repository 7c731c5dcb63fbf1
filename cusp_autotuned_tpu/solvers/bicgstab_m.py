"""Multi-shift BiCGstab: solve (A + sigma_s I) x_s = b for all shifts.

Parity target: cusp::krylov::bicgstab_m (cusp/krylov/detail/bicgstab_m.inl —
the Jegerlehner BiCGstab-M recurrences; per-shift transfer kernels
KERNEL_ZB/W/S/CHIRHO/A/XS; x0 = 0 required, no preconditioner).  All
per-shift vector work is batched to (n_sigma, n) rank-2 updates inside one
jitted lax.while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cusp_autotuned_tpu.ops import blas
from cusp_autotuned_tpu.ops.multiply import multiply
from cusp_autotuned_tpu.solvers.monitor import (
    Monitor, default_monitor, monitor_init, monitor_record,
)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _bicgstab_m_loop(A, b, sigma, limit, rtol, atol):
    state0 = monitor_init(b, limit, rtol, atol)
    n = b.shape[0]
    ns = sigma.shape[0]
    dtype = b.dtype

    r_0 = b
    w_1 = b
    w_0 = b
    s_0 = b
    s_s = jnp.broadcast_to(b, (ns, n)).astype(dtype)
    x_s = jnp.zeros((ns, n), dtype)

    z_m1 = jnp.ones(ns, dtype)
    z_0 = jnp.ones(ns, dtype)
    rho_0 = jnp.ones(ns, dtype)
    beta_0 = jnp.asarray(1.0, dtype)
    alpha_0 = jnp.asarray(0.0, dtype)

    As = multiply(A, s_0)
    delta_1 = blas.dotc(w_0, r_0)
    phi_0 = blas.dotc(w_0, As) / delta_1

    state = monitor_record(state0, blas.nrm2(r_0))

    def cond(carry):
        return carry[-1].keep_going()

    def body(carry):
        (x_s, s_s, r_0, s_0, As, z_m1, z_0, rho_0,
         beta_0, alpha_0, delta_1, phi_0, state) = carry
        beta_m1 = beta_0
        beta_0 = -1.0 / phi_0
        delta_0 = delta_1
        # shifted zeta/beta (KERNEL_ZB — same transfer as CG-M)
        z_1 = (z_0 * z_m1 * beta_m1
               / (beta_0 * alpha_0 * (z_m1 - z_0)
                  + beta_m1 * z_m1 * (1 - beta_0 * sigma)))
        b_s = beta_0 * z_1 / z_0
        # w_1 = r_0 + beta_0 * A s (KERNEL_W)
        w_1 = r_0 + beta_0 * As
        Aw = multiply(A, w_1)
        chi_0 = blas.dotc(Aw, w_1) / blas.dotc(Aw, Aw)
        r_1 = w_1 - chi_0 * Aw
        delta_1 = blas.dotc(w_0, r_1)
        alpha_1 = -beta_0 * delta_1 / delta_0 / chi_0
        # s_0 = r_1 + alpha_1 * (s_0 - chi_0 * As) (KERNEL_S)
        s_0 = r_1 + alpha_1 * (s_0 - chi_0 * As)
        As = multiply(A, s_0)
        phi_0 = blas.dotc(w_0, As) / delta_1
        # shifted chi/rho (KERNEL_CHIRHO)
        den = 1.0 + chi_0 * sigma
        c_s = chi_0 / den
        rho_1 = rho_0 / den
        # shifted alpha (KERNEL_A)
        a_s = (alpha_1 / beta_0) * z_1 * b_s / z_0
        # per-shift x and s updates (KERNEL_XS)
        x_s = (x_s - b_s[:, None] * s_s
               + (c_s * rho_0 * z_1)[:, None] * w_1[None, :])
        s_s = (z_1 * rho_1)[:, None] * r_1[None, :] + a_s[:, None] * (
            s_s - (c_s * rho_0 / b_s)[:, None]
            * (z_1[:, None] * w_1[None, :] - z_0[:, None] * r_0[None, :]))
        state = monitor_record(state, blas.nrm2(r_1))
        return (x_s, s_s, r_1, s_0, As, z_0, z_1, rho_1,
                beta_0, alpha_1, delta_1, phi_0, state)

    carry = (x_s, s_s, r_0, s_0, As, z_m1, z_0, rho_0,
             beta_0, alpha_0, delta_1, phi_0, state)
    out = jax.lax.while_loop(cond, body, carry)
    return out[0], out[-1]


def bicgstab_m(A, b, sigma, monitor: Monitor | None = None, mesh=None):
    """Returns (X, monitor) with X[s] solving (A + sigma[s] I) X[s] = b.
    mesh: distribute the solve over a jax.sharding.Mesh."""
    import contextlib
    b = jnp.asarray(b)
    sigma = jnp.asarray(sigma, b.dtype)
    if monitor is None:
        monitor = default_monitor(b)
    if mesh is not None:
        from cusp_autotuned_tpu.parallel.sharded import distribute_for_solve
        A, b = distribute_for_solve(A, mesh, b)
    with (mesh if mesh is not None else contextlib.nullcontext()):
        X, state = _bicgstab_m_loop(A, b, sigma, *monitor.spec())
    monitor.absorb_state(state)
    return X, monitor

"""Maximal independent set — Luby-style random-priority selection.

Parity: cusp::graph::maximal_independent_set(G, stencil, k=1) — MIS(k):
selected vertices are pairwise more than k hops apart, every vertex is
within k hops of a selected one.  k=2 drives the AMG aggregation
(cusp/precond/aggregation/.../mis_aggregate.h).

On device the round fixpoint is one jitted lax.while_loop program; the
host-driven rounds remain only on the XLA-CPU oracle backend (while_loop
+ segment reductions deadlock there on oversubscribed hosts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.graph.traversal import _neighbor_max

UNDECIDED, IN_SET, REMOVED = 0, 1, 2


def _khop_max(A, vals, k: int):
    """max of vals over the <= k-hop neighborhood (excluding self)."""
    out = _neighbor_max(A, vals)
    reach = out
    for _ in range(k - 1):
        reach = jnp.maximum(reach, _neighbor_max(A, reach))
        out = jnp.maximum(out, reach)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _mis_step(A, priority, state, k: int):
    active = state == UNDECIDED
    vals = jnp.where(active, priority, 0.0)
    best = _khop_max(A, vals, k)
    # k >= 2 hop paths revisit the start vertex, so best includes the own
    # priority; with unique priorities, equality identifies the local max
    selected = jnp.logical_and(active, vals >= best)
    near = _khop_max(A, selected.astype(priority.dtype), k) > 0
    state = jnp.where(selected, IN_SET, state)
    state = jnp.where(jnp.logical_and(near, state == UNDECIDED),
                      REMOVED, state)
    return state


def maximal_independent_set(G, k: int = 1, seed: int = 0):
    """Returns (count, stencil) — stencil[v] = 1 iff v is selected."""
    from cusp_autotuned_tpu.graph.traversal import strip_diagonal
    G = strip_diagonal(G)
    n = G.num_rows
    rng = np.random.RandomState(seed)
    # unique random priorities break ties deterministically
    from cusp_autotuned_tpu.graph.traversal import _id_dtype
    priority = jnp.asarray(rng.permutation(n) + 1.0, dtype=_id_dtype(n + 1))
    state = jnp.zeros(n, jnp.int32)
    from cusp_autotuned_tpu.graph.traversal import _device_loops
    if _device_loops():
        state = _mis_device(G, priority, state, int(k))
    else:
        while bool(jnp.any(state == UNDECIDED)):
            state = _mis_step(G, priority, state, int(k))
    stencil = (state == IN_SET).astype(jnp.int32)
    return int(jnp.sum(stencil)), stencil


@functools.partial(jax.jit, static_argnames=("k",))
def _mis_device(A, priority, state, k: int):
    def cond(st):
        return jnp.any(st == UNDECIDED)

    def body(st):
        return _mis_step(A, priority, st, k)

    return jax.lax.while_loop(cond, body, state)

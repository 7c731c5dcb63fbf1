"""BFS and connected components as semiring SpMV sweeps.

Parity: cusp::graph::breadth_first_search (cusp/graph/breadth_first_search.h
— labels are levels, or predecessors when mark_levels=False) and
cusp::graph::connected_components (returns component count + labels).

The sweep bodies are jitted; the outer fixpoint loops run on the host (setup
ops; host-driven rounds sidestep an XLA-CPU multi-device deadlock seen with
while_loop + segment reductions on oversubscribed hosts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.ops.multiply import generalized_spmv, multiply
from cusp_autotuned_tpu.utils.exceptions import InvalidInputException


def _id_dtype(n: int):
    """Float dtype that represents vertex ids 0..n exactly (ids ride the
    max-semiring as floats; f32 is exact only below 2^24)."""
    if n < (1 << 24):
        return jnp.float32
    import jax
    if jax.config.jax_enable_x64:
        return jnp.float64
    raise InvalidInputException(
        "graphs with >= 2^24 vertices need jax_enable_x64 for exact "
        "id propagation")


def _neighbor_max(A, x):
    """y[i] = max over neighbors j of x[j] (0 where no neighbor)."""
    y0 = jnp.zeros(A.num_rows, x.dtype)
    return generalized_spmv(A, x, y0, lambda y: y,
                            lambda a, xj: xj, jnp.maximum)


def strip_diagonal(G):
    """The off-diagonal pattern of G as CSR — matrices carry self-loops
    (diagonal entries) that must not count as graph edges in MIS/coloring."""
    import numpy as np
    from cusp_autotuned_tpu.ops.convert import _coo_arrays, convert
    from cusp_autotuned_tpu.formats.coo import coo_matrix
    row, col, val, shape = _coo_arrays(G)
    keep = row != col
    C = coo_matrix(row[keep], col[keep], val[keep], shape, sort=False)
    return convert(C, "csr")


@jax.jit
def _bfs_level_step(A, frontier, levels, lvl):
    reach = multiply(A, frontier, use_autotuning=False) > 0
    new = jnp.logical_and(reach, levels < 0)
    levels = jnp.where(new, lvl + 1, levels)
    return new.astype(frontier.dtype), levels


@jax.jit
def _bfs_pred_step(A, frontier, pred, ids):
    src_ids = jnp.where(frontier > 0, ids + 1, 0.0)
    best = _neighbor_max(A, src_ids)
    new = jnp.logical_and(best > 0, pred < 0)
    pred = jnp.where(new, best.astype(jnp.int32) - 1, pred)
    return new.astype(frontier.dtype), pred


def breadth_first_search(G, src: int, mark_levels: bool = True):
    """labels[v] = BFS level of v (or predecessor when mark_levels=False);
    -1 for unreachable vertices."""
    n = G.num_rows
    src = int(src)
    frontier = jnp.zeros(n, jnp.float32).at[src].set(1.0)
    if mark_levels:
        labels = jnp.full(n, -1, jnp.int32).at[src].set(0)
        lvl = 0
        while bool(jnp.any(frontier > 0)):
            frontier, labels = _bfs_level_step(G, frontier, labels,
                                               jnp.asarray(lvl, jnp.int32))
            lvl += 1
        return labels
    labels = jnp.full(n, -1, jnp.int32).at[src].set(src)
    ids = jnp.arange(n, dtype=_id_dtype(n))
    while bool(jnp.any(frontier > 0)):
        frontier, labels = _bfs_pred_step(G, frontier, labels, ids)
    return labels


@jax.jit
def _cc_step(A, labels):
    best = _neighbor_max(A, labels + 1.0)
    new = jnp.maximum(labels, best - 1.0)
    return new, jnp.any(new != labels)


def connected_components(G):
    """Returns (num_components, labels) with labels renumbered 0..count-1."""
    labels = jnp.arange(G.num_rows, dtype=_id_dtype(G.num_rows))
    changed = True
    while changed:
        labels, ch = _cc_step(G, labels)
        changed = bool(ch)
    raw = np.asarray(labels.astype(jnp.int32))
    uniq, out = np.unique(raw, return_inverse=True)
    return int(uniq.size), jnp.asarray(out.astype(np.int32))

"""Greedy vertex coloring via rounds of independent sets (Jones-Plassmann).

Parity: cusp::graph::vertex_coloring(G, colors) -> number of colors.  Used
by multicolor Gauss-Seidel (cusp/relaxation/detail/gauss_seidel.inl:40-53).
On device the color rounds run as one jitted lax.while_loop program
(see graph/mis.py for the CPU-oracle exception).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.graph.traversal import _neighbor_max


@jax.jit
def _color_step(A, priority, colors, c):
    active = colors < 0
    vals = jnp.where(active, priority, 0.0)
    best = _neighbor_max(A, vals)
    selected = jnp.logical_and(active, vals > best)
    return jnp.where(selected, c, colors)


def vertex_coloring(G, seed: int = 0):
    """Returns (num_colors, colors) with adjacent vertices colored
    differently."""
    from cusp_autotuned_tpu.graph.traversal import strip_diagonal
    G = strip_diagonal(G)
    n = G.num_rows
    rng = np.random.RandomState(seed)
    from cusp_autotuned_tpu.graph.traversal import _id_dtype
    priority = jnp.asarray(rng.permutation(n) + 1.0, dtype=_id_dtype(n + 1))
    colors = jnp.full(n, -1, jnp.int32)
    from cusp_autotuned_tpu.graph.traversal import _device_loops
    if _device_loops():
        colors, c = _coloring_device(G, priority, colors)
        return int(c), colors
    c = 0
    while bool(jnp.any(colors < 0)):
        colors = _color_step(G, priority, colors, jnp.asarray(c, jnp.int32))
        c += 1
    return c, colors


@jax.jit
def _coloring_device(A, priority, colors):
    def cond(state):
        cols, _ = state
        return jnp.any(cols < 0)

    def body(state):
        cols, c = state
        return _color_step(A, priority, cols, c), c + 1

    return jax.lax.while_loop(cond, body, (colors, jnp.int32(0)))

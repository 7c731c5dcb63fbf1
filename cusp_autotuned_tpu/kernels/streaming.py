"""Shared streaming policy for the planned Pallas rails (colsort2, routed).

One place for two decisions both rails make identically:
  - resolve_stream: honor stream_x = 0/1/"auto", auto-streaming when the
    resident x or the virtual-y estimate would exceed the VMEM budget;
  - apply_band_mask: zero the virtual-y bands no grid step visited.  The
    streamed out buffer is NOT pre-zeroed by Pallas, so unvisited bands
    hold whatever the HBM arena last held — including NaN/Inf bit
    patterns, which a 0/1 MULTIPLY would propagate (0 * NaN = NaN); the
    mask must select, not scale.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def resolve_stream(config, x_bytes: int, yv_est_bytes: int,
                   budget_bytes: int) -> bool:
    """True when the kernel should use the streamed (index-mapped) rail."""
    stream = config.get("stream_x", "auto")
    if stream in (1, True, "1"):
        return True
    if stream == "auto":
        return max(x_bytes, yv_est_bytes) > budget_bytes
    return False


def band_mask(visited_band_indices, n_bands: int, band_rows: int, dtype):
    """(n_bands*band_rows, 1) column: 1 where a band was written, 0 else."""
    mask = np.zeros(n_bands, dtype)
    mask[np.unique(np.asarray(visited_band_indices))] = 1
    return jnp.asarray(np.repeat(mask, band_rows)[:, None])


def apply_band_mask(yv, mask):
    """NaN-safe select of the visited bands (see module docstring)."""
    return jnp.where(mask != 0, yv, jnp.zeros((), yv.dtype))

"""Pallas TPU CSR/COO SpMV — windowed gather/one-hot kernel.

Rebuild target: the fork's nnz-balanced CSR kernel
(cusp/system/cuda/ktt/kernels/csr_kernel.h:316-372 — csr_kernel_balanced
partitions entries evenly and reduces across row boundaries; the worker→row
map is precomputed like cpu_compute_row_starts, csr_multiply.h:38-61).

TPU design: XLA's gather and scatter both run ~100x below stream bandwidth,
so this kernel uses NEITHER.  Host planning cuts the (row, col)-sorted
entries into nnz-balanced blocks whose row span fits ROW_WINDOW and whose
column span fits a configurable window.  Inside the kernel:

  gather   x[col]: the column window is VMEM-resident; an index decomposes
           as (chunk, lane) and the within-chunk part uses Mosaic's native
           128-lane take_along_axis — C/128 select passes, no XLA gather.
  scatter  y[row] += prod: one-hot matvecs on the MXU — for each of the 8
           output sublane rows, (128, B) [row_rel == r] @ prod(B).

y stays VMEM-resident for the whole grid; each block accumulates into its
row window with a dynamic read-modify-write (the TPU grid is sequential, so
rows split across blocks just add up, the same carry idea as the
reference's balanced kernel).

Patterns that cannot be windowed raise FormatConversionException — the
autotuner records those as skippable DeviceLimitsExceeded results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusp_autotuned_tpu.utils.exceptions import (
    FormatConversionException, NotImplementedException,
)
from cusp_autotuned_tpu.utils.padding import LANE, round_up

ROW_WINDOW = 1024            # rows addressable per block (8 output sublanes)
MAX_X_VMEM_BYTES = 8 * 1024 * 1024
MAX_BLOCKS_FACTOR = 4        # give up if planning produces pathological cuts


def _plan_blocks(row, col, B, C):
    """Cut row-sorted entries into blocks of <= B entries whose row span fits
    ROW_WINDOW and whose column span fits C.  Returns (starts, stops,
    row_base, col_base) host arrays."""
    nnz = row.shape[0]
    starts, stops, row_base, col_base = [], [], [], []
    i = 0
    max_blocks = MAX_BLOCKS_FACTOR * (nnz // B + 1) + 16
    while i < nnz:
        j = min(i + B, nnz)
        # rows are sorted: bound the row window
        j = min(j, int(np.searchsorted(row, row[i] + ROW_WINDOW)))
        # bound the column span by bisection (columns are NOT sorted across
        # rows, so shrink until the span fits)
        while j > i + 1:
            span = int(col[i:j].max()) - int(col[i:j].min())
            if span < C - LANE:     # slack for the 128-aligned base
                break
            j = i + max(1, (j - i) // 2)
        starts.append(i)
        stops.append(j)
        row_base.append(int(row[i]))
        col_base.append(int(col[i:j].min()) // LANE * LANE)
        i = j
        if len(starts) > max_blocks:
            raise FormatConversionException(
                "pattern cannot be windowed for the one-hot SpMV kernel")
    return (np.asarray(starts), np.asarray(stops),
            np.asarray(row_base, np.int64), np.asarray(col_base, np.int64))


def build_csr_onehot(A, config, interpret: bool = False):
    B = int(config.get("block_entries", 2048))
    C = int(config.get("col_window", 4096))
    if B % LANE != 0 or C % LANE != 0:
        raise NotImplementedException(
            "block_entries/col_window must be multiples of 128")
    m, n = A.shape
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    _reject_x64(A, interpret)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "one-hot kernel supports real dtypes only")
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    row, col, val, _ = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    starts, stops, row_base, col_base = _plan_blocks(row, col, B, C)
    nb = starts.shape[0]

    # blocked, padded entry arrays: (nb, B); padding entries have val 0
    row_rel = np.zeros((nb, B), np.int32)
    col_rel = np.zeros((nb, B), np.int32)
    vals = np.zeros((nb, B), np.float64)
    for g in range(nb):
        s, e = starts[g], stops[g]
        k = e - s
        row_rel[g, :k] = row[s:e] - row_base[g]
        col_rel[g, :k] = col[s:e] - col_base[g]
        vals[g, :k] = val[s:e]
    Bs = B // LANE
    row_rel = row_rel.reshape(nb, Bs, LANE)
    col_rel = col_rel.reshape(nb, Bs, LANE)
    from cusp_autotuned_tpu.utils.config import plan_value_dtype
    store = plan_value_dtype(config, A.dtype)
    vals = vals.reshape(nb, Bs, LANE).astype(store)

    m_pad = round_up(m, LANE) + ROW_WINDOW
    rows_sub = m_pad // LANE
    n_pad = round_up(n, LANE) + C + LANE
    if n_pad * np.dtype(A.dtype).itemsize > MAX_X_VMEM_BYTES:
        raise NotImplementedException(
            "x too large for the VMEM-resident one-hot kernel")
    x_rows = n_pad // LANE

    row_base_sub = jnp.asarray((row_base // LANE).astype(np.int32))
    row_rem = jnp.asarray((row_base % LANE).astype(np.int32))
    col_base_sub = jnp.asarray((col_base // LANE).astype(np.int32))

    kernel = functools.partial(_onehot_kernel, B=B, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # x (full)
            pl.BlockSpec((1, B // LANE, LANE), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),                 # col_rel
            pl.BlockSpec((1, B // LANE, LANE), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),                 # row_rel
            pl.BlockSpec((1, B // LANE, LANE), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),                 # vals
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),           # y (full)
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_sub, LANE),
                               np.dtype(A.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * B * (ROW_WINDOW + C) // LANE,
            bytes_accessed=(3 * nb * B + n_pad + m_pad)
            * np.dtype(A.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    col_rel_d = jnp.asarray(col_rel)
    row_rel_d = jnp.asarray(row_rel)
    vals_d = jnp.asarray(vals)

    def fn(x):
        if x.ndim != 1:
            raise NotImplementedException("one-hot kernel is SpMV-only")
        x2 = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE)
        y2 = call(row_base_sub, row_rem, col_base_sub,
                  x2, col_rel_d, row_rel_d, vals_d)
        return y2.reshape(m_pad)[:m]

    return fn


def _onehot_kernel(row_base_sub, row_rem, col_base_sub,
                   x_ref, col_ref, row_ref, val_ref, y_ref, *, B, C):
    g = pl.program_id(0)
    Bs = B // LANE
    R_SUB = ROW_WINDOW // LANE          # 8
    dtype = y_ref.dtype

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    xw = x_ref[pl.ds(col_base_sub[g], C // LANE), :]       # (C/128, 128)
    cols2 = col_ref[0]                                     # (Bs, 128)
    # rows relative to the block's sublane-aligned window start
    rows2 = row_ref[0] + row_rem[g]                        # in [0, 1152)
    vals2 = val_ref[0]

    # -- gather x[col]: (chunk, lane) decomposition ---------------------------
    chunk = jax.lax.shift_right_logical(cols2, jnp.int32(7))
    lane = jnp.bitwise_and(cols2, jnp.int32(LANE - 1))
    xg = jnp.zeros((Bs, LANE), dtype)
    for c in range(C // LANE):
        xrep = jnp.broadcast_to(xw[c], (Bs, LANE))
        g_c = jnp.take_along_axis(xrep, lane, axis=1)
        xg = jnp.where(chunk == c, g_c, xg)

    from cusp_autotuned_tpu.kernels.pallas_dia import _upcast
    prod2 = _upcast(vals2, dtype) * xg                                     # (Bs, 128)

    # -- scatter y[row] += prod: one-hot matmuls on the MXU -------------------
    # a row index decomposes as (sublane chunk, lane); per entry tile s:
    #   yw[q, l] += sum_k [rows>>7 == q] * prod[k] * [rows&127 == l]
    # i.e. (9, 128) @ (128, 128) — rows span ROW_WINDOW plus one extra
    # sublane row for the alignment remainder
    yw = jnp.zeros((R_SUB + 1, LANE), dtype)
    for s in range(Bs):
        r_s = rows2[s]                                     # (128,)
        q = jax.lax.shift_right_logical(r_s, jnp.int32(7))
        l = jnp.bitwise_and(r_s, jnp.int32(LANE - 1))
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R_SUB + 1, LANE), 0)
               == q[None, :])
        T = jnp.where(sel, jnp.broadcast_to(prod2[s], (R_SUB + 1, LANE)), 0)
        L1 = (l[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1))
        yw = yw + jnp.dot(T, L1.astype(dtype),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST)

    base = row_base_sub[g]
    cur = y_ref[pl.ds(base, R_SUB + 1), :]
    y_ref[pl.ds(base, R_SUB + 1), :] = cur + yw

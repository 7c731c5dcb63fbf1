"""Pallas TPU unstructured SpMV — lane-binned kernels.

Rebuild target: the fork's nnz-balanced CSR kernel family
(cusp/system/cuda/ktt/kernels/csr_kernel.h:160-372 — naive/warp/block/
balanced rails) and the ahead-of-time worker→row partition
(cusp/system/cuda/ktt/csr_multiply.h:38-61, cpu_compute_row_starts).

TPU design (all planning ahead-of-time on host, like cpu_compute_row_starts,
but the partition carries much more structure than a row split):

`binned` (row-lane-binned; best for row-local patterns — stencils, FEM,
banded after RCM):
  Entries are cut, in CSR order, into blocks of (Bs, 128) slots.  An entry
  with target row r occupies lane column r & 127 (fill order picks the
  sublane), so the SCATTER is free: summing sublanes within each 128-row
  group q lands every product on its output row — no one-hot matmuls, no
  atomics, no segmented scan.  The GATHER decomposes each column index into
  (chunk, lane): a static loop over the block's column window selects
  broadcast x rows, and Mosaic's native in-lane take_along_axis resolves
  the lane.  Blocks close when a lane fills, the row window (q bits) is
  exceeded, or the column span exceeds the window.

(The dual strategy for scattered patterns lives in pallas_colsort.py.)

Rows with more entries than a lane can hold across reasonable blocks (hubs)
are pre-spilled to an XLA segment-sum pass fused into the same jit.
Patterns that cannot be planned raise FormatConversionException — the
autotuner records those as skippable results (KTT ResultStatus semantics).
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
from cusp_autotuned_tpu.kernels.pallas_dia import _upcast
from cusp_autotuned_tpu.utils.config import plan_value_dtype

def MAX_X_VMEM_BYTES():
    from cusp_autotuned_tpu.utils.config import get_config
    return get_config().vmem_budget_bytes


def _plan_budget(config):
    from cusp_autotuned_tpu.utils.config import plan_budget
    return plan_budget(config)


def _reject_x64(A, interpret):
    """Mosaic has no 64-bit lowering; interpret mode (XLA) handles it."""
    import jax
    dt = np.dtype(A.dtype)
    if np.issubdtype(dt, np.floating) and dt.itemsize == 8 \
            and jax.config.jax_enable_x64 and not interpret \
            and jax.default_backend() == "tpu":
        raise NotImplementedException(
            "64-bit values: Mosaic TPU kernels are 32-bit — the XLA paths "
            "serve x64 (skippable)")
# pathological-plan guard, same role as the old kernel's MAX_BLOCKS_FACTOR
MAX_BLOCKS_FACTOR = 6


def _host_coo(A, interpret=False):
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "binned kernels support real dtypes only")
    _reject_x64(A, interpret)
    row, col, val, shape = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    return (np.asarray(row, np.int64), np.asarray(col, np.int64),
            np.asarray(val, np.float64), shape)


def _spill_hubs(row, col, val, key, size, hub_cap):
    """Split off entries whose bin key (row for `binned`, column for
    `colsort`) has more than hub_cap entries: they share one lane column and
    would force pathological tiny blocks."""
    counts = np.bincount(key, minlength=size)
    hub = counts[key] > hub_cap
    keep = ~hub
    return ((row[keep], col[keep], val[keep]),
            (row[hub], col[hub], val[hub]))


def _lane_fill(lanes):
    """Per-entry fill order within its lane value (stable)."""
    order = np.argsort(lanes, kind="stable")
    sl = lanes[order]
    grp = np.searchsorted(sl, np.arange(LANE))
    fill_sorted = np.arange(lanes.shape[0]) - grp[sl]
    fill = np.empty(lanes.shape[0], np.int64)
    fill[order] = fill_sorted
    return fill


# -- row-lane-binned plan + kernel --------------------------------------------

def plan_binned(row, col, val, shape, B, C, RW, hub_cap, aligned=False):
    """aligned=True pins windows to the RW/C grid (rb % RW == 0,
    cb % C == 0) so the kernel can stream x/y blocks via index maps."""
    m, n = shape
    Bs = B // LANE
    # aligned windows need no remainder sublane (rb is RW-aligned)
    RS = RW // LANE + (0 if aligned else 1)
    CW = C // LANE
    (row, col, val), spill = _spill_hubs(row, col, val, row, m, hub_cap)
    nnz = row.shape[0]
    if nnz == 0:
        return None, None, None, None, None, spill, RS, CW
    max_blocks = MAX_BLOCKS_FACTOR * (nnz // B + 1) + 16
    if aligned:
        # CELL-major entry order: one (row-window, col-window) grid cell per
        # block run, so the per-row column zigzag never closes blocks.  All
        # blocks of a row window stay contiguous (the kernel's first-visit
        # test relies on that).
        cell = (row // RW) * (n // C + 2) + col // C
        order = np.lexsort((col, row, cell))
        row, col, val = row[order], col[order], val[order]
        max_blocks = 2 * max_blocks + (nnz // B + 2) + (m // RW + 1) + 16

    # native planner fast path (same block contract, incremental greedy)
    from cusp_autotuned_tpu import native
    try:
        nat = native.plan_binned(row, col, val, B, C, RW, max_blocks,
                                 aligned=aligned)
    except ValueError:
        raise FormatConversionException(
            "pattern cannot be planned for the row-binned kernel")
    if nat is not None:
        vals, packs, rbs, cbs, spans = nat
        return vals, packs, rbs, cbs, spans, spill, RS, CW

    blocks = []
    i = 0
    while i < nnz:
        if aligned:
            rb = int(row[i]) - int(row[i]) % RW
            cw0 = int(col[i]) // C
            jcap = min(i + B, nnz)
            viol = np.nonzero((row[i:jcap] - rb >= RW)
                              | (col[i:jcap] // C != cw0))[0]
            j = i + int(viol[0]) if viol.size else jcap
        else:
            rb = int(row[i]) & ~(LANE - 1)
            j = min(i + B, int(np.searchsorted(row, rb + RW)))
            while j > i + 1:                   # column-span shrink
                c0 = int(col[i:j].min()) >> 7
                c1 = int(col[i:j].max()) >> 7
                if c1 - c0 + 1 <= CW:
                    break
                j = i + max(1, (j - i) * 3 // 4)
        lanes = (row[i:j] & (LANE - 1)).astype(np.int64)
        fill = _lane_fill(lanes)
        over = np.nonzero(fill >= Bs)[0]
        if over.size:                          # lane overflow closes the block
            j = i + int(over[0])
            lanes = lanes[: over[0]]
            fill = fill[: over[0]]
        k = slice(i, j)
        cb = (cw0 * C) if aligned else (int(col[k].min()) >> 7 << 7)
        vals2d = np.zeros((Bs, LANE), np.float64)
        packed = np.zeros((Bs, LANE), np.int64)
        q = (row[k] - rb) >> 7
        vals2d[fill, lanes] = val[k]
        # packed: q in the top bits, col-relative (chunk<<7 | lane) below
        packed[fill, lanes] = (q << 24) | (col[k] - cb)
        span = (int(col[k].max()) >> 7) - (cb >> 7) + 1
        blocks.append((vals2d, packed, rb // LANE, cb // LANE, span))
        if len(blocks) > max_blocks:
            raise FormatConversionException(
                "pattern cannot be planned for the row-binned kernel")
        i = j

    vals = np.stack([b[0] for b in blocks]).astype(np.float32)
    packs = np.stack([b[1] for b in blocks]).astype(np.int32)
    rbs = np.array([b[2] for b in blocks], np.int32)
    cbs = np.array([b[3] for b in blocks], np.int32)
    spans = np.array([b[4] for b in blocks], np.int32)
    return vals, packs, rbs, cbs, spans, spill, RS, CW


def _binned_kernel(rbs, cbs, spans, x_ref, val_ref, pack_ref, y_ref,
                   *, Bs, RS, CW, qshift):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # int16-packed metadata upconverts once in VMEM (all values are
    # non-negative and <= 2^15-1, so the sign extension is a no-op)
    packed = pack_ref[0].astype(jnp.int32)
    vals = val_ref[0]
    lane = jnp.bitwise_and(packed, jnp.int32(LANE - 1))
    chunk = jnp.bitwise_and(jax.lax.shift_right_logical(packed, jnp.int32(7)),
                            jnp.int32((1 << (qshift - 7)) - 1))
    qv = jax.lax.shift_right_logical(packed, jnp.int32(qshift))
    dtype = y_ref.dtype

    # gather: static chunk passes over the column window (a static unrolled
    # loop measures faster than a dynamic fori on the block's actual span)
    xw = x_ref[pl.ds(cbs[g], CW), :]
    xg = jnp.zeros((Bs, LANE), dtype)
    for c in range(CW):
        xrep = jnp.broadcast_to(xw[c][None, :], (Bs, LANE))
        t = jnp.take_along_axis(xrep, lane, axis=1)
        xg = jnp.where(chunk == c, t, xg)
    prod = _upcast(vals, dtype) * xg

    # scatter: lane is row-pinned, so each 128-row group q is a masked
    # sublane sum — no matmuls, no data movement
    rb = rbs[g]
    for q in range(RS):
        part = jnp.sum(jnp.where(qv == q, prod, 0), axis=0)
        y_ref[rb + q, :] = y_ref[rb + q, :] + part


def _binned_spmm_kernel(rbs, cbs, spans, x_ref, val_ref, pack_ref, y_ref,
                        *, Bs, RS, CW, qshift, K):
    """SpMM rail: same plan and decode as the SpMV kernel, but the entry
    block is read from HBM ONCE and reused for all K right-hand-side
    columns (the fori_loop walks the k-major resident x / y).  Parity
    target: the reference's CSR x dense-block kernel
    (cusp/system/cuda/detail/multiply/csr_block_spmv.h:187-226)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    packed = pack_ref[0].astype(jnp.int32)
    vals = val_ref[0]
    lane = jnp.bitwise_and(packed, jnp.int32(LANE - 1))
    chunk = jnp.bitwise_and(jax.lax.shift_right_logical(packed, jnp.int32(7)),
                            jnp.int32((1 << (qshift - 7)) - 1))
    qv = jax.lax.shift_right_logical(packed, jnp.int32(qshift))
    dtype = y_ref.dtype
    rb = rbs[g]
    cb = cbs[g]
    # loop-invariant across the k right-hand sides: hoist the per-chunk
    # and per-row-group select masks out of the fori body
    cmask = [chunk == c for c in range(CW)]
    qmask = [qv == q for q in range(RS)]

    def body(kk, carry):
        xw = x_ref[kk, pl.ds(cb, CW), :]
        xg = jnp.zeros((Bs, LANE), dtype)
        for c in range(CW):
            xrep = jnp.broadcast_to(xw[c][None, :], (Bs, LANE))
            t = jnp.take_along_axis(xrep, lane, axis=1)
            xg = jnp.where(cmask[c], t, xg)
        prod = _upcast(vals, dtype) * xg
        for q in range(RS):
            part = jnp.sum(jnp.where(qmask[q], prod, 0), axis=0)
            y_ref[kk, rb + q, :] = y_ref[kk, rb + q, :] + part
        return carry

    jax.lax.fori_loop(0, K, body, 0)


# -- streamed-window kernels (aligned plans; x/y blocks ride index maps) -------

def _streamed_kernel(rbs, cbs, spans, x_ref, val_ref, pack_ref, y_ref,
                     *, Bs, RS, CW, qshift, K=0):
    """Streamed rail: x_ref IS the (CW, 128) column window and y_ref the
    (RS, 128) row window, both pipelined by BlockSpec index maps over the
    ALIGNED plan — nothing stays VMEM-resident, so n and m are unbounded
    (HBM is the only cap).  K > 0 adds the SpMM k-major leading dim.  The
    y window is revisited by consecutive blocks of the same row window and
    zeroed on first visit."""
    g = pl.program_id(0)
    first = jnp.logical_or(g == 0, rbs[g] != rbs[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    packed = pack_ref[0].astype(jnp.int32)
    vals = val_ref[0]
    lane = jnp.bitwise_and(packed, jnp.int32(LANE - 1))
    chunk = jnp.bitwise_and(jax.lax.shift_right_logical(packed, jnp.int32(7)),
                            jnp.int32((1 << (qshift - 7)) - 1))
    qv = jax.lax.shift_right_logical(packed, jnp.int32(qshift))
    dtype = y_ref.dtype
    # loop-invariant across the k right-hand sides
    cmask = [chunk == c for c in range(CW)]
    qmask = [qv == q for q in range(RS)]

    def one_rhs(xw, y_at, y_set):
        xg = jnp.zeros((Bs, LANE), dtype)
        for c in range(CW):
            xrep = jnp.broadcast_to(xw[c][None, :], (Bs, LANE))
            t = jnp.take_along_axis(xrep, lane, axis=1)
            xg = jnp.where(cmask[c], t, xg)
        prod = _upcast(vals, dtype) * xg
        for q in range(RS):
            part = jnp.sum(jnp.where(qmask[q], prod, 0), axis=0)
            y_set(q, y_at(q) + part)

    if K == 0:
        one_rhs(x_ref[...],
                lambda q: y_ref[q, :],
                lambda q, v: y_ref.__setitem__((q, slice(None)), v))
    else:
        def body(kk, carry):
            one_rhs(x_ref[kk],
                    lambda q: y_ref[kk, q, :],
                    lambda q, v: y_ref.__setitem__((kk, q, slice(None)), v))
            return carry
        jax.lax.fori_loop(0, K, body, 0)


def _build_streamed(A, config, interpret):
    """Aligned-window builder: x and y stream per block (see
    _streamed_kernel).  Used when the resident builder's x/y would exceed
    the VMEM budget, or forced with stream_x=1."""
    B = int(config.get("block_entries", 4096))
    Bs = B // LANE
    # Mosaic requires streamed block sublane counts divisible by 8: the
    # row/column windows round up to 1024-element (8-sublane) multiples
    RW = max(1024, round_up(int(config.get("row_window", 512)), 1024))
    C = max(1024, round_up(int(config.get("col_window", 2048)), 1024))
    if B % LANE:
        raise NotImplementedException(
            "block_entries must be a multiple of 128")
    hub_cap = min(int(config.get("hub_cap", Bs)), Bs)
    row, col, val, shape = _host_coo(A, interpret)
    m, n = shape
    dtype = np.dtype(A.dtype)
    store = plan_value_dtype(config, dtype)

    vals, packs, rbs, cbs, spans, spill, RS, CW = plan_binned(
        row, col, val, shape, B, C, RW, hub_cap, aligned=True)

    pack16 = config.get("pack16", "auto")
    can16 = Bs % 16 == 0 and C <= 4096 and RS <= 8
    if pack16 == "auto":
        pack16 = can16
    elif pack16 and not can16:
        raise NotImplementedException(
            "pack16 requires block_entries % 2048 == 0, col_window <= 4096 "
            "and row_window <= 1024")
    qshift = 12 if pack16 else 24
    if pack16 and packs is not None:
        qq = packs >> 24
        packs = ((qq << 12) | (packs & ((1 << 24) - 1))).astype(np.int16)

    srow, scol, sval = spill
    has_spill = srow.size > 0
    if has_spill:
        order = np.lexsort((scol, srow))
        srow_d = jnp.asarray(srow[order].astype(np.int32))
        scol_d = jnp.asarray(scol[order].astype(np.int32))
        sval_d = jnp.asarray(sval[order].astype(dtype))

    if vals is None:
        arrays0 = {"srow": srow_d, "scol": scol_d, "sval": sval_d}

        def spill_apply(arrs, x):
            sv = arrs["sval"] if x.ndim == 1 else arrs["sval"][:, None]
            return jax.ops.segment_sum(sv * x[arrs["scol"]], arrs["srow"],
                                       num_segments=m,
                                       indices_are_sorted=True)

        def spill_only(x):
            return spill_apply(arrays0, x)
        spill_only.planned_arrays = arrays0
        spill_only.apply = spill_apply
        return spill_only

    nb = vals.shape[0]
    if vals.nbytes + packs.nbytes > _plan_budget(config):
        raise NotImplementedException(
            "planned arrays exceed the compile-request budget")
    n_pad = max(C, round_up(n, C))
    x_rows = n_pad // LANE
    m_pad = max(RW, round_up(m, RW))
    rows_sub = m_pad // LANE
    n_win = m_pad // RW
    # windows that own no block are never written by the kernel: mask them
    touched = np.zeros(n_win, bool)
    touched[np.asarray(rbs) // RS] = True
    row_mask = jnp.asarray(np.repeat(touched, RW)[:m])

    cbs_win = jnp.asarray(np.asarray(cbs) // CW)
    rbs_win = jnp.asarray(np.asarray(rbs) // RS)
    spans_d = jnp.asarray(spans)
    vals_d = jnp.asarray(vals.astype(store))
    packs_d = jnp.asarray(packs)

    def make_call(K, nbv=None, _cache={}):
        # the grid length follows the ARRAYS' block count (nbv), not the
        # build-time nb: a sharded wrapper slices the block list per
        # device and reuses this apply on the (padded) slice
        # (parallel/sharded_plans.shard_planned_blocks)
        nbv = nb if nbv is None else nbv
        cached = _cache.get((K, nbv))
        if cached is not None:
            return cached
        kern = functools.partial(_streamed_kernel, Bs=Bs, RS=RS, CW=CW,
                                 qshift=qshift, K=K)
        kdim = () if K == 0 else (K,)
        kblk = () if K == 0 else (K,)

        def xmap(g, rbs, cbs, spans):
            return (0,) * len(kdim) + (cbs[g], 0)

        def ymap(g, rbs, cbs, spans):
            return (0,) * len(kdim) + (rbs[g], 0)

        return _cache.setdefault((K, nbv), pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nbv,),
                in_specs=[
                    pl.BlockSpec(kblk + (CW, LANE), xmap,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(kblk + (RS, LANE), ymap,
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(kdim + (rows_sub, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb * Bs * LANE * max(K, 1),
                bytes_accessed=(nb * Bs * LANE * dtype.itemsize + packs.nbytes
                                + nb * (CW + RS) * LANE * max(K, 1)
                                * dtype.itemsize),
                transcendentals=0),
            interpret=interpret))

    arrays = {"vals": vals_d, "packs": packs_d, "rbs": rbs_win,
              "cbs": cbs_win, "spans": spans_d, "row_mask": row_mask}
    if has_spill:
        arrays.update(srow=srow_d, scol=scol_d, sval=sval_d)

    def apply(arrs, x):
        scal = (arrs["rbs"], arrs["cbs"], arrs["spans"])
        nbv = arrs["vals"].shape[0]
        if x.ndim == 1:
            x2 = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE)
            y2 = make_call(0, nbv)(*scal, x2, arrs["vals"], arrs["packs"])
            y = jnp.where(arrs["row_mask"], y2.reshape(m_pad)[:m], 0)
        elif x.ndim == 2:
            K = x.shape[1]
            if K == 0:
                return jnp.zeros((m, 0), dtype)
            # chunk the right-hand sides like the resident/colsort rails:
            # the kernel holds (KB, CW, 128) x and (KB, RS, 128) y windows
            # in VMEM per grid step, so KB is bounded by the VMEM budget
            from cusp_autotuned_tpu.kernels.pallas_colsort import \
                _spmm_chunked
            win_bytes = (CW + RS) * LANE * dtype.itemsize
            KB = max(1, int(1.5 * MAX_X_VMEM_BYTES() // (2 * win_bytes)))
            if KB > 8:
                KB -= KB % 8
            KB = int(config.get("spmm_kb", 0)) or KB   # tuned override

            def part_mm(arrs2, x3, KK):
                y3 = make_call(KK, arrs2["vals"].shape[0])(
                    arrs2["rbs"], arrs2["cbs"],
                    arrs2["spans"], x3, arrs2["vals"],
                    arrs2["packs"])
                return jnp.where(arrs2["row_mask"][None, :],
                                 y3.reshape(KK, m_pad)[:, :m], 0)
            y = _spmm_chunked([part_mm], arrs, x, K, KB, n, n_pad, x_rows)
        else:
            raise NotImplementedException("binned kernels take 1-D/2-D x")
        if has_spill:
            sv = arrs["sval"] if x.ndim == 1 else arrs["sval"][:, None]
            y = y + jax.ops.segment_sum(sv * x[arrs["scol"]], arrs["srow"],
                                        num_segments=m,
                                        indices_are_sorted=True)
        return y

    def fn(x):
        return apply(arrays, x)
    fn.planned_arrays = arrays
    fn.apply = apply
    fn.plan_stats = dict(
        impl="binned", nb=int(nb), Bs=Bs, RS=RS, CW=CW, RW=RW,
        streamed=True, nnz=int(row.size), spill=int(srow.size),
        plan_bytes=int(vals.nbytes + packs.nbytes))
    return fn


# -- shared builder -------------------------------------------------------------

def _build(A, config, interpret):
    B = int(config.get("block_entries", 4096))
    if B % LANE != 0:
        raise NotImplementedException("block_entries must be a multiple of 128")
    Bs = B // LANE
    RW = int(config.get("row_window", 512))
    if RW % LANE != 0:
        raise NotImplementedException("row_window must be a multiple of 128")
    # a bin key (row for binned, column for colsort) with more entries than
    # one lane column holds (Bs slots) would close blocks pathologically —
    # spill it; a configured hub_cap is clamped to that capacity
    hub_cap = min(int(config.get("hub_cap", Bs)), Bs)
    row, col, val, shape = _host_coo(A, interpret)
    m, n = shape
    dtype = np.dtype(A.dtype)
    store = plan_value_dtype(config, dtype)

    C = int(config.get("col_window", 2048))
    if C % LANE != 0:
        raise NotImplementedException("col_window must be a multiple of 128")
    vals, packs, rbs, cbs, spans, spill, RS, CW = plan_binned(
        row, col, val, shape, B, C, RW, hub_cap)

    # int16 metadata packing: the kernel is HBM-bound on the entry stream
    # (value + packed index per slot), so halving the index bytes cuts the
    # traffic 25%.  Re-layout (q<<24|relcol) -> (q<<12|relcol), which fits
    # 15 bits when the column window is <= 4096 and the row window keeps
    # q < 8; 16-bit tiles need the sublane count to be a multiple of 16.
    pack16 = config.get("pack16", "auto")
    can16 = Bs % 16 == 0 and C <= 4096 and RS <= 8
    if pack16 == "auto":
        pack16 = can16
    elif pack16 and not can16:
        raise NotImplementedException(
            "pack16 requires block_entries % 2048 == 0, col_window <= 4096 "
            "and row_window <= 896")
    qshift = 12 if pack16 else 24
    if pack16 and packs is not None:
        q = packs >> 24
        rel = packs & ((1 << 24) - 1)
        packs = ((q << 12) | rel).astype(np.int16)
    kernel = functools.partial(_binned_kernel, Bs=Bs, RS=RS, CW=CW,
                               qshift=qshift)
    pad_cols = C + LANE

    if vals is None:
        # everything spilled: pure segment-sum path (row-sorted spill)
        srow, scol, sval = spill
        order = np.lexsort((scol, srow))
        srow_d = jnp.asarray(srow[order].astype(np.int32))
        scol_d = jnp.asarray(scol[order].astype(np.int32))
        sval_d = jnp.asarray(sval[order].astype(dtype))

        arrays0 = {"srow": srow_d, "scol": scol_d, "sval": sval_d}

        def spill_apply(arrs, x):
            sv = arrs["sval"] if x.ndim == 1 else arrs["sval"][:, None]
            return jax.ops.segment_sum(sv * x[arrs["scol"]], arrs["srow"],
                                       num_segments=m,
                                       indices_are_sorted=True)

        def spill_only(x):
            return spill_apply(arrays0, x)
        spill_only.planned_arrays = arrays0
        spill_only.apply = spill_apply
        return spill_only

    nb = vals.shape[0]
    if vals.nbytes + packs.nbytes > _plan_budget(config):
        raise NotImplementedException(
            "planned arrays exceed the compile-request budget")
    m_pad = round_up(m, LANE) + RS * LANE
    rows_sub = m_pad // LANE
    n_pad = round_up(n, LANE) + pad_cols
    x_rows = n_pad // LANE
    if x_rows * LANE * dtype.itemsize > MAX_X_VMEM_BYTES():
        raise NotImplementedException(
            "x too large for the VMEM-resident binned kernel")

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x (fully resident)
                pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),   # vals (streamed)
                pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),   # packed (streamed)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * Bs * LANE,
            bytes_accessed=(nb * Bs * LANE * dtype.itemsize + packs.nbytes
                            + (x_rows * LANE + rows_sub * LANE)
                            * dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    vals_d = jnp.asarray(vals.astype(store))
    packs_d = jnp.asarray(packs)
    rbs_d, cbs_d, spans_d = map(jnp.asarray, (rbs, cbs, spans))

    srow, scol, sval = spill
    has_spill = srow.size > 0
    if has_spill:
        srow_d = jnp.asarray(srow.astype(np.int32))
        scol_d = jnp.asarray(scol.astype(np.int32))
        sval_d = jnp.asarray(sval.astype(dtype))

    def _spmm_call(K):
        # the SpMM pallas_call is shaped by k, known only at trace time;
        # the planned arrays are shared with the SpMV rail
        kern = functools.partial(_binned_spmm_kernel, Bs=Bs, RS=RS, CW=CW,
                                 qshift=qshift, K=K)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # x (k-major)
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((K, rows_sub, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb * Bs * LANE * K,
                bytes_accessed=(nb * Bs * LANE * dtype.itemsize + packs.nbytes
                                + K * (x_rows + rows_sub) * LANE
                                * dtype.itemsize),
                transcendentals=0,
            ),
            interpret=interpret,
        )

    arrays = {"vals": vals_d, "packs": packs_d, "rbs": rbs_d, "cbs": cbs_d,
              "spans": spans_d}
    if has_spill:
        arrays.update(srow=srow_d, scol=scol_d, sval=sval_d)

    def apply(arrs, x):
        scal = (arrs["rbs"], arrs["cbs"], arrs["spans"])
        if x.ndim == 1:
            x2 = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE)
            y2 = call(*scal, x2, arrs["vals"], arrs["packs"])
            y = y2.reshape(m_pad)[:m]
        elif x.ndim == 2:
            K = x.shape[1]
            # chunk the right-hand sides so x/y stay within the VMEM
            # budget: KB columns per kernel call, entries re-streamed once
            # per chunk (still ~k/6 times less entry traffic than the
            # XLA segment-sum SpMM's per-column gather/scatter)
            row_bytes = (x_rows + rows_sub) * LANE * dtype.itemsize
            # x+y chunks capped at 1.5x the budget (leaves VMEM room for
            # the double-buffered entry blocks); prefer sublane multiples
            KB = max(1, int(1.5 * MAX_X_VMEM_BYTES() // row_bytes))
            if KB > 8:
                KB -= KB % 8
            KB = min(K, KB)
            spmm = _spmm_call(KB)
            xT = jnp.pad(x, ((0, n_pad - n), (0, 0))).T   # (K, n_pad)
            xTp = jnp.pad(xT, ((0, (-K) % KB), (0, 0)))
            outs = []
            for s in range(0, K, KB):
                xc = jax.lax.dynamic_slice_in_dim(xTp, s, KB, axis=0)
                x3 = xc.reshape(KB, x_rows, LANE)
                y3 = spmm(*scal, x3, arrs["vals"], arrs["packs"])
                outs.append(y3.reshape(KB, m_pad)[:, :m])
            y = jnp.concatenate(outs, axis=0)[:K].T
        else:
            raise NotImplementedException("binned kernels take 1-D/2-D x")
        if has_spill:
            sv = arrs["sval"] if x.ndim == 1 else arrs["sval"][:, None]
            y = y + jax.ops.segment_sum(sv * x[arrs["scol"]], arrs["srow"],
                                        num_segments=m,
                                        indices_are_sorted=True)
        return y

    def fn(x):
        return apply(arrays, x)
    # expose the planned arrays so operators.planned_operator can pass them
    # through jitted solver loops as pytree leaves (arguments, not consts)
    fn.planned_arrays = arrays
    fn.apply = apply
    return fn


def build_binned(A, config, interpret: bool = False):
    """Row-lane-binned SpMV (scatter-free); see module docstring.

    stream_x: 1 forces the streamed-window rail (aligned plans, x/y blocks
    pipelined by index maps — unbounded n/m); 0 forces the VMEM-resident
    rail; "auto" (default) streams when resident x or y would exceed the
    VMEM budget."""
    stream = config.get("stream_x", "auto")
    if stream in (1, True, "1"):
        return _build_streamed(A, config, interpret)
    if stream == "auto":
        m, n = A.shape
        C = int(config.get("col_window", 2048))
        RW = int(config.get("row_window", 512))
        item = np.dtype(A.dtype).itemsize
        x_bytes = (round_up(n, LANE) + C + LANE) * item
        y_bytes = (round_up(m, LANE) + (RW // LANE + 1) * LANE) * item
        if max(x_bytes, y_bytes) > MAX_X_VMEM_BYTES():
            return _build_streamed(A, config, interpret)
    return _build(A, config, interpret)

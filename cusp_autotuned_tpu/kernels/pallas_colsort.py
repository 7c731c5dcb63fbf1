"""Pallas TPU SpMV for scattered patterns (power-law graphs, webbase/LP).

Rebuild target: the fork's COO strategy family
(cusp/system/cuda/ktt/kernels/coo_kernel.h:64-369 — warp-scan segmented
reduce / shared-memory row-boundary variants) which exists because scattered
matrices defeat the row-partitioned CSR kernels.

TPU design — everything irregular is resolved at PLAN TIME on the host;
the kernels contain no atomics, no segmented scans, and no one-hot matmuls:

`main` pass (rows with <= lane-capacity entries):
  Entries are bucketed by row window and column-sorted inside.  A slot
  (sublane s, lane j) holds an entry whose COLUMN lane is j — the gather is
  a native in-lane take_along (tpu.dynamic_gather) of a transposed column
  window.  Within each sublane, at most one entry per target ROW lane, so
  the scatter is ONE take_along with a plan-computed permutation followed
  by masked per-q sublane sums.

`hub` pass (heavy rows):
  Hub rows are grouped NR at a time; each group's entries are column-sorted
  together, so blocks stay inside a narrow column window.  The kernel emits
  per-block (NR, 128) lane partials; XLA reduces lanes and scatter-adds the
  nb*NR row totals — tiny compared to the entry stream.

Patterns that cannot be planned raise FormatConversionException (skippable
autotuner results, KTT ResultStatus semantics).
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
def _spmm_chunked(parts_mm, arrs, x, K, KB, n, n_pad, x_rows):
    """Shared right-hand-side chunk loop for the resident and streamed
    SpMM rails: pad/transpose x once, run every SpMM part per KB-column
    chunk, concatenate back to (m, K)."""
    KB = min(K, KB)
    xT = jnp.pad(x, ((0, n_pad - n), (0, 0))).T
    xTp = jnp.pad(xT, ((0, (-K) % KB), (0, 0)))
    outs = []
    for s0 in range(0, K, KB):
        xc = jax.lax.dynamic_slice_in_dim(xTp, s0, KB, axis=0)
        x3 = xc.reshape(KB, x_rows, LANE)
        yc = parts_mm[0](arrs, x3, KB)
        for pmm in parts_mm[1:]:
            yc = yc + pmm(arrs, x3, KB)
        outs.append(yc)
    return jnp.concatenate(outs, axis=0)[:K].T


MAX_BLOCKS_FACTOR = 40     # low-fill blocks are expected on skewed patterns
NR_DEFAULT = 16            # distinct rows per hub block (hub_rows axis)
_HUB_SHIFT32 = 20          # plan-time packing: (rid << 20) | chunk


def _plan_main(row, col, val, shape, B, RW, CW, aligned=False):
    """Blocks of (Bs, 128) slots; slot lane = column lane; per sublane at
    most one entry per target row lane.  Unplaceable entries roll to the
    next block through a pool.  aligned=True pins column windows to the
    CW*128 grid (row buckets are grid-aligned already) so the streamed
    builder can pipeline x blocks via index maps."""
    m, n = shape
    Bs = B // LANE
    RS = RW // LANE + 1
    nnz = row.shape[0]
    bucket = row // RW
    order = np.lexsort((col, bucket))
    row, col, val = row[order], col[order], val[order]
    bucket = bucket[order]
    cl = (col & (LANE - 1)).astype(np.int64)
    rl = (row & (LANE - 1)).astype(np.int64)
    max_blocks = MAX_BLOCKS_FACTOR * (nnz // B + 2)

    # native planner fast path (same slot contract, per-entry greedy)
    from cusp_autotuned_tpu import native
    try:
        nat = native.plan_colsort_main(row, col, val, B, RW, CW, max_blocks,
                                       aligned=aligned)
    except ValueError:
        raise FormatConversionException(
            "pattern cannot be planned for the colsort kernel")
    if nat is not None:
        return nat + (RS,)

    pool = np.arange(nnz)
    blocks = []
    while pool.size:
        if len(blocks) > max_blocks:
            raise FormatConversionException(
                "pattern cannot be planned for the colsort kernel")
        b = bucket[pool[0]]
        cb = ((int(col[pool[0]]) // (CW * LANE)) * (CW * LANE)
              if aligned else int(col[pool[0]]) >> 7 << 7)
        lim = np.searchsorted(bucket[pool], b + 1)
        lim = min(lim, int(np.searchsorted(col[pool[:lim]], cb + CW * LANE)))
        lim = min(lim, 4 * B)
        cand = pool[:lim]
        rb = int(b) * RW & ~(LANE - 1)

        vals2d = np.zeros((Bs, LANE), np.float64)
        chunk2d = np.zeros((Bs, LANE), np.int64)
        pq2d = np.zeros((Bs, LANE), np.int64)     # (q<<7 | perm), rl layout
        used_rl = np.zeros((Bs, LANE), bool)
        placed = np.zeros(cand.size, bool)
        remaining = np.arange(cand.size)
        for s in range(Bs):
            if remaining.size == 0:
                break
            e = cand[remaining]
            _, i1 = np.unique(cl[e], return_index=True)      # pos in remaining
            _, i2 = np.unique(rl[e[i1]], return_index=True)  # pos in i1
            chosen = i1[i2]
            ce = cand[remaining[chosen]]
            lanes = cl[ce]
            rls = rl[ce]
            vals2d[s, lanes] = val[ce]
            chunk2d[s, lanes] = (col[ce] >> 7) - (cb >> 7)
            pq2d[s, rls] = (((row[ce] - rb) >> 7) << 7) | lanes
            used_rl[s, rls] = True
            placed[remaining[chosen]] = True
            mask = np.ones(remaining.size, bool)
            mask[chosen] = False
            remaining = remaining[mask]
        # unused row-lanes point at val-0 column lanes (each placed entry
        # consumes one lane AND one row-lane, so spares always pair up)
        for s in range(Bs):
            unused_r = np.nonzero(~used_rl[s])[0]
            free_c = np.nonzero(vals2d[s] == 0)[0]
            pq2d[s, unused_r] = free_c[: unused_r.size]
        blocks.append((vals2d, chunk2d, pq2d, rb // LANE, cb // LANE))
        pool = pool[~np.isin(pool, cand[placed], assume_unique=True)]

    vals = np.stack([b[0] for b in blocks]).astype(np.float32)
    chunks = np.stack([b[1] for b in blocks]).astype(np.int32)
    pqs = np.stack([b[2] for b in blocks]).astype(np.int32)
    rbs = np.array([b[3] for b in blocks], np.int32)
    cbs = np.array([b[4] for b in blocks], np.int32)
    return vals, chunks, pqs, rbs, cbs, RS


def _main_kernel(rbs, cbs, x_ref, val_ref, chunk_ref, pq_ref, y_ref,
                 *, Bs, RS, CW):
    W = CW // LANE
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    vals = val_ref[0]
    # int16-packed metadata upconverts once in VMEM (values <= 2^15-1)
    chunk = chunk_ref[0].astype(jnp.int32)
    pq = pq_ref[0].astype(jnp.int32)
    perm = jnp.bitwise_and(pq, jnp.int32(LANE - 1))
    qv = jax.lax.shift_right_logical(pq, jnp.int32(7))
    dtype = y_ref.dtype

    # gather: transpose the column window once, then one native in-lane
    # take per 128-chunk group
    xw = x_ref[pl.ds(cbs[g], CW), :]
    xt = jnp.swapaxes(xw, 0, 1)                       # (128, CW)
    cht = jnp.swapaxes(chunk, 0, 1)                   # (128, Bs)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    gt = jnp.zeros((LANE, LANE), dtype)
    for w in range(W):
        g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low, axis=1)
        gt = jnp.where(hiw == w, g_w, gt) if W > 1 else g_w
    xg = jnp.swapaxes(gt[:, :Bs], 0, 1)
    prod = _upcast(vals, dtype) * xg

    # scatter: one permutation take into row-lane layout, then masked
    # per-q sublane sums
    pr = jnp.take_along_axis(prod, perm, axis=1)
    rb = rbs[g]
    for q in range(RS):
        part = jnp.sum(jnp.where(qv == q, pr, 0), axis=0)
        y_ref[rb + q, :] = y_ref[rb + q, :] + part


def _plan_hub(row, col, val, shape, B, CW, NR, aligned=False):
    """Hub rows grouped NR at a time, in DESCENDING-degree order (rows of
    similar weight share a group, so blocks fill evenly on extreme power
    laws); group entries column-sorted so blocks keep a narrow column
    window.  Slot lane = column lane."""
    m, n = shape
    Bs = B // LANE
    urows_sorted, inv, counts = np.unique(row, return_inverse=True,
                                          return_counts=True)
    deg_order = np.argsort(-counts, kind="stable")
    rank = np.empty_like(deg_order)
    rank[deg_order] = np.arange(deg_order.size)
    urows_all = urows_sorted[deg_order]
    gid = rank[inv] // NR
    order = np.lexsort((col, gid))
    row, col, val, gid = row[order], col[order], val[order], gid[order]
    nnz = row.shape[0]
    cl = (col & (LANE - 1)).astype(np.int64)
    max_blocks = MAX_BLOCKS_FACTOR * (nnz // B + 2)

    blocks = []
    i = 0
    while i < nnz:
        if len(blocks) > max_blocks:
            raise FormatConversionException(
                "pattern cannot be planned for the colsort hub pass")
        gset = int(gid[i])
        j = min(i + B, int(np.searchsorted(gid, gset + 1)))
        cb = ((int(col[i]) // (CW * LANE)) * (CW * LANE)
              if aligned else int(col[i]) >> 7 << 7)
        j = i + int(np.searchsorted(col[i:j], cb + CW * LANE))
        lanes = cl[i:j]
        o2 = np.argsort(lanes, kind="stable")
        sl = lanes[o2]
        grp = np.searchsorted(sl, np.arange(LANE))
        fill = np.empty(j - i, np.int64)
        fill[o2] = np.arange(j - i) - grp[sl]
        over = np.nonzero(fill >= Bs)[0]
        if over.size:
            j = i + int(over[0])
            lanes = lanes[: over[0]]
            fill = fill[: over[0]]
        k = slice(i, j)
        urows = urows_all[gset * NR:(gset + 1) * NR]
        us = np.argsort(urows)               # urows is degree-ordered
        rid = us[np.searchsorted(urows[us], row[k])]
        vals2d = np.zeros((Bs, LANE), np.float64)
        packed = np.zeros((Bs, LANE), np.int64)
        vals2d[fill, lanes] = val[k]
        packed[fill, lanes] = (rid << _HUB_SHIFT32) | ((col[k] >> 7) - (cb >> 7))
        rows_blk = np.full(LANE, m, np.int64)     # pad ids dropped on add
        rows_blk[: urows.size] = urows
        blocks.append((vals2d, packed, cb // LANE, rows_blk))
        i = j

    nb = len(blocks)
    nb_pad = (nb + 7) // 8 * 8
    vals = np.zeros((nb_pad, Bs, LANE), np.float32)
    packs = np.zeros((nb_pad, Bs, LANE), np.int32)
    cbs = np.zeros(nb_pad, np.int32)
    rows = np.full((nb_pad, LANE), m, np.int64)
    for g, (v2, p2, cb_s, rows_blk) in enumerate(blocks):
        vals[g] = v2
        packs[g] = p2
        cbs[g] = cb_s
        rows[g] = rows_blk
    return vals, packs, cbs, rows


def _hub_kernel(cbs, x_ref, val_ref, pack_ref, out_ref, *, Bs, CW, rid_shift,
                NR):
    W = CW // LANE
    g = pl.program_id(0)
    vals = val_ref[0]
    packed = pack_ref[0].astype(jnp.int32)
    chunk = jnp.bitwise_and(packed, jnp.int32((1 << rid_shift) - 1))
    rid = jax.lax.shift_right_logical(packed, jnp.int32(rid_shift))
    dtype = out_ref.dtype

    xw = x_ref[pl.ds(cbs[g], CW), :]
    xt = jnp.swapaxes(xw, 0, 1)
    cht = jnp.swapaxes(chunk, 0, 1)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    gt = jnp.zeros((LANE, LANE), dtype)
    for w in range(W):
        g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low, axis=1)
        gt = jnp.where(hiw == w, g_w, gt) if W > 1 else g_w
    prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)

    # per-row lane partials; the lane reduction + scatter happen in XLA
    rows = []
    for k in range(NR):
        rows.append(jnp.sum(jnp.where(rid == k, prod, 0), axis=0)[None, :])
    out_ref[0] = jnp.concatenate(rows, axis=0)


def build_colsort(A, config, interpret: bool = False):
    """Column-sorted lane-binned SpMV; see module docstring.

    stream_x: 1 forces the streamed-window rail (aligned plans — n/m
    bounded only by HBM); 0 forces VMEM-resident; "auto" streams when
    resident x or y would exceed the VMEM budget."""
    stream = config.get("stream_x", "auto")
    if stream in (1, True, "1"):
        return _build_colsort_streamed(A, config, interpret)
    if stream == "auto":
        m_, n_ = A.shape
        W_ = max(1, -(-int(config.get("col_window", 16384))
                      // (LANE * LANE)))
        RW_ = int(config.get("row_window", 2048))
        item = np.dtype(A.dtype).itemsize
        x_bytes = (round_up(n_, LANE) + (W_ * LANE + 1) * LANE) * item
        y_bytes = (round_up(m_, LANE) + (RW_ // LANE + 1) * LANE) * item
        if max(x_bytes, y_bytes) > MAX_X_VMEM_BYTES():
            return _build_colsort_streamed(A, config, interpret)
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    _reject_x64(A, interpret)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "colsort kernel supports real dtypes only")
    row, col, val, shape = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float64)
    m, n = shape
    dtype = np.dtype(A.dtype)
    store = plan_value_dtype(config, dtype)

    B = int(config.get("block_entries", 4096))
    RW = int(config.get("row_window", 2048))
    # the column window is a whole number of 128-chunk take groups
    W = max(1, -(-int(config.get("col_window", 16384)) // (LANE * LANE)))
    CW = W * LANE
    if B % LANE != 0 or RW % LANE != 0:
        raise NotImplementedException(
            "block_entries/row_window must be multiples of 128")
    Bs = B // LANE
    if Bs > LANE:
        raise NotImplementedException(
            "block_entries above 16384 exceed the transposed-gather tile")
    hub_cap = min(int(config.get("hub_cap", Bs)), Bs)

    n_pad = round_up(n, LANE) + (CW + 1) * LANE
    x_rows = n_pad // LANE
    if x_rows * LANE * dtype.itemsize > MAX_X_VMEM_BYTES():
        raise NotImplementedException(
            "x too large for the VMEM-resident colsort kernel")

    counts = np.bincount(row, minlength=m)
    hub = counts[row] > hub_cap

    _stats = dict(impl="colsort", Bs=Bs, W=W, streamed=False,
                  nnz=int(row.size), n_hub=int(hub.sum()))
    parts = []       # callables composed into one traced fn
    parts_mm = []    # SpMM (2-D x) counterparts of the main pass
    arrays = {}      # planned device arrays (PlannedOperator leaves)
    # int16 metadata packing: main-pass chunk (< W*128 <= 2^14) and pq
    # (< RS*128) always fit 15 bits across the tuning space; the hub pack
    # re-layouts (rid<<12|chunk) -> (rid<<11|chunk) when chunk < 2^11.
    # 16-bit tiles need the sublane count to be a multiple of 16.
    pack16 = config.get("pack16", "auto")
    if pack16 == "auto":
        pack16 = Bs % 16 == 0
    elif pack16 and Bs % 16 != 0:
        raise NotImplementedException(
            "pack16 requires block_entries % 2048 == 0")

    if (~hub).any():
        vals_, chunks_, pqs_, rbs_, cbs_, RS = _plan_main(
            row[~hub], col[~hub], val[~hub], shape, B, RW, CW)
        if pack16 and chunks_.max(initial=0) < (1 << 15) \
                and pqs_.max(initial=0) < (1 << 15):
            chunks_ = chunks_.astype(np.int16)
            pqs_ = pqs_.astype(np.int16)
        nb = vals_.shape[0]
        if vals_.nbytes + chunks_.nbytes + pqs_.nbytes > _plan_budget(config):
            raise NotImplementedException(
                "planned arrays exceed the compile-request budget")
        m_pad = round_up(m, LANE) + RS * LANE
        rows_sub = m_pad // LANE
        kern = functools.partial(_main_kernel, Bs=Bs, RS=RS, CW=CW)
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(nb,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb * Bs * LANE,
                bytes_accessed=(nb * Bs * LANE * dtype.itemsize
                                + chunks_.nbytes + pqs_.nbytes
                                + (x_rows * LANE + rows_sub * LANE)
                                * dtype.itemsize),
                transcendentals=0),
            interpret=interpret)
        arrays.update(
            mv=jnp.asarray(vals_.astype(store)), mc=jnp.asarray(chunks_),
            mp=jnp.asarray(pqs_), mr=jnp.asarray(rbs_),
            mcb=jnp.asarray(cbs_))

        def main_part(arrs, x2, call=call, m_pad=m_pad):
            return call(arrs["mr"], arrs["mcb"], x2, arrs["mv"], arrs["mc"],
                        arrs["mp"]).reshape(m_pad)[:m]
        parts.append(main_part)

        def main_part_mm(arrs, x3, K, nb=nb, rows_sub=rows_sub,
                         m_pad=m_pad, _cache={}):
            callK = _cache.get(K)
            if callK is None:
                kern = functools.partial(_main_spmm_kernel, Bs=Bs, RS=RS,
                                         CW=CW, K=K)
                callK = _cache[K] = pl.pallas_call(
                    kern,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=2, grid=(nb,),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [
                            pl.BlockSpec((1, Bs, LANE),
                                         lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM)] * 3,
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
                    out_shape=jax.ShapeDtypeStruct((K, rows_sub, LANE),
                                                   dtype),
                    interpret=interpret)
            y3 = callK(arrs["mr"], arrs["mcb"], x3, arrs["mv"], arrs["mc"],
                       arrs["mp"])
            return y3.reshape(K, m_pad)[:, :m]
        parts_mm.append(main_part_mm)
        _stats.update(nb_main=int(nb),
                      fill_main=round(int((~hub).sum())
                                      / max(nb * Bs * LANE, 1), 4))

    if hub.any():
        NR = int(config.get("hub_rows", NR_DEFAULT))
        hvals, hpacks, hcbs, hrows = _plan_hub(
            row[hub], col[hub], val[hub], shape, B, CW, NR)
        rid_shift = _HUB_SHIFT32
        chunk_max = int((hpacks & ((1 << _HUB_SHIFT32) - 1)).max(initial=0))
        s16 = max(1, chunk_max.bit_length())
        if pack16 and (((NR - 1) << s16) | chunk_max) < (1 << 15):
            rid = hpacks >> _HUB_SHIFT32
            hpacks = ((rid << s16)
                      | (hpacks & ((1 << s16) - 1))).astype(np.int16)
            rid_shift = s16
        nb_pad = hvals.shape[0]
        if hvals.nbytes + hpacks.nbytes > _plan_budget(config):
            raise NotImplementedException(
                "planned arrays exceed the compile-request budget")
        kern = functools.partial(_hub_kernel, Bs=Bs, CW=CW,
                                 rid_shift=rid_shift, NR=NR)
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nb_pad,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, NR, LANE), lambda g, *_: (g, 0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((nb_pad, NR, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb_pad * Bs * LANE,
                bytes_accessed=(nb_pad * Bs * LANE * dtype.itemsize
                                + hpacks.nbytes
                                + x_rows * LANE * dtype.itemsize),
                transcendentals=0),
            interpret=interpret)
        arrays.update(
            hv=jnp.asarray(hvals.astype(store)), hp=jnp.asarray(hpacks),
            hcb=jnp.asarray(hcbs),
            hrw=jnp.asarray(hrows[:, :NR].reshape(-1).astype(np.int32)))

        def hub_part(arrs, x2, call=call):
            partials = call(arrs["hcb"], x2, arrs["hv"],
                            arrs["hp"])          # (nb, NR, 128)
            totals = jnp.sum(partials, axis=2).reshape(-1)
            return jnp.zeros(m, arrs["hv"].dtype).at[arrs["hrw"]].add(
                totals, mode="drop")
        parts.append(hub_part)

        def hub_part_mm(arrs, x3, K, nb_pad=nb_pad, rid_shift=rid_shift,
                        NR=NR, _cache={}):
            callK = _cache.get(K)
            if callK is None:
                kern = functools.partial(_hub_spmm_kernel, Bs=Bs, CW=CW,
                                         rid_shift=rid_shift, NR=NR, K=K)
                callK = _cache[K] = pl.pallas_call(
                    kern,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1, grid=(nb_pad,),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [
                            pl.BlockSpec((1, Bs, LANE),
                                         lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM)] * 2,
                        out_specs=pl.BlockSpec((1, K, NR, LANE),
                                               lambda g, *_: (g, 0, 0, 0),
                                               memory_space=pltpu.VMEM)),
                    out_shape=jax.ShapeDtypeStruct((nb_pad, K, NR, LANE),
                                                   dtype),
                    interpret=interpret)
            partials = callK(arrs["hcb"], x3, arrs["hv"], arrs["hp"])
            totals = jnp.swapaxes(jnp.sum(partials, axis=3), 0, 1)
            totals = totals.reshape(K, -1)           # (K, nb*NR)
            return jnp.zeros((K, m), arrs["hv"].dtype).at[
                :, arrs["hrw"]].add(totals, mode="drop")
        parts_mm.append(hub_part_mm)
        _stats.update(nb_hub=int(nb_pad),
                      fill_hub=round(int(hub.sum())
                                     / max(nb_pad * Bs * LANE, 1), 4))

    def apply(arrs, x):
        if x.ndim == 1:
            x2 = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE)
            y = parts[0](arrs, x2)
            for p in parts[1:]:
                y = y + p(arrs, x2)
            return y
        if x.ndim != 2 or not parts_mm:
            raise NotImplementedException("colsort kernel takes 1-D/2-D x")
        K = x.shape[1]
        if K == 0:
            return jnp.zeros((m, 0), dtype)
        rs_max = (round_up(m, LANE) + (RW // LANE + 2) * LANE) // LANE
        row_bytes = (x_rows + rs_max) * LANE * dtype.itemsize
        KB = max(1, int(1.5 * MAX_X_VMEM_BYTES() // row_bytes))
        if KB > 8:
            KB -= KB % 8
        KB = int(config.get("spmm_kb", 0)) or KB   # tuned chunk override
        return _spmm_chunked(parts_mm, arrs, x, K, KB, n, n_pad, x_rows)

    def fn(x):
        return apply(arrays, x)
    fn.planned_arrays = arrays
    fn.apply = apply
    # kernel-class cost model (see pallas_colsort2.build_colsort2): the
    # W-pass XLU gathers bound the rate at ~W lane-ops per slot per rhs
    _stats["xlu_cycles_per_rhs"] = (
        (_stats.get("nb_main", 0) + _stats.get("nb_hub", 0)) * Bs * W)
    fn.plan_stats = _stats
    return fn


# -- streamed-window rail (aligned plans; x/y blocks ride index maps) -----------

def _main_streamed_kernel(rbs, cbs, x_ref, val_ref, chunk_ref, pq_ref, y_ref,
                          *, Bs, RS, CW, K=0):
    """Streamed main pass: x_ref IS the (CW, 128) column window and y_ref
    the (RS, 128) row-bucket window, pipelined by index maps over the
    aligned plan — n/m bounded only by HBM.  y zeroes on first visit of a
    row bucket (blocks of one bucket are contiguous by plan order).
    K > 0 adds the SpMM k-major leading dim (entries read once per K)."""
    W = CW // LANE
    g = pl.program_id(0)
    first = jnp.logical_or(g == 0, rbs[g] != rbs[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    vals = val_ref[0]
    chunk = chunk_ref[0].astype(jnp.int32)
    pq = pq_ref[0].astype(jnp.int32)
    perm = jnp.bitwise_and(pq, jnp.int32(LANE - 1))
    qv = jax.lax.shift_right_logical(pq, jnp.int32(7))
    dtype = y_ref.dtype

    cht = jnp.swapaxes(chunk, 0, 1)                   # (128, Bs)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    wmask = [hiw == w for w in range(W)]
    qmask = [qv == q for q in range(RS)]

    def one_rhs(xw, y_at, y_set):
        xt = jnp.swapaxes(xw, 0, 1)                   # (128, CW)
        gt = jnp.zeros((LANE, LANE), dtype)
        for w in range(W):
            g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low,
                                      axis=1)
            gt = jnp.where(wmask[w], g_w, gt) if W > 1 else g_w
        prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)
        pr = jnp.take_along_axis(prod, perm, axis=1)
        for q in range(RS):
            part = jnp.sum(jnp.where(qmask[q], pr, 0), axis=0)
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


def _hub_streamed_kernel(cbs, x_ref, val_ref, pack_ref, out_ref,
                         *, Bs, CW, rid_shift, NR):
    """Streamed hub pass: x window per block via index map; per-block
    (NR, 128) lane partials out (XLA reduces + scatter-adds, as resident)."""
    W = CW // LANE
    vals = val_ref[0]
    packed = pack_ref[0].astype(jnp.int32)
    chunk = jnp.bitwise_and(packed, jnp.int32((1 << rid_shift) - 1))
    rid = jax.lax.shift_right_logical(packed, jnp.int32(rid_shift))
    dtype = out_ref.dtype

    xt = jnp.swapaxes(x_ref[...], 0, 1)
    cht = jnp.swapaxes(chunk, 0, 1)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    gt = jnp.zeros((LANE, LANE), dtype)
    for w in range(W):
        g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low, axis=1)
        gt = jnp.where(hiw == w, g_w, gt) if W > 1 else g_w
    prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)

    rows = []
    for k in range(NR):
        rows.append(jnp.sum(jnp.where(rid == k, prod, 0), axis=0)[None, :])
    out_ref[0] = jnp.concatenate(rows, axis=0)


def _build_colsort_streamed(A, config, interpret):
    """Aligned-window colsort: scattered patterns past the VMEM budget."""
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    _reject_x64(A, interpret)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "colsort kernel supports real dtypes only")
    row, col, val, shape = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float64)
    m, n = shape
    dtype = np.dtype(A.dtype)
    store = plan_value_dtype(config, dtype)

    B = int(config.get("block_entries", 4096))
    # Mosaic's 8-sublane block rule: row buckets round up to 1024 elements
    RW = max(1024, round_up(int(config.get("row_window", 2048)), 1024))
    W = max(1, -(-int(config.get("col_window", 16384)) // (LANE * LANE)))
    CW = W * LANE
    if B % LANE != 0:
        raise NotImplementedException("block_entries must be a multiple of 128")
    Bs = B // LANE
    if Bs > LANE:
        raise NotImplementedException(
            "block_entries above 16384 exceed the transposed-gather tile")
    hub_cap = min(int(config.get("hub_cap", Bs)), Bs)
    RS = RW // LANE                      # buckets are RW-aligned: exact

    pack16 = config.get("pack16", "auto")
    if pack16 == "auto":
        pack16 = Bs % 16 == 0
    elif pack16 and Bs % 16 != 0:
        raise NotImplementedException(
            "pack16 requires block_entries % 2048 == 0")

    n_pad = max(CW * LANE, round_up(n, CW * LANE))
    x_rows = n_pad // LANE
    m_pad = max(RW, round_up(m, RW))
    rows_sub = m_pad // LANE
    n_win = m_pad // RW

    counts = np.bincount(row, minlength=m)
    hub = counts[row] > hub_cap

    parts = []
    parts_mm = []
    arrays = {}

    if (~hub).any():
        vals_, chunks_, pqs_, rbs_, cbs_, _ = _plan_main(
            row[~hub], col[~hub], val[~hub], shape, B, RW, CW,
            aligned=True)
        if pack16 and chunks_.max(initial=0) < (1 << 15) \
                and pqs_.max(initial=0) < (1 << 15):
            chunks_ = chunks_.astype(np.int16)
            pqs_ = pqs_.astype(np.int16)
        nb = vals_.shape[0]
        if vals_.nbytes + chunks_.nbytes + pqs_.nbytes > _plan_budget(config):
            raise NotImplementedException(
                "planned arrays exceed the compile-request budget")
        touched = np.zeros(n_win, bool)
        touched[np.asarray(rbs_) // RS] = True
        arrays["main_mask"] = jnp.asarray(np.repeat(touched, RW)[:m])
        kern = functools.partial(_main_streamed_kernel, Bs=Bs, RS=RS, CW=CW)
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(nb,),
                in_specs=[
                    pl.BlockSpec((CW, LANE),
                                 lambda g, rbs, cbs: (cbs[g], 0),
                                 memory_space=pltpu.VMEM)] + [
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec((RS, LANE),
                                       lambda g, rbs, cbs: (rbs[g], 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb * Bs * LANE,
                bytes_accessed=(nb * Bs * LANE * dtype.itemsize
                                + chunks_.nbytes + pqs_.nbytes
                                + nb * (CW + RS) * LANE * dtype.itemsize),
                transcendentals=0),
            interpret=interpret)
        arrays.update(
            mv=jnp.asarray(vals_.astype(store)), mc=jnp.asarray(chunks_),
            mp=jnp.asarray(pqs_),
            mr=jnp.asarray(np.asarray(rbs_) // RS),
            mcb=jnp.asarray(np.asarray(cbs_) // CW))

        def main_part(arrs, x2):
            y2 = call(arrs["mr"], arrs["mcb"], x2, arrs["mv"], arrs["mc"],
                      arrs["mp"])
            return jnp.where(arrs["main_mask"], y2.reshape(m_pad)[:m], 0)
        parts.append(main_part)

        def main_part_mm(arrs, x3, K, nb=nb, _cache={}):
            callK = _cache.get(K)
            if callK is None:
                kern = functools.partial(_main_streamed_kernel, Bs=Bs, RS=RS,
                                         CW=CW, K=K)
                callK = _cache[K] = pl.pallas_call(
                    kern,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=2, grid=(nb,),
                        in_specs=[
                            pl.BlockSpec((K, CW, LANE),
                                         lambda g, rbs, cbs: (0, cbs[g], 0),
                                         memory_space=pltpu.VMEM)] + [
                            pl.BlockSpec((1, Bs, LANE),
                                         lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM)] * 3,
                        out_specs=pl.BlockSpec(
                            (K, RS, LANE), lambda g, rbs, cbs: (0, rbs[g], 0),
                            memory_space=pltpu.VMEM)),
                    out_shape=jax.ShapeDtypeStruct((K, rows_sub, LANE),
                                                   dtype),
                    interpret=interpret)
            y3 = callK(arrs["mr"], arrs["mcb"], x3, arrs["mv"], arrs["mc"],
                       arrs["mp"])
            return jnp.where(arrs["main_mask"][None, :],
                             y3.reshape(K, m_pad)[:, :m], 0)
        parts_mm.append(main_part_mm)

    if hub.any():
        NR = int(config.get("hub_rows", NR_DEFAULT))
        hvals, hpacks, hcbs, hrows = _plan_hub(
            row[hub], col[hub], val[hub], shape, B, CW, NR,
            aligned=True)
        rid_shift = _HUB_SHIFT32
        chunk_max = int((hpacks & ((1 << _HUB_SHIFT32) - 1)).max(initial=0))
        s16 = max(1, chunk_max.bit_length())
        if pack16 and (((NR - 1) << s16) | chunk_max) < (1 << 15):
            rid = hpacks >> _HUB_SHIFT32
            hpacks = ((rid << s16)
                      | (hpacks & ((1 << s16) - 1))).astype(np.int16)
            rid_shift = s16
        nb_pad = hvals.shape[0]
        if hvals.nbytes + hpacks.nbytes > _plan_budget(config):
            raise NotImplementedException(
                "planned arrays exceed the compile-request budget")
        kern = functools.partial(_hub_streamed_kernel, Bs=Bs, CW=CW,
                                 rid_shift=rid_shift, NR=NR)
        hcall = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nb_pad,),
                in_specs=[
                    pl.BlockSpec((CW, LANE), lambda g, cbs: (cbs[g], 0),
                                 memory_space=pltpu.VMEM)] + [
                    pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, NR, LANE), lambda g, *_: (g, 0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((nb_pad, NR, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * nb_pad * Bs * LANE,
                bytes_accessed=(nb_pad * Bs * LANE * dtype.itemsize
                                + hpacks.nbytes
                                + nb_pad * CW * LANE * dtype.itemsize),
                transcendentals=0),
            interpret=interpret)
        arrays.update(
            hv=jnp.asarray(hvals.astype(store)), hp=jnp.asarray(hpacks),
            hcb=jnp.asarray(np.asarray(hcbs) // CW),
            hrw=jnp.asarray(hrows[:, :NR].reshape(-1).astype(np.int32)))

        def hub_part(arrs, x2):
            partials = hcall(arrs["hcb"], x2, arrs["hv"], arrs["hp"])
            totals = jnp.sum(partials, axis=2).reshape(-1)
            return jnp.zeros(m, arrs["hv"].dtype).at[arrs["hrw"]].add(
                totals, mode="drop")
        parts.append(hub_part)

        def hub_part_mm(arrs, x3, K, nb_pad=nb_pad, rid_shift=rid_shift,
                        NR=NR, _cache={}):
            callK = _cache.get(K)
            if callK is None:
                kern = functools.partial(_hub_spmm_kernel, Bs=Bs, CW=CW,
                                         rid_shift=rid_shift, NR=NR, K=K,
                                         streamed=True)
                callK = _cache[K] = pl.pallas_call(
                    kern,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1, grid=(nb_pad,),
                        in_specs=[
                            pl.BlockSpec((K, CW, LANE),
                                         lambda g, cbs: (0, cbs[g], 0),
                                         memory_space=pltpu.VMEM)] + [
                            pl.BlockSpec((1, Bs, LANE),
                                         lambda g, *_: (g, 0, 0),
                                         memory_space=pltpu.VMEM)] * 2,
                        out_specs=pl.BlockSpec(
                            (1, K, NR, LANE), lambda g, *_: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)),
                    out_shape=jax.ShapeDtypeStruct((nb_pad, K, NR, LANE),
                                                   dtype),
                    interpret=interpret)
            partials = callK(arrs["hcb"], x3, arrs["hv"], arrs["hp"])
            totals = jnp.swapaxes(jnp.sum(partials, axis=3), 0, 1)
            totals = totals.reshape(K, -1)
            return jnp.zeros((K, m), arrs["hv"].dtype).at[
                :, arrs["hrw"]].add(totals, mode="drop")
        parts_mm.append(hub_part_mm)

    def apply(arrs, x):
        if x.ndim == 2:
            K = x.shape[1]
            if K == 0:
                return jnp.zeros((m, 0), dtype)
            # x/y windows stream per block: K chunks bound only by the
            # windows' VMEM footprint
            win_bytes = (CW + RW // LANE) * LANE * dtype.itemsize
            KB = max(1, int(1.5 * MAX_X_VMEM_BYTES() // (2 * win_bytes)))
            if KB > 8:
                KB -= KB % 8
            KB = int(config.get("spmm_kb", 0)) or KB   # tuned override
            return _spmm_chunked(parts_mm, arrs, x, K, KB, n, n_pad, x_rows)
        if x.ndim != 1:
            raise NotImplementedException("colsort kernel takes 1-D/2-D x")
        x2 = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE)
        y = parts[0](arrs, x2)
        for p in parts[1:]:
            y = y + p(arrs, x2)
        return y

    def fn(x):
        return apply(arrays, x)
    fn.planned_arrays = arrays
    fn.apply = apply
    return fn


# -- resident SpMM rail (main pass k-loop; hubs via segment-sum) ---------------

def _main_spmm_kernel(rbs, cbs, x_ref, val_ref, chunk_ref, pq_ref, y_ref,
                      *, Bs, RS, CW, K):
    """SpMM main pass: entry blocks read once, fori over the K resident
    right-hand-side columns (k-major x/y).  Same gather/scatter as the
    SpMV main kernel with the selection masks hoisted."""
    W = CW // LANE
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    vals = val_ref[0]
    chunk = chunk_ref[0].astype(jnp.int32)
    pq = pq_ref[0].astype(jnp.int32)
    perm = jnp.bitwise_and(pq, jnp.int32(LANE - 1))
    qv = jax.lax.shift_right_logical(pq, jnp.int32(7))
    dtype = y_ref.dtype
    cht = jnp.swapaxes(chunk, 0, 1)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    qmask = [qv == q for q in range(RS)]
    wmask = [hiw == w for w in range(W)]
    rb = rbs[g]
    cb = cbs[g]

    def body(kk, carry):
        xw = x_ref[kk, pl.ds(cb, CW), :]
        xt = jnp.swapaxes(xw, 0, 1)
        gt = jnp.zeros((LANE, LANE), dtype)
        for w in range(W):
            g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low,
                                      axis=1)
            gt = jnp.where(wmask[w], g_w, gt) if W > 1 else g_w
        prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)
        pr = jnp.take_along_axis(prod, perm, axis=1)
        for q in range(RS):
            part = jnp.sum(jnp.where(qmask[q], pr, 0), axis=0)
            y_ref[kk, rb + q, :] = y_ref[kk, rb + q, :] + part
        return carry

    jax.lax.fori_loop(0, K, body, 0)


def _hub_spmm_kernel(cbs, x_ref, val_ref, pack_ref, out_ref,
                     *, Bs, CW, rid_shift, NR, K, streamed=False):
    """Hub SpMM: per-block (K, NR, 128) lane partials, entries read once
    across the K right-hand-side columns.  streamed=True means x_ref IS
    the (K, CW, 128) column window (pipelined by the index map)."""
    W = CW // LANE
    g = pl.program_id(0)
    vals = val_ref[0]
    packed = pack_ref[0].astype(jnp.int32)
    chunk = jnp.bitwise_and(packed, jnp.int32((1 << rid_shift) - 1))
    rid = jax.lax.shift_right_logical(packed, jnp.int32(rid_shift))
    dtype = out_ref.dtype
    cht = jnp.swapaxes(chunk, 0, 1)
    if Bs < LANE:
        cht = jnp.concatenate(
            [cht, jnp.zeros((LANE, LANE - Bs), jnp.int32)], axis=1)
    hiw = jax.lax.shift_right_logical(cht, jnp.int32(7))
    low = jnp.bitwise_and(cht, jnp.int32(LANE - 1))
    rmask = [rid == k2 for k2 in range(NR)]
    wmask = [hiw == w for w in range(W)]
    cb = None if streamed else cbs[g]

    def body(kk, carry):
        xw = x_ref[kk] if streamed else x_ref[kk, pl.ds(cb, CW), :]
        xt = jnp.swapaxes(xw, 0, 1)
        gt = jnp.zeros((LANE, LANE), dtype)
        for w in range(W):
            g_w = jnp.take_along_axis(xt[:, w * LANE:(w + 1) * LANE], low,
                                      axis=1)
            gt = jnp.where(wmask[w], g_w, gt) if W > 1 else g_w
        prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)
        rows = []
        for k2 in range(NR):
            rows.append(jnp.sum(jnp.where(rmask[k2], prod, 0),
                                axis=0)[None, :])
        out_ref[0, kk] = jnp.concatenate(rows, axis=0)
        return carry

    jax.lax.fori_loop(0, K, body, 0)

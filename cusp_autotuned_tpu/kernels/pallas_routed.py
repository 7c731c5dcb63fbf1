"""Pallas TPU SpMV v3 for scattered patterns: the ROUTED rail.

Third-generation scattered-pattern kernel (rebuild target: the fork's COO
strategy family, cusp/system/cuda/ktt/kernels/coo_kernel.h:64-369), built
on the round-3 cost model (docs/roadmap.md): colsort2 is bound by its
W+1 take_along_axis passes per block per rhs (~136 ns each on a 128x128
tile), W growing with the column span, and its one-hot scatter dot stops
being free once the virtual-row band widens (RSp*mix*128*128*6 MACs).
This rail needs W_r + 2 takes and NO matmul:

    xw_w = x-window tiles (128, 128)      # W_r x 16384 consecutive elems
    t1   = select_w take(xw_w, g1)        # W_r takes: source lane + window
    rt   = transpose(take(transpose(t1), g2))  # 1 take: source sublane
    pr   = take(vals * rt, perm)          # 1 take: virtual-lane layout
    y[vb:vb+RSp] += pr.reshape(F, RSp, 128).sum(0)   # F = 128 // RSp

Two lane-gathers sandwiching a transpose realize an ARBITRARY 2-D
rearrangement — dest (s, l) reads source (r, lam) of window w provided
g2[l, s] = r and g1[r, l] = (w, lam) — so the gather cost is W_r + 1
passes for a W_r * 16384-column pool instead of colsort2's per-slot
window sweep.  The scatter costs NOTHING beyond the virtual-lane
permutation: each sublane's output chunk is fixed AT PLAN TIME as
qrel(s) = s mod RSp, so summing the F sublanes that share a chunk is a
sublane-split reshape + sum (measured 0.8 ns/elem vs 7-9 ns for any XLA
gather/scatter — the round-3 design rule).

Planner constraints per block (native.route_cells / _route_cells_py):

  C1  lane l hosts <= 1 distinct (window, column) per residue class
      r = col % 128 (duplicates of one column share the route — heavy
      columns cost nothing)
  C2  sublane s hosts <= 1 entry per virtual lane (the perm take)
  C3  sublane s hosts only chunk vb + (s mod RSp) — so a virtual row has
      F = 128/RSp slots per block (multi-entry rows need F > 1 or the
      hub; the Poisson tail at F == 1 collapses fill)
  C4  one entry per (s, l) slot

Virtual rows live in K chunk-interleaved identity planes (fold =
reshape-sum, no gather).  Hub rows (deg > hub_cap) and the Poisson tail
of row multiplicities beyond the per-row slot capacity go to a
capacity-128 colsort2 SUB-PLAN (its one-hot dot sums what takes cannot);
y = routed_main(x) + colsort2_tail(x), one composed operator.

Patterns that cannot be planned — including a tail above half the
entries, where plain colsort2 is the right kernel — raise
FormatConversionException (skippable autotuner results, KTT ResultStatus
semantics).
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

WIN = LANE * LANE                  # x-window: 16384 consecutive elements
HUB_SPLIT = 128

# tail auto-search candidates: (block sublanes Bs, vrow_span, mix,
# col_window or None=full width).
#
# ROUND-5 MEASUREMENT (the per-block law): on chip a colsort2 block
# costs ~(W+3) take passes x 136 ns + the mix one-hot dots REGARDLESS of
# Bs — a (32,128) take is as expensive as a (128,128) one (latency-bound
# below the full tile), so slicing blocks thinner multiplies the pass
# cost by the block count.  A narrow-block candidate set predicted 2.5x
# faster by the per-SLOT model measured 2.4x SLOWER on chip (Economics
# 288 vs 118 us device).  The only real levers are FEWER, FULLER blocks:
# mix=8 lifts the Economics tail fill 0.41 -> 0.59 (nb 49 -> 34,
# measured 118.5 -> 106 us device total), while patterns whose tail nb
# does not shrink (Accelerator: nb 19 either way) keep mix=4 — the dot
# term pays for nothing there (measured 113 -> 122 us).  'perm' fold is
# dominated on tails: same-row entries share one virtual lane, so the
# sigma slot capacity collapses fill to ~0.2.
_TAIL_CANDIDATES = (
    (128, 32, 4, None),          # the pre-round-5 default
    (128, 32, 8, None),
    (128, 64, 8, None),
    (128, 32, 8, 65536),
)
_TAKE_NS = 136.0                 # one take pass per block (any Bs)
_FIXED_PASSES = 3.0              # transpose + perm take + plan DMA
_DOT_NS_PER_MAC = 5e-5           # one-hot dot MACs (~2e13 MAC/s f32)
_SPILL_NS = 15.0                 # XLA COO side-path, per entry


class _TailShim:
    """Container-shaped view of the tail triplets for build_colsort2 /
    the plan_only probe — no device arrays, just the host mirror."""

    format = "coo"

    def __init__(self, tr, tc, tv, shape, dtype):
        self.dtype = dtype
        self.shape = tuple(shape)
        self.num_rows, self.num_cols = int(shape[0]), int(shape[1])
        self.nnz = int(tr.size)
        self._host_coo = (tr, tc, tv.astype(dtype), tuple(shape))


def _tail_score(st) -> float:
    """Predicted tail nanoseconds under the measured per-BLOCK law (see
    _TAIL_CANDIDATES): passes don't scale below the full 128-sublane
    tile, so every block pays W + _FIXED_PASSES takes plus its dots."""
    per_block = ((st["W"] + _FIXED_PASSES) * _TAKE_NS
                 + st["mix"] * st["RSp"] * st["Bs"] * 128
                 * _DOT_NS_PER_MAC)
    return st["nb"] * per_block + st["spill"] * _SPILL_NS


def _auto_tail_cfg(tail, shape, dtype, base_cfg):
    """Model-guided tail configuration: plan each candidate (host-only,
    plan_only probe) and keep the cheapest by take+dot+overhead score.
    Reference analog: the KTT walk measures every configuration
    (multiply.h:106-153); here the plan model prices the tail candidates
    host-side and the tuner's tail axes stay available to overrule."""
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import build_colsort2
    tr, tc, tv = tail
    shim = _TailShim(tr, tc, tv, shape, dtype)
    best_cfg, best_score = None, None
    for bs, rsp, mix, cw in _TAIL_CANDIDATES:
        cfg = dict(base_cfg, block_entries=bs * LANE, vrow_span=rsp,
                   mix_chunks=mix, plan_only=True)
        if cw:
            cfg["col_window"] = min(cw, int(shape[1]))
        else:
            cfg.pop("col_window", None)
        try:
            st = build_colsort2(shim, cfg)
        except (FormatConversionException, NotImplementedException):
            continue
        score = _tail_score(st)
        if best_score is None or score < best_score:
            best_cfg, best_score = cfg, score
    if best_cfg is None:
        return base_cfg
    best_cfg = dict(best_cfg)
    best_cfg.pop("plan_only", None)
    return best_cfg


def MAX_VMEM_BYTES():
    from cusp_autotuned_tpu.utils.config import get_config
    return get_config().vmem_budget_bytes


def _plan_budget(config):
    from cusp_autotuned_tpu.utils.config import plan_budget
    return plan_budget(config)


def _virtual_rows(row, col, val, shape, K, Wr, hub_cap):
    """Interleaved identity-plane virtual-row ids.  Row i's k-th entry
    WITHIN ONE WINDOW GROUP goes to plane k = rank % K, and planes
    interleave at chunk level (vchunk = (i >> 7)*K + k), so one block's
    RSp-chunk band covers RSp*128/K consecutive rows with K slots per row
    — the first K same-row entries of a window group get DISTINCT virtual
    rows by construction (rank-based, not the global idx%K round-robin,
    which lets same-window entries collide).  The fold stays a pure
    reshape-sum.

    Rows with more than hub_cap entries are NOT planned here: a take can
    place but never SUM, so a hub row would burn one F-slot per entry and
    cascade blocks.  They return in the is_hub mask and go to the
    colsort2 tail, whose one-hot dot and hub region sum them natively."""
    m, n = shape
    nnz = row.size
    m_pad = round_up(max(m, 1), LANE)
    nch_plane = m_pad // LANE

    # sort by (row, wg, col): wg = col // (WIN*Wr) is monotone in col, so
    # one fused int64 key replaces the 3-key lexsort (measured ~2x faster
    # at AMG fine-level nnz)
    key = row.astype(np.int64) * np.int64(max(n, 1)) + col
    order = np.argsort(key, kind="stable")
    r, c, v = row[order], col[order], val[order]
    wg = c // (WIN * Wr)
    counts = np.bincount(r, minlength=m)
    if hub_cap <= 0:
        hub_cap = int(max(64, 4 * nnz // max(1, m)))
    is_hub = counts[r] > hub_cap

    # rank within (row, window group): entries arrive sorted by (row, wg)
    gkey = r * (np.int64(wg.max(initial=0)) + 1) + wg
    gstart = np.ones(nnz, bool)
    gstart[1:] = gkey[1:] != gkey[:-1]
    idx = np.arange(nnz)
    rank = idx - np.maximum.accumulate(np.where(gstart, idx, 0))

    vid = ((r >> 7) * K + rank % K) * LANE + (r & (LANE - 1))
    nch_main = K * nch_plane
    return r, c, v, vid, is_hub, m_pad, nch_main


def _route_cells_py(cell, res, wlam, vlane, qrel, RSp):
    """Greedy hardest-first slot assignment under C1-C4 (python reference;
    native.route_cells mirrors it).  Entries must arrive SORTED BY CELL;
    wlam = (window_in_group << 7) | source_lane identifies the column
    within its residue class.  Returns (blk, sub, lane) with blk a
    PER-CELL block ordinal."""
    nnz = cell.size
    F = LANE // RSp
    blk = np.empty(nnz, np.int64)
    sub = np.empty(nnz, np.int64)
    lane = np.empty(nnz, np.int64)

    i = 0
    while i < nnz:
        j = i
        while j < nnz and cell[j] == cell[i]:
            j += 1
        e_idx = np.arange(i, j)
        rc = np.bincount(res[e_idx], minlength=LANE)
        vc = np.bincount(vlane[e_idx], minlength=LANE)
        qc = np.bincount(qrel[e_idx], minlength=LANE)
        hard = np.maximum(np.maximum(rc[res[e_idx]], vc[vlane[e_idx]]),
                          qc[qrel[e_idx]])
        e_order = e_idx[np.argsort(-hard, kind="stable")]

        states: list = []
        for e in e_order:
            cand_subs = qrel[e] + RSp * np.arange(F)          # C3
            placed = False
            for b, st in enumerate(states):
                cand_l = (st["lcol"][:, res[e]] == wlam[e]) \
                    | (st["lcol"][:, res[e]] < 0)              # C1
                if not cand_l.any():
                    continue
                for s in cand_subs:
                    if st["vused"][s, vlane[e]]:               # C2
                        continue
                    avail = st["free"][s] & cand_l             # C4
                    if not avail.any():
                        continue
                    ll = int(np.argmax(avail))
                    st["free"][s, ll] = False
                    st["vused"][s, vlane[e]] = True
                    st["lcol"][ll, res[e]] = wlam[e]
                    blk[e], sub[e], lane[e] = b, s, ll
                    placed = True
                    break
                if placed:
                    break
            if not placed:
                st = dict(
                    free=np.ones((LANE, LANE), bool),
                    vused=np.zeros((LANE, LANE), bool),
                    lcol=np.full((LANE, LANE), -1, np.int64),
                )
                s = int(cand_subs[0])
                st["free"][s, 0] = False
                st["vused"][s, vlane[e]] = True
                st["lcol"][0, res[e]] = wlam[e]
                blk[e], sub[e], lane[e] = len(states), s, 0
                states.append(st)
        i = j
    return blk, sub, lane


def _plan_routed_np(row, col, val, shape, K, RSp, Wr, hub_cap,
                    tail_min_fill):
    """Numpy planning pipeline (fallback when the native routed_plan is
    unavailable — identical semantics).  Returns the tile-scatter inputs
    (v, blk, sub, lane, vlane, res, wlam, vbs, cbs, nb, tail)."""
    r, c, v, vid, is_hub, m_pad, nch_main = _virtual_rows(
        row, col, val, shape, K, Wr, hub_cap)
    hub_tail = (r[is_hub], c[is_hub], v[is_hub])
    if is_hub.any():
        keep0 = ~is_hub
        r, c, v, vid = r[keep0], c[keep0], v[keep0], vid[keep0]
    nnz = r.size
    wgrp = c // (WIN * Wr)
    n_wg = int(wgrp.max()) + 1 if nnz else 1
    cell = (vid >> 7) // RSp * n_wg + wgrp
    del wgrp

    # gather only the primary arrays through the sort; the per-entry
    # route coordinates are recomputed from (c, vid) afterwards —
    # arithmetic is sequential-access and beats 6 extra fancy-index
    # gathers at AMG fine-level sizes (measured ~1 s at 4M nnz)
    o = np.argsort(cell, kind="stable")
    r, c, v, vid, cell = (arr[o] for arr in (r, c, v, vid, cell))
    vlane = (vid & (LANE - 1)).astype(np.int64)
    qrel = (vid >> 7) % RSp
    res = (c & (LANE - 1)).astype(np.int64)
    lam = ((c // LANE) & (LANE - 1)).astype(np.int64)
    wlam = (((c // WIN) % Wr) << 7) | lam

    from cusp_autotuned_tpu import native
    nat = getattr(native, "route_cells", lambda *a: None)(
        cell, res, wlam, vlane, qrel, RSp)
    if nat is not None:
        blk_in_cell, sub, lane = nat
    else:
        if nnz > 150_000:
            raise FormatConversionException(
                "routed python-fallback planner is too slow — build the "
                "native planner (g++) for matrices this large")
        blk_in_cell, sub, lane = _route_cells_py(cell, res, wlam, vlane,
                                                 qrel, RSp)

    if blk_in_cell.size and blk_in_cell.max() >= 4096:
        raise FormatConversionException("routed plan exceeded 4096 blocks "
                                        "per cell")
    bkey = cell * 4096 + blk_in_cell
    uniq, blk = np.unique(bkey, return_inverse=True)

    # drop underfull blocks: their entries go to the colsort2 tail.  The
    # bar is also relative to the fullest block so small matrices (whose
    # pool can never reach an absolute fill) keep their main blocks.
    bcount = np.bincount(blk, minlength=uniq.size)
    thr = min(int(tail_min_fill * WIN),
              int(0.5 * bcount.max()) if bcount.size else 0)
    keep_b = bcount >= max(thr, 1)
    tail_mask = ~keep_b[blk]
    tail = (np.concatenate([hub_tail[0], r[tail_mask]]),
            np.concatenate([hub_tail[1], c[tail_mask]]),
            np.concatenate([hub_tail[2], v[tail_mask]]))
    if tail_mask.any():
        keep = ~tail_mask
        v, vlane, res, wlam = (arr[keep] for arr in (v, vlane, res, wlam))
        blk = blk[keep]
        sub, lane = sub[keep], lane[keep]
        uniq_kept = np.nonzero(keep_b)[0]
        remap = np.full(keep_b.size, -1, np.int64)
        remap[uniq_kept] = np.arange(uniq_kept.size)
        blk = remap[blk]
        uniq = uniq[uniq_kept]
    nb = uniq.size
    n_wg_ = n_wg
    vbs = ((uniq // 4096) // n_wg_ * RSp).astype(np.int64)
    cbs = ((uniq // 4096) % n_wg_ * (LANE * Wr)).astype(np.int64)
    return (v, blk, sub, lane, vlane, res, wlam, vbs, cbs, nb, tail)


def _plan_routed(row, col, val, shape, K, RSp, Wr, hub_cap=0,
                 tail_min_fill=0.25):
    """Returns (vals, g1, g2, perm, vbs, cbs, m_pad, nch_main, tail):
    per-block (128, 128) tiles — values, the gather routes g1[r, l] =
    (window << 7) | source_lane and g2[l, s] = source_sublane, the
    virtual-lane permutation perm[s, vl] = lane — plus per-block
    virtual-chunk bases (chunk units, RSp-aligned) and x-window LANE
    offsets (the block's W_r windows start there).

    Hub rows (deg > hub_cap) and blocks filled below tail_min_fill — the
    Poisson tail of row multiplicities beyond the K * 128/RSp per-row
    slot capacity — return as the `tail` COO triplets, to be served by a
    capacity-128 colsort2 sub-plan instead of cascading into near-empty
    routed blocks (each of which would cost full passes)."""
    from cusp_autotuned_tpu import native

    m, n = shape
    if hub_cap <= 0:
        hub_cap = int(max(64, 4 * row.size // max(1, m)))
    m_pad = round_up(max(m, 1), LANE)
    nch_main = K * (m_pad // LANE)

    nat_full = (getattr(native, "routed_plan", lambda *a: None)(
        row, col, m, n, K, Wr, RSp, hub_cap, tail_min_fill)
        if row.size else None)
    if nat_full is not None:
        # the whole plan — sorts, ranks, hub split, cell routing, block
        # numbering, under-fill drop — ran in one native pass; only the
        # value gather and the tile scatters below remain in numpy
        (order, kindm, blk, sub, lane, vlane, res, wlam,
         blk_cell, metan) = nat_full
        nb, n_wg, max_bic = int(metan[0]), int(metan[1]), int(metan[2])
        if max_bic >= 4096:
            raise FormatConversionException(
                "routed plan exceeded 4096 blocks per cell")
        r_all, c_all, v_all = row[order], col[order], val[order]
        main = kindm == 0
        spill = ~main
        tail = (r_all[spill], c_all[spill], v_all[spill])
        v = v_all[main]
        blk, sub, lane, vlane, res, wlam = (
            a[main] for a in (blk, sub, lane, vlane, res, wlam))
        cells = blk_cell[:nb]
        vbs = (cells // n_wg * RSp).astype(np.int64)
        cbs = (cells % n_wg * (LANE * Wr)).astype(np.int64)
    else:
        (v, blk, sub, lane, vlane, res, wlam, vbs, cbs, nb,
         tail) = _plan_routed_np(row, col, val, shape, K, RSp, Wr,
                                 hub_cap, tail_min_fill)

    vals2d = np.zeros((nb, LANE, LANE), np.float64)
    g1 = np.zeros((nb, LANE, LANE), np.int64)       # (r, l)  -> (w, lam)
    g2 = np.zeros((nb, LANE, LANE), np.int64)       # (l, s)  -> r
    perm = np.zeros((nb, LANE, LANE), np.int64)     # (s, vl) -> lane
    vals2d[blk, sub, lane] = v
    g1[blk, res, lane] = wlam
    g2[blk, lane, sub] = res
    perm[blk, sub, vlane] = lane

    # perm spares: free virtual lanes of a sublane point at its free
    # (zero-value) lanes, so every take reads a defined zero product
    used_v = np.zeros((nb, LANE, LANE), bool)
    used_v[blk, sub, vlane] = True
    used_l = np.zeros((nb, LANE, LANE), bool)
    used_l[blk, sub, lane] = True
    fv = np.argsort(used_v, axis=2, kind="stable")
    fl = np.argsort(used_l, axis=2, kind="stable")
    n_free = LANE - used_v.sum(axis=2)
    lane_i = np.arange(LANE)[None, None, :]
    cur = np.take_along_axis(perm, fv, axis=2)
    np.put_along_axis(perm, fv,
                      np.where(lane_i < n_free[:, :, None], fl, cur),
                      axis=2)

    return (vals2d.astype(np.float32), g1.astype(np.int32),
            g2.astype(np.int32), perm.astype(np.int32),
            vbs.astype(np.int32), cbs.astype(np.int32),
            m_pad, nch_main, tail)


def _routed_kernel(vbs, cbs, xt_ref, val_ref, g1_ref, g2_ref, pq_ref,
                   y_ref, *, RSp, Wr, K=0, streamed=False):
    """Routed kernel.  Resident: x pre-transposed to (128, x_rows)
    lane-major (element j at sublane j%128, lane j//128 — a window is a
    contiguous 128-lane slice), virtual y whole in VMEM.  STREAMED:
    xt_ref IS the (128, Wr*128) window-group x slice and y_ref the
    (RSp, 128) virtual band, pipelined by index maps — the plan is
    naturally aligned (cbs on the window-group grid, vbs on the RSp
    grid, same-band blocks contiguous by plan order), so n/m are bounded
    only by HBM; y zeroes on first visit of a band.  Either way: W_r + 2
    take passes + two transposes per block per rhs; the scatter is a
    sublane-split reshape-sum (no matmul, no gather)."""
    g = pl.program_id(0)

    if streamed:
        first = jnp.logical_or(g == 0, vbs[g] != vbs[jnp.maximum(g - 1, 0)])
    else:
        first = g == 0

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    F = LANE // RSp
    vals = val_ref[0]
    g1 = g1_ref[0].astype(jnp.int32)
    g2 = g2_ref[0].astype(jnp.int32)
    perm = pq_ref[0].astype(jnp.int32)
    lam = jnp.bitwise_and(g1, jnp.int32(LANE - 1))
    wsel = jax.lax.shift_right_logical(g1, jnp.int32(7))
    dtype = y_ref.dtype

    cb = cbs[g]
    # vbs entries are RSp-aligned by construction (grp * RSp); tell Mosaic
    # so the dynamic sublane-dim y slice lowers without a runtime align check
    vb = None if streamed else pl.multiple_of(vbs[g], RSp)

    def wslice(w):
        if streamed:
            return slice(w * LANE, (w + 1) * LANE)   # window IS the block
        return pl.ds(pl.multiple_of(cb + w * LANE, LANE), LANE)

    def run_rhs(xt_at, y_get, y_put):
        t1 = jnp.zeros((LANE, LANE), dtype)
        for w in range(Wr):
            g_w = jnp.take_along_axis(xt_at(wslice(w)), lam, axis=1)
            t1 = jnp.where(wsel == w, g_w, t1) if Wr > 1 else g_w
        rt = jnp.swapaxes(jnp.take_along_axis(jnp.swapaxes(t1, 0, 1),
                                              g2, axis=1), 0, 1)
        pr = jnp.take_along_axis(_upcast(vals, dtype) * rt, perm,
                             axis=1)     # (s, vl)
        upd = pr.reshape(F, RSp, LANE).sum(0) if F > 1 else pr
        y_put(y_get() + upd)

    if streamed:
        if K == 0:
            run_rhs(lambda sl: xt_ref[:, sl],
                    lambda: y_ref[...],
                    lambda v: y_ref.__setitem__(Ellipsis, v))
        else:
            def body(kk, carry):
                run_rhs(lambda sl: xt_ref[kk, :, sl],
                        lambda: y_ref[kk],
                        lambda v: y_ref.__setitem__(kk, v))
                return carry
            jax.lax.fori_loop(0, K, body, 0)
    elif K == 0:
        run_rhs(lambda sl: xt_ref[:, sl],
                lambda: y_ref[pl.ds(vb, RSp), :],
                lambda v: y_ref.__setitem__((pl.ds(vb, RSp), slice(None)),
                                            v))
    else:
        def body(kk, carry):
            run_rhs(lambda sl: xt_ref[kk, :, sl],
                    lambda: y_ref[kk, pl.ds(vb, RSp), :],
                    lambda v: y_ref.__setitem__(
                        (kk, pl.ds(vb, RSp), slice(None)), v))
            return carry
        jax.lax.fori_loop(0, K, body, 0)


def build_routed(A, config, interpret: bool = False):
    """Routed scattered-pattern SpMV/SpMM; see module docstring.

    Config keys: vrow_planes (K identity planes), vrow_span (RSp chunks
    per block band: 128/RSp slots per virtual row), win_group (W_r
    16384-column windows per block — pool width), hub_cap, spmm_kb."""
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    _reject_x64(A, interpret)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "routed kernel supports real dtypes only")
    row, col, val, shape = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float64)
    m, n = shape
    dtype = np.dtype(A.dtype)
    from cusp_autotuned_tpu.utils.config import plan_value_dtype
    store = plan_value_dtype(config, dtype)

    # 0 means "default" for the shared tuning-space axes (a walk config
    # carries every axis; 0 is the not-applicable/default marker)
    K = int(config.get("vrow_planes", 0)) or 1
    RSp = int(config.get("vrow_span", 0)) or 64
    Wr = int(config.get("win_group", 0))
    if Wr <= 0:
        # auto: widen the window group until the per-block candidate pool
        # (rows_covered * expected entries per row per group) can fill
        # most of the 16384 slots — a pool below the tail bar would dump
        # every block to the tail
        lam1 = (row.size / max(m, 1)) * (WIN / max(n, 1))
        pool1 = (RSp * LANE / K) * lam1
        Wr = int(min(8, max(1, round(0.55 * WIN / max(pool1, 1.0)))))
    hub_cap = int(config.get("hub_cap", 0))
    tail_min_fill = float(config.get("tail_min_fill", 0.25))
    if K < 1 or K > 8:
        raise NotImplementedException("vrow_planes must be in 1..8")
    if RSp not in (8, 16, 32, 64, 128):
        raise NotImplementedException(
            "vrow_span must be a power of two in 8..128")
    if not 1 <= Wr <= 8:
        raise NotImplementedException("win_group must be in 1..8")

    n_pad = round_up(max(n, 1), WIN * Wr)
    x_rows = n_pad // LANE
    CW = Wr * LANE
    m_pad_est = round_up(max(m, 1), LANE)
    yv_est = (K * (m_pad_est // LANE) + RSp) * LANE * dtype.itemsize
    # the plan is aligned either way — streaming only changes the
    # BlockSpec pipelining (policy shared with colsort2)
    from cusp_autotuned_tpu.kernels.streaming import (
        resolve_stream, band_mask, apply_band_mask)
    streamed = resolve_stream(config, x_rows * LANE * dtype.itemsize,
                              yv_est, MAX_VMEM_BYTES())
    if not streamed and x_rows * LANE * dtype.itemsize > MAX_VMEM_BYTES():
        raise NotImplementedException(
            "x too large for the VMEM-resident routed kernel — "
            "use stream_x=1")

    (vals_, g1_, g2_, perm_, vbs_, cbs_, m_pad, nch_main, tail) = \
        _plan_routed(row, col, val, shape, K, RSp, Wr, hub_cap,
                     tail_min_fill=tail_min_fill)
    nb = vals_.shape[0]

    # the Poisson tail beyond the K*128/RSp per-row capacity is served by
    # a capacity-128 colsort2 sub-plan (one-hot dot scatter) — cascading
    # it through near-empty routed blocks would cost full passes each
    n_tail = tail[0].size
    if n_tail > 0.5 * row.size:
        raise FormatConversionException(
            f"routed plan left {n_tail}/{row.size} entries in the tail — "
            "pattern unsuited to the routed rail (use colsort2)")
    tail_fn = None
    if n_tail:
        import scipy.sparse as _sp
        from cusp_autotuned_tpu.backend.reference import from_scipy
        from cusp_autotuned_tpu.kernels.pallas_colsort2 import \
            build_colsort2
        St = _sp.coo_matrix((tail[2], (tail[0], tail[1])), shape=shape)
        At = from_scipy(St.astype(dtype), "coo")
        # tail sub-plan config: mix_chunks is pattern-dependent (measured
        # device-time, v5e: Economics tail best at mix2 55 us vs mix4
        # 61; Accelerator tail best at mix4 38 vs mix2 55) — searched as
        # the tail_mix axis rather than hardcoded
        tail_cfg = {"vrow_planes": 1,
                    "mix_chunks": int(config.get("tail_mix", 0)) or 4}
        explicit_tail = bool(config.get("tail_mix"))
        for src, dst in (("tail_cw", "col_window"),
                         ("tail_bs", "block_entries"),
                         ("tail_rsp", "vrow_span")):
            if config.get(src):
                tail_cfg[dst] = int(config[src])
                explicit_tail = True
        if "value_dtype" in config:
            tail_cfg["value_dtype"] = config["value_dtype"]
        if config.get("scatter_dot"):
            tail_cfg["scatter_dot"] = config["scatter_dot"]
        if "plan_budget_bytes" in config:
            tail_cfg["plan_budget_bytes"] = config["plan_budget_bytes"]
        if "tail_hub_cap" in config:
            tail_cfg["hub_cap"] = config["tail_hub_cap"]
        # big tails dominate the whole kernel (Economics: 61 of 105 us
        # device time, VERDICT r4 item 1) — worth a host-side model
        # search over tail plan shapes; explicit tail axes skip it
        if not explicit_tail and n_tail >= int(
                config.get("tail_search_min", 65536)):
            tail_cfg = _auto_tail_cfg(tail, shape, dtype, tail_cfg)
        tail_fn = build_colsort2(At, tail_cfg, interpret=interpret)

    VRs = round_up(nch_main + RSp, RSp if streamed else 8)
    if not streamed and VRs * LANE * dtype.itemsize > MAX_VMEM_BYTES():
        raise NotImplementedException(
            "virtual rows exceed the VMEM budget — use stream_x=1")

    pack16 = bool(config.get("pack16", True))
    # g2 and perm index sublanes/lanes (0..127) so they fit int8 — a
    # further 32 KB/block of plan traffic off the HBM stream; g1 carries
    # (window << 7 | lane) up to Wr*128-1 and stays int16.  int8 (1, 128,
    # 128) blocks meet Mosaic's (32, 128) tile floor.
    pack8 = bool(config.get("pack8", False))
    if pack16 or pack8:
        g1_ = g1_.astype(np.int16)
        small = np.int8 if pack8 else np.int16
        g2_, perm_ = g2_.astype(small), perm_.astype(small)
    plan_bytes = vals_.nbytes + g1_.nbytes + g2_.nbytes + perm_.nbytes
    if plan_bytes > _plan_budget(config):
        raise NotImplementedException(
            "planned arrays exceed the compile-request budget")

    if streamed:
        vbs_ = vbs_ // RSp                    # y band index
        cbs_ = cbs_ // CW                     # x window-group index
    kern = functools.partial(_routed_kernel, RSp=RSp, Wr=Wr,
                             streamed=streamed)
    entry_specs = [pl.BlockSpec((1, LANE, LANE), lambda g, *_: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 4
    if streamed:
        x_spec = pl.BlockSpec((LANE, CW), lambda g, vbs, cbs: (0, cbs[g]),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((RSp, LANE), lambda g, vbs, cbs: (vbs[g], 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    def make_call(nbv, _cache={}):
        # grid length follows the ARRAYS' block count: a sharded wrapper
        # slices the block list per device and reuses this apply on the
        # padded slice (parallel/sharded_plans.shard_planned_blocks)
        cached = _cache.get(nbv)
        if cached is not None:
            return cached
        return _cache.setdefault(nbv, pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(nbv,),
                in_specs=[x_spec] + entry_specs,
                out_specs=y_spec),
            out_shape=jax.ShapeDtypeStruct((VRs, LANE), dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * nbv * LANE * LANE,
                bytes_accessed=(plan_bytes
                                + (x_rows + VRs) * LANE * dtype.itemsize),
                transcendentals=0),
            interpret=interpret))

    arrays = dict(
        rv=jnp.asarray(vals_.astype(store)), rg1=jnp.asarray(g1_),
        rg2=jnp.asarray(g2_), rpq=jnp.asarray(perm_),
        rvb=jnp.asarray(vbs_), rcb=jnp.asarray(cbs_))
    if streamed:
        # bands no block visits keep garbage: mask them out of the fold
        arrays["rwm"] = band_mask(vbs_, VRs // RSp, RSp, dtype)
    if tail_fn is not None:
        arrays.update(tail_fn.planned_arrays)
    nch_plane = m_pad // LANE

    def fold(arrs, yv_flat):
        planes = yv_flat[..., : nch_main * LANE]
        shp = planes.shape[:-1]
        # planes interleave at chunk level (vchunk = (i>>7)*K + k):
        # still a pure reshape + sum, no gather
        return planes.reshape(shp + (nch_plane, K, LANE)).sum(-2) \
            .reshape(shp + (m_pad,))[..., :m]

    def make_call_mm(KK, nbv, _cache={}):
        callK = _cache.get((KK, nbv))
        if callK is None:
            kernK = functools.partial(_routed_kernel, RSp=RSp, Wr=Wr, K=KK,
                                      streamed=streamed)
            if streamed:
                xk_spec = pl.BlockSpec(
                    (KK, LANE, CW), lambda g, vbs, cbs: (0, 0, cbs[g]),
                    memory_space=pltpu.VMEM)
                yk_spec = pl.BlockSpec(
                    (KK, RSp, LANE), lambda g, vbs, cbs: (0, vbs[g], 0),
                    memory_space=pltpu.VMEM)
            else:
                xk_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
                yk_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
            callK = _cache[(KK, nbv)] = pl.pallas_call(
                kernK,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2, grid=(nbv,),
                    in_specs=[xk_spec] + entry_specs,
                    out_specs=yk_spec),
                out_shape=jax.ShapeDtypeStruct((KK, VRs, LANE), dtype),
                interpret=interpret)
        return callK

    def apply(arrs, x):
        nbv = arrs["rv"].shape[0]
        if x.ndim == 1:
            xt = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE).T
            if nbv:
                yv = make_call(nbv)(arrs["rvb"], arrs["rcb"], xt, arrs["rv"],
                                    arrs["rg1"], arrs["rg2"], arrs["rpq"])
                if streamed:
                    yv = apply_band_mask(yv, arrs["rwm"])
                y = fold(arrs, yv.reshape(-1))
            else:
                y = jnp.zeros(m, dtype)
            if tail_fn is not None:
                y = y + tail_fn.apply(arrs, x)
            return y
        if x.ndim != 2:
            raise NotImplementedException("routed kernel takes 1-D/2-D x")
        KK = x.shape[1]
        if KK == 0:
            return jnp.zeros((m, 0), dtype)
        per_k = ((CW + RSp) if streamed else (x_rows + VRs)) \
            * LANE * dtype.itemsize
        KB = max(1, int(1.5 * MAX_VMEM_BYTES() // (2 * per_k)))
        if KB > 8:
            KB -= KB % 8
        KB = int(config.get("spmm_kb", 0)) or KB
        KB = min(KB, KK)
        xT = jnp.pad(x, ((0, n_pad - n), (0, 0))).T
        xTp = jnp.pad(xT, ((0, (-KK) % KB), (0, 0)))
        outs = []
        for s0 in range(0, KK, KB):
            xc = jax.lax.dynamic_slice_in_dim(xTp, s0, KB, axis=0)
            if nbv:
                x3t = jnp.swapaxes(xc.reshape(KB, x_rows, LANE), 1, 2)
                yv = make_call_mm(KB, nbv)(arrs["rvb"], arrs["rcb"], x3t,
                                           arrs["rv"], arrs["rg1"],
                                           arrs["rg2"], arrs["rpq"])
                if streamed:
                    yv = apply_band_mask(yv, arrs["rwm"])
                yk = fold(arrs, yv.reshape(KB, -1))
            else:
                yk = jnp.zeros((KB, m), dtype)
            outs.append(yk)
        y = jnp.concatenate(outs, axis=0)[:KK].T
        if tail_fn is not None:
            y = y + tail_fn.apply(arrs, x)
        return y

    def fn(x):
        return apply(arrays, x)
    fn.planned_arrays = arrays
    fn.apply = apply
    slots = int(nb) * LANE * LANE
    n_main = int(row.size) - int(n_tail)
    fn.plan_stats = dict(
        impl="routed", nb=int(nb), RSp=RSp, Wr=Wr, K=K, slots=slots,
        streamed=bool(streamed),
        nnz=int(row.size), tail=int(n_tail),
        fill=round(n_main / max(slots, 1), 4),
        xlu_passes_per_rhs=int(nb) * (Wr + 2),
        plan_bytes=int(plan_bytes),
        tail_stats=(None if tail_fn is None
                    else {k: v for k, v in tail_fn.plan_stats.items()
                          if k in ("nb", "fill", "W", "Bs", "RSp", "mix",
                                   "spill", "plan_bytes")}))
    return fn

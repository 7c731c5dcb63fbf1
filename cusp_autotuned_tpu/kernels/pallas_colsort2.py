"""Pallas TPU SpMV v2 for scattered patterns: plane-aligned virtual rows.

Second-generation replacement for the pallas_colsort main/hub pair
(rebuild target: the fork's COO strategy family,
cusp/system/cuda/ktt/kernels/coo_kernel.h:64-369).  Three observations
drive the redesign:

1. The v1 scatter (RS masked per-q sublane sums) costs 2*RS*Bs*128 VPU ops
   per block, so widening the row window to raise fill makes every block
   proportionally slower.  Here the scatter is a one-hot matmul on the MXU
   — (RSp x Bs) @ (Bs x 128) — whose cost is independent of the window.
2. XLA gather/scatter on TPU costs ~10-40 ns PER ELEMENT through the
   relay, so a general virtual-row -> row fold (segment_sum) eats the
   kernel's win whole (measured 3.2 ms vs 0.35 ms kernel on Webbase).
   Virtual rows therefore live in K IDENTITY PLANES — vrow k*m_pad + i
   accumulates row i — and the fold is a pure reshape(K, m_pad).sum(0):
   no gather, no scatter, stream-rate.
3. Heavy rows would need degree/K sublanes inside their natural 128-row
   chunk and collapse its fill, so rows above `hub_cap` move to a HUB
   REGION of degree-sorted virtual rows (<= `hub_split` entries each,
   128 similar-weight vrows per chunk -> near-full sublanes).  Only this
   small region (~ nnz_hub/hub_split + n_hub slots) folds with a real
   scatter-add.

A slot (sublane s, lane j) holds an entry whose COLUMN lane is j (the v1
transposed-gather contract); within a sublane all entries share one
virtual 128-row chunk, each with a distinct virtual lane.  Packing a
(chunk x column-window) cell into sublanes is a small bipartite edge
coloring bounded by max(column-lane degree, virtual-lane degree,
ceil(E/128)); entries stacked deeper than `lane_cap` on one (cell, lane)
spill to an XLA COO side path (the Poisson tail would otherwise force
near-empty sublanes).

Patterns that cannot be planned raise FormatConversionException
(skippable autotuner results, KTT ResultStatus semantics).
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


def MAX_VMEM_BYTES():
    from cusp_autotuned_tpu.utils.config import get_config
    return get_config().vmem_budget_bytes


def _plan_budget(config):
    from cusp_autotuned_tpu.utils.config import plan_budget
    return plan_budget(config)


K_DEFAULT = 2          # vrow_planes: identity planes per row
RSP_DEFAULT = 32       # virtual-chunk span of one block (multiple of 8)
HUB_SPLIT = 128        # max entries per hub virtual row


def _color_cells(cell, cl, vlane):
    """Edge coloring of each cell's (column lane, virtual lane) entries
    into sublanes (unique cl AND unique vlane per sublane).  The native
    planner does hardest-first first-fit (near the max-degree bound; the
    round greedy below loses ~2x on dense hub cells); entries must arrive
    sorted by cell."""
    from cusp_autotuned_tpu import native
    order = np.argsort(cell, kind="stable")
    nat = native.color_cells(cell[order], cl[order], vlane[order])
    if nat is not None:
        sub = np.empty(cell.size, np.int64)
        sub[order] = nat
        return sub
    nnz = cell.size
    sub = np.full(nnz, -1, np.int64)
    # the rotated pick order decorrelates each column lane's preferred
    # virtual lane — without it every lane grabs its lowest vlane and the
    # per-round matchings collide (LP fill 0.28 -> 0.35 measured)
    key_v = (vlane - 37 * cl) % LANE
    remaining = np.lexsort((key_v, cl, cell))
    s = 0
    while remaining.size:
        e = remaining
        # first occurrence per (cell, cl): e is sorted by (cell, cl)
        key1 = cell[e] * 129 + cl[e]
        first1 = np.ones(e.size, bool)
        first1[1:] = key1[1:] != key1[:-1]
        e1 = e[first1]
        # then first occurrence per (cell, vlane)
        key2 = cell[e1] * 129 + vlane[e1]
        o2 = np.argsort(key2, kind="stable")
        first2 = np.ones(e1.size, bool)
        k2s = key2[o2]
        first2[1:] = k2s[1:] != k2s[:-1]
        chosen = e1[o2[first2]]
        sub[chosen] = s
        s += 1
        mask = np.ones(nnz, bool)
        mask[chosen] = False
        remaining = remaining[mask[remaining]]
        if s > 4096:
            raise FormatConversionException(
                "colsort2 edge coloring did not converge")
    return sub


def _color_cells_mixed(cell, cl, vlane, qrel, mix):
    """Chunk-mixed coloring: a sublane takes entries of up to `mix`
    distinct chunks (qrel) of its RSp group; unique cl and unique vlane
    per sublane stay.  Native hardest-first first-fit with a python
    first-fit fallback for small inputs."""
    from cusp_autotuned_tpu import native
    order = np.argsort(cell, kind="stable")
    rsp = int(qrel.max(initial=0)) + 1
    nat = getattr(native, "color_cells_mixed", lambda *a: None)(
        cell[order], cl[order], vlane[order], qrel[order], mix, rsp)
    if nat is not None:
        sub = np.empty(cell.size, np.int64)
        mi = np.empty(cell.size, np.int64)
        sub[order] = nat[0]
        mi[order] = nat[1]
        return sub, mi
    if cell.size > 200_000:
        raise FormatConversionException(
            "colsort2 python-fallback coloring is quadratic — build the "
            "native planner (g++) for matrices this large")
    sub = np.empty(cell.size, np.int64)
    mi = np.empty(cell.size, np.int64)
    state: dict = {}
    for e in order:
        cu, vu, qs = state.setdefault(cell[e], ([], [], []))
        placed = False
        for s in range(len(cu)):
            if cu[s][cl[e]] or vu[s][vlane[e]]:
                continue
            if qrel[e] not in qs[s] and len(qs[s]) >= mix:
                continue
            cu[s][cl[e]] = True
            vu[s][vlane[e]] = True
            if qrel[e] not in qs[s]:
                qs[s].append(qrel[e])
            sub[e], mi[e] = s, qs[s].index(qrel[e])
            placed = True
            break
        if not placed:
            c = np.zeros(LANE, bool)
            v = np.zeros(LANE, bool)
            c[cl[e]] = True
            v[vlane[e]] = True
            cu.append(c)
            vu.append(v)
            qs.append([qrel[e]])
            sub[e], mi[e] = len(cu) - 1, 0
    return sub, mi


def _color_cells_capped(cell, cl, vlane, qrel, Bs, cap):
    """Capacity-capped coloring (mix_chunks='perm'): unique cl and unique
    vlane per sublane, plus at most `cap` entries per (Bs-sublane block,
    vlane, qrel) — the sigma-fold slot capacity.  Native hardest-first
    with a python first-fit fallback for small inputs."""
    from cusp_autotuned_tpu import native
    order = np.argsort(cell, kind="stable")
    nat = getattr(native, "color_cells_capped", lambda *a: None)(
        cell[order], cl[order], vlane[order], qrel[order], Bs, cap)
    if nat is not None:
        sub = np.empty(cell.size, np.int64)
        sub[order] = nat
        return sub
    if cell.size > 200_000:
        raise FormatConversionException(
            "colsort2 python-fallback coloring is quadratic — build the "
            "native planner (g++) for matrices this large")
    sub = np.empty(cell.size, np.int64)
    state: dict = {}
    for e in order:
        cu, vu, cnt = state.setdefault(cell[e], ([], [], {}))
        s = 0
        while True:
            if s == len(cu):
                cu.append(np.zeros(LANE, bool))
                vu.append(np.zeros(LANE, bool))
            key = (s // Bs, vlane[e], qrel[e])
            if (not cu[s][cl[e]] and not vu[s][vlane[e]]
                    and cnt.get(key, 0) < cap):
                cu[s][cl[e]] = True
                vu[s][vlane[e]] = True
                cnt[key] = cnt.get(key, 0) + 1
                sub[e] = s
                break
            s += 1
    return sub


def _plan_v2(row, col, val, shape, K, CW, Bs, RSp, lane_cap=0,
             hub_cap=0, hub_split=HUB_SPLIT, aligned=False, mix=1,
             perm_fold=False):
    """Returns (vals, chunks, pqs, vbs, cbs, m_pad, hub_rows, nch_main,
    spill, sigma) — see module doc.

    vals/chunks are slot (column-lane) layout, pqs is virtual-lane layout
    with (qrel << 7) | source_lane, vbs/cbs are per-block virtual-chunk
    and x-sublane bases.  Virtual chunks [0, K*m_pad/128) are the identity
    planes (reshape fold); chunks beyond hold the hub region whose slots
    scatter-add into hub_rows (one target row per slot, m for dead).

    `perm_fold=True` plans for the sigma-fold kernel (mix_chunks='perm'):
    cells are RSp-aligned chunk GROUPS like mix>1 but a sublane may host
    entries of ANY chunk of its group (only column-lane/virtual-lane
    uniqueness remains — the best fill any coloring can reach), subject
    to the slot capacity <= Bs/RSp entries per (block, vlane, qrel).
    sigma (nb, 128, Bs) is a per-lane sublane permutation placing every
    product in a sublane slot whose index == its qrel (mod RSp), so the
    kernel scatter is transpose -> one take -> transpose -> reshape fold
    — no one-hot dot.  sigma is None for the other modes."""
    m, n = shape
    nnz = row.size
    m_pad = round_up(max(m, 1), LANE)
    nch_plane = m_pad // LANE

    order = np.lexsort((col, row))
    r, c, v = row[order], col[order], val[order]
    counts = np.bincount(r, minlength=m)
    if hub_cap <= 0:
        # the hub fold is an XLA scatter over ~n_hub slots (~15 ns each
        # through the relay) while a mid row costs only extra kernel
        # sublanes, so the threshold leans high
        hub_cap = int(max(64, 4 * nnz // max(1, m)))
    starts = np.concatenate([[0], np.cumsum(counts)])
    idx_in_row = np.arange(nnz) - starts[r]
    is_hub = counts[r] > hub_cap

    vid = np.empty(nnz, np.int64)
    # -- main planes: row i's entries round-robin over K identity planes --
    me = ~is_hub
    vid[me] = (idx_in_row[me] % K) * nch_plane * LANE + r[me]
    nch_main = K * nch_plane

    # -- hub region: degree-sorted rows, split every hub_split entries ----
    hub_rows_arr = np.zeros(0, np.int32)
    if is_hub.any():
        hr = r[is_hub]
        hu, hinv = np.unique(hr, return_inverse=True)
        deg = counts[hu]
        deg_order = np.argsort(-deg, kind="stable")
        rank = np.empty_like(deg_order)
        rank[deg_order] = np.arange(deg_order.size)
        nv_per = -(-deg // hub_split)
        nv_ranked = nv_per[deg_order]
        vbase = np.concatenate([[0], np.cumsum(nv_ranked)])
        # entry's index within its row among hub entries = idx_in_row
        vid[is_hub] = (nch_main * LANE + vbase[rank[hinv]]
                       + idx_in_row[is_hub] // hub_split)
        n_hub_v = int(vbase[-1])
        hub_rows_arr = np.full(round_up(max(n_hub_v, 1), LANE), m, np.int32)
        hub_rows_arr[:n_hub_v] = np.repeat(hu[deg_order], nv_ranked)

    chunk_id = vid >> 7
    vlane = vid & (LANE - 1)
    wid = c // (CW * LANE)
    cl = c & (LANE - 1)
    n_wins = int(wid.max()) + 1 if nnz else 1
    if mix > 1 or perm_fold:
        # chunk-mixed cells: one RSp-aligned GROUP of chunks x window; a
        # sublane may host up to `mix` chunks of its group (the kernel
        # scatters with `mix` one-hot dots; every chunk when perm_fold),
        # lifting the per-128-row Poisson column-lane bound on light
        # scatter
        cell = ((chunk_id // RSp) * RSp) * n_wins + wid
    else:
        cell = chunk_id * n_wins + wid

    # -- hot-lane spill: cap the per-(cell, lane) stack depth --------------
    okey = np.argsort(cell * LANE + cl, kind="stable")
    ks = (cell * LANE + cl)[okey]
    grp_start = np.ones(nnz, bool)
    grp_start[1:] = ks[1:] != ks[:-1]
    depth = np.arange(nnz) - np.maximum.accumulate(
        np.where(grp_start, np.arange(nnz), 0))
    if lane_cap <= 0:
        # XLA's per-entry gather/segment cost (~15 ns through the relay)
        # is ~5x a kernel slot, so by default nothing spills — extra
        # low-fill sublanes are the cheaper price.  The tuner can set an
        # explicit lane_cap where the Poisson tail is extreme.
        lane_cap = 1 << 30
    smask = np.zeros(nnz, bool)
    smask[okey[depth >= lane_cap]] = True
    spill = (r[smask], c[smask], v[smask])
    if smask.any():
        keep = ~smask
        r, c, v = r[keep], c[keep], v[keep]
        chunk_id, vlane = chunk_id[keep], vlane[keep]
        wid, cl, cell = wid[keep], cl[keep], cell[keep]
        nnz = r.size

    if perm_fold:
        # unconstrained-chunk coloring with the sigma slot capacity
        qrel_e = chunk_id - (chunk_id // RSp) * RSp
        sub = _color_cells_capped(cell, cl, vlane, qrel_e, Bs, Bs // RSp)
        mi_e = None
    elif mix > 1:
        qrel_e = chunk_id - (chunk_id // RSp) * RSp
        sub, mi_e = _color_cells_mixed(cell, cl, vlane, qrel_e, mix)
    else:
        sub = _color_cells(cell, cl, vlane)
        mi_e = None

    if perm_fold:
        # keep the colorer's sublane positions VERBATIM: its slot
        # capacity is per window of Bs sublanes, so block = sub // Bs and
        # slot = sub % Bs (capacity-forced gaps stay as empty sublanes —
        # compacting them would shift block boundaries and break sigma)
        bkey = cell * (1 << 30) + sub // Bs
        uniqb, invb = np.unique(bkey, return_inverse=True)
        bu_cell = uniqb >> 30
        bu_chunk = bu_cell // n_wins          # RSp-aligned group base
        bu_wid = bu_cell % n_wins
        ob = (np.lexsort((bu_wid, bu_chunk)) if aligned
              else np.lexsort((bu_chunk, bu_wid)))
        rankb = np.empty_like(ob)
        rankb[ob] = np.arange(ob.size)
        nb = ob.size
        eb = rankb[invb]
        es = sub % Bs
        vbs = bu_chunk[ob].astype(np.int64)
        cbs = (bu_wid[ob] * CW).astype(np.int64)
        eq = chunk_id - vbs[eb]
    else:
        # -- sublane table: (window, chunk) order for the resident rail;
        # (chunk, window) for the STREAMED rail, whose y windows ride
        # index maps and must be revisited contiguously on an RSp-aligned
        # grid ----------------------------------------------------------
        skey = cell * 8192 + sub              # sub < 4096 enforced above
        uniq, inv = np.unique(skey, return_inverse=True)
        su_cell = uniq // 8192
        su_chunk = su_cell // n_wins
        su_wid = su_cell % n_wins
        # ALIGNED (streamed) order must be (RSp band, window, chunk):
        # the cut below bounds each block with searchsorted, which needs
        # the secondary key SORTED inside the primary segment.  Sorting
        # by bare chunk then window leaves su_wid unsorted across the
        # chunks of one band, and a multi-window matrix (CW windows
        # > 1) then packed entries of DIFFERENT x windows into one block
        # while the kernel loads only cbs[g] — wrong sums (caught by the
        # Economics exhaustive walk: ValidationFailed at stream_x=1,
        # col_window=2048).  Band-major order keeps the streamed y
        # contract (same-band blocks contiguous, vbs nondecreasing) AND
        # makes the in-segment keys sorted.
        if aligned:
            su_band = (su_chunk // RSp) * RSp
            o = np.lexsort((su_chunk, su_wid, su_band))
        else:
            o = np.lexsort((su_chunk, su_wid))
        rank = np.empty_like(o)
        rank[o] = np.arange(o.size)
        su_chunk, su_wid = su_chunk[o], su_wid[o]
        gsub = rank[inv]                      # per-entry global sublane

        # -- cut into blocks: Bs sublanes, same window, chunk span <= RSp
        ns = o.size
        su_band = (su_chunk // RSp) * RSp
        blk_of = np.empty(ns, np.int64)
        sloc_of = np.empty(ns, np.int64)
        vbs, cbs = [], []
        i = 0
        while i < ns:
            w0, c0 = su_wid[i], su_chunk[i]
            j = min(i + Bs, ns)
            if aligned:
                # within a band su_wid is sorted; within (band, window)
                # chunks are sorted and span < RSp by construction
                b0 = int(su_band[i])
                j = min(j, i + int(np.searchsorted(su_band[i:j], b0 + 1)))
                j = min(j, i + int(np.searchsorted(su_wid[i:j], w0 + 1)))
                vb = b0
            else:
                j = min(j, i + int(np.searchsorted(su_wid[i:j], w0 + 1)))
                vb = int(c0)
                j = min(j, i + int(np.searchsorted(su_chunk[i:j],
                                                   vb + RSp)))
            g = len(vbs)
            blk_of[i:j] = g
            sloc_of[i:j] = np.arange(j - i)
            vbs.append(vb)
            cbs.append(w0 * CW)
            i = j
        nb = len(vbs)

        eb = blk_of[gsub]
        es = sloc_of[gsub]
        eq = chunk_id - np.asarray(vbs, np.int64)[eb]

    vals2d = np.zeros((nb, Bs, LANE), np.float64)
    chunk2d = np.zeros((nb, Bs, LANE), np.int64)
    pq2d = np.zeros((nb, Bs, LANE), np.int64)
    qbits = max(1, int(RSp - 1).bit_length())
    vals2d[eb, es, cl] = v
    chunk2d[eb, es, cl] = (c >> 7) - np.asarray(cbs, np.int64)[eb]
    if mix > 1:
        # per-vlane qrel + the chunk's index in its sublane's chunk list
        # (the kernel rebuilds each mix slot's one-hot by masked lane-max)
        pq2d[eb, es, vlane] = (mi_e << (7 + qbits)) | (eq << 7) | cl
    else:
        # roll mode also lands here: per-vlane qrel, no mix-slot bits
        pq2d[eb, es, vlane] = (eq << 7) | cl
    # point unused virtual lanes at zero-value column lanes (each placed
    # entry uses one of each, so spares pair up); for the uniform plan the
    # per-sublane qrel is stamped on every lane (the kernel reads lane 0)
    used_v = np.zeros((nb, Bs, LANE), bool)
    used_v[eb, es, vlane] = True
    used_c = np.zeros((nb, Bs, LANE), bool)
    used_c[eb, es, cl] = True
    qsub = np.zeros((nb, Bs), np.int64)
    if mix > 1:
        m0 = mi_e == 0
        qsub[eb[m0], es[m0]] = eq[m0]      # the mix-slot-0 chunk's qrel
    elif not perm_fold:
        qsub[eb, es] = eq
    # pair the i-th free virtual lane with the i-th free column lane,
    # vectorized over all (block, sublane) pairs
    fv = np.argsort(used_v, axis=2, kind="stable")
    fc = np.argsort(used_c, axis=2, kind="stable")
    n_free = LANE - used_v.sum(axis=2)
    lane_i = np.arange(LANE)[None, None, :]
    cur = np.take_along_axis(pq2d, fv, axis=2)
    if mix > 1:
        # spares carry mi=0 and the slot-0 qrel (their value lane is zero)
        spare = fc | (qsub[:, :, None] << 7)
        np.put_along_axis(pq2d, fv,
                          np.where(lane_i < n_free[:, :, None], spare, cur),
                          axis=2)
    else:
        # perm spares carry qrel 0 (their paired value lane is zero, so
        # whatever sigma slot gathers them receives nothing)
        np.put_along_axis(pq2d, fv,
                          np.where(lane_i < n_free[:, :, None], fc, cur),
                          axis=2)
        if not perm_fold:
            pq2d |= qsub[:, :, None] << 7

    sigma = None
    if perm_fold:
        # sigma[b, vl, s'] = source sublane whose (s, vl) product lands
        # in slot s' (s' == qrel mod RSp); entries take slots qrel + k*RSp
        # in arrival order, leftover slots pair with leftover (zero
        # product) sublanes to complete each per-lane permutation
        folds = Bs // RSp
        o2 = np.lexsort((es, eq, vlane, eb))
        gkey = (eb[o2] * LANE + vlane[o2]) * RSp + eq[o2]
        gs = np.ones(o2.size, bool)
        gs[1:] = gkey[1:] != gkey[:-1]
        idx = np.arange(o2.size)
        kk = np.empty(o2.size, np.int64)
        kk[o2] = idx - np.maximum.accumulate(np.where(gs, idx, 0))
        if kk.size and kk.max() >= folds:
            raise FormatConversionException(
                "colsort2 perm plan exceeded the sigma slot capacity")
        slot = eq + kk * RSp
        sigma = np.full((nb, LANE, Bs), -1, np.int64)
        sigma[eb, vlane, slot] = es
        used_sl = sigma >= 0
        used_sr = np.zeros((nb, LANE, Bs), bool)
        used_sr[eb, vlane, es] = True
        fsl = np.argsort(used_sl, axis=2, kind="stable")
        fsr = np.argsort(used_sr, axis=2, kind="stable")
        nfree = Bs - used_sl.sum(axis=2)
        sl_i = np.arange(Bs)[None, None, :]
        cur2 = np.take_along_axis(sigma, fsl, axis=2)
        np.put_along_axis(sigma, fsl,
                          np.where(sl_i < nfree[:, :, None], fsr, cur2),
                          axis=2)
        sigma = sigma.astype(np.int32)

    return (vals2d.astype(np.float32), chunk2d.astype(np.int32),
            pq2d.astype(np.int32), np.asarray(vbs, np.int32),
            np.asarray(cbs, np.int32), m_pad, hub_rows_arr, nch_main,
            spill, sigma)


def _scatter_dot(oh, pr, mode):
    """The one-hot scatter matmul at a chosen MXU precision.

    'exact'  — Precision.HIGHEST (6-pass f32 emulation; bit-faithful).
    'bf16x3' — manual 3-way bf16 operand split: the one-hot side is
               0/1-exact in bf16, so dot(oh, hi) + dot(oh, mid) +
               dot(oh, lo) reconstructs the f32 result to ~f32 eps at
               HALF the MXU passes (Mosaic lowers only DEFAULT/HIGHEST —
               no built-in 3-pass mode, so the split is spelled out).
    'bf16'   — single-pass bf16 (rounds the products; rel err ~4e-3).
    Measured on v5e (Economics routed tail, device-time): exact 61 us,
    bf16x3 halves the dot share — the scatter dot dominates LOW-FILL
    blocks where few entries amortize each (RSp, mix*Bs) matmul."""
    if mode == "exact" or pr.dtype not in (jnp.float32, jnp.bfloat16):
        return jax.lax.dot(oh, pr, precision=jax.lax.Precision.HIGHEST)
    ohb = oh.astype(jnp.bfloat16)
    if pr.dtype == jnp.bfloat16 or mode == "bf16":
        return jax.lax.dot(ohb, pr.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) \
            .astype(jnp.float32)
    hi = pr.astype(jnp.bfloat16)
    r1f = pr - hi.astype(jnp.float32)
    mid = r1f.astype(jnp.bfloat16)
    lo = (r1f - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot(ohb, hi, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot(ohb, mid, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot(ohb, lo, preferred_element_type=jnp.float32)
    return acc


def _v2_kernel(vbs, cbs, xt_ref, val_ref, chunk_ref, pq_ref, *rest,
               Bs, RSp, W, K=0, streamed=False, mix=1, qbits=0,
               perm_fold=False, scatter_dot="exact"):
    """v2 kernel.  Resident: x (pre-transposed to lane-major) and virtual
    y live whole in VMEM; per block a W-pass in-lane gather, one
    permutation take, and a one-hot MXU matmul scatter into the block's
    RSp-chunk virtual window (or the sigma take + reshape fold when
    perm_fold).  STREAMED: xt_ref IS the (128, CW) x-sublane
    window and y_ref the (RSp, 128) virtual window, pipelined by index
    maps over the RSp/CW-ALIGNED plan — n/m bounded only by HBM; y zeroes
    on first visit of a window (same-window blocks are contiguous by plan
    order).  K > 0 adds the SpMM k-major leading dim: entry blocks,
    masks, and the scatter one-hot are read/built once across the K
    right-hand sides."""
    if perm_fold:
        sig_ref, y_ref = rest
    else:
        (y_ref,) = rest
    g = pl.program_id(0)

    if streamed:
        first = jnp.logical_or(g == 0, vbs[g] != vbs[jnp.maximum(g - 1, 0)])
    else:
        first = g == 0

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
    if perm_fold:
        # sigma-fold scatter: a plan-time per-lane sublane permutation
        # puts every product in a slot whose index == qrel (mod RSp), so
        # the scatter is transpose -> take -> transpose -> reshape fold —
        # no one-hot dot, and the plan colors with NO chunk constraint
        # (best-possible fill; Economics 0.57 vs 0.18 at mix=8)
        sg = sig_ref[0].astype(jnp.int32)             # (LANE, Bs)
    elif mix > 1:
        # chunk-mixed sublanes: qv carries (mi << qbits) | qrel per vlane;
        # each mix slot gets its own one-hot (RSp, Bs) rebuilt by masked
        # lane-max (a slot's entries all share one qrel per sublane) and a
        # vlane mask — the scatter is `mix` MXU dots instead of one
        qrels = jnp.bitwise_and(qv, jnp.int32((1 << qbits) - 1))
        mslot = jax.lax.shift_right_logical(qv, jnp.int32(qbits))
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (RSp, Bs), 0)
        mix_oh, mix_mask = [], []
        for ci in range(mix):
            m_ci = mslot == ci
            q_ci = jnp.max(jnp.where(m_ci, qrels, -1), axis=1,
                           keepdims=True)                   # (Bs, 1)
            mix_oh.append((iota_q == jnp.swapaxes(q_ci, 0, 1))
                          .astype(dtype))
            mix_mask.append(m_ci)
        # one stacked dot per rhs instead of `mix` small ones (the MXU is
        # latency-bound at (RSp x Bs) tiles; stacking amortizes it)
        mix_ohb = jnp.concatenate(mix_oh, axis=1)           # (RSp, mix*Bs)
    else:
        q0 = jnp.swapaxes(qv[:, 0:1], 0, 1)           # (1, Bs) per-sublane
        oh = (jax.lax.broadcasted_iota(jnp.int32, (RSp, Bs), 0)
              == q0).astype(dtype)
    lanes = xt_ref.shape[-1]
    single = streamed or lanes == W * LANE    # window IS the block
    cb = cbs[g]
    vb = vbs[g]

    def one_rhs(load_w, y_at, y_set):
        gt = jnp.zeros((LANE, LANE), dtype)
        for w in range(W):
            g_w = jnp.take_along_axis(load_w(w), low, axis=1)
            gt = jnp.where(wmask[w], g_w, gt) if W > 1 else g_w
        prod = _upcast(vals, dtype) * jnp.swapaxes(gt[:, :Bs], 0, 1)
        pr = jnp.take_along_axis(prod, perm, axis=1)  # virtual-lane layout
        if perm_fold:
            prT = jnp.swapaxes(pr, 0, 1)              # (LANE, Bs)
            pr2 = jnp.swapaxes(jnp.take_along_axis(prT, sg, axis=1), 0, 1)
            upd = (pr2.reshape(Bs // RSp, RSp, LANE).sum(0) if Bs > RSp
                   else pr2)
        elif mix > 1:
            zero = jnp.zeros_like(pr)
            prs = jnp.concatenate(
                [jnp.where(m, pr, zero) for m in mix_mask], axis=0)
            upd = _scatter_dot(mix_ohb, prs, scatter_dot)
        else:
            upd = _scatter_dot(oh, pr, scatter_dot)
        y_set(y_at() + upd)

    def wslice(w):
        if single:
            return slice(w * LANE, (w + 1) * LANE)
        return pl.ds(pl.multiple_of(cb + w * LANE, LANE), LANE)

    if streamed:
        if K == 0:
            one_rhs(lambda w: xt_ref[:, wslice(w)],
                    lambda: y_ref[...],
                    lambda v: y_ref.__setitem__(Ellipsis, v))
        else:
            def body(kk, carry):
                one_rhs(lambda w: xt_ref[kk, :, wslice(w)],
                        lambda: y_ref[kk],
                        lambda v: y_ref.__setitem__(kk, v))
                return carry
            jax.lax.fori_loop(0, K, body, 0)
    elif K == 0:
        one_rhs(lambda w: xt_ref[:, wslice(w)],
                lambda: y_ref[pl.ds(vb, RSp), :],
                lambda v: y_ref.__setitem__((pl.ds(vb, RSp), slice(None)),
                                            v))
    else:
        def body(kk, carry):
            one_rhs(lambda w: xt_ref[kk, :, wslice(w)],
                    lambda: y_ref[kk, pl.ds(vb, RSp), :],
                    lambda v: y_ref.__setitem__(
                        (kk, pl.ds(vb, RSp), slice(None)), v))
            return carry
        jax.lax.fori_loop(0, K, body, 0)


def build_colsort2(A, config, interpret: bool = False):
    """Plane-aligned virtual-row colsort SpMV; see module docstring.

    Config keys: block_entries (Bs*128), col_window (gather window in
    columns; full-width when >= num_cols), vrow_planes (K), vrow_span
    (RSp, multiple of 8), hub_cap (rows above it go to the hub region),
    lane_cap (per-(cell,lane) stack cap; 0 = auto), pack16, mix_chunks
    (sublanes may host up to this many chunks of their RSp group —
    `mix` one-hot dots in the kernel; lifts the Poisson column-lane
    collision bound on light scatter, Webbase main fill 0.17->0.52 at
    mix=4).  mix_chunks='perm' drops the chunk constraint entirely (best
    fill: Economics 0.57 vs 0.18) and scatters through a plan-time
    per-lane sublane permutation + reshape fold instead of dots.

    'perm' is an explicit-config EXPERIMENT, deliberately not in the
    tuner walk: measured on v5e it LOSES to the mix dots (Economics SpMV
    220 us vs mix4 138 us marginal) because the one-hot dot rides the
    otherwise-idle MXU while the kernel is bound by the W-pass XLU
    gathers — sigma's extra takes/transposes ADD to that critical path.
    The design-class roofline is ~(W / fill) XLU lane-ops per entry per
    rhs (Economics: 8/0.57 = 14 -> 17 GF/s ceiling at k=16; the mix rail
    measures 15.9 = 92% of it)."""
    from cusp_autotuned_tpu.ops.convert import _coo_arrays
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    from cusp_autotuned_tpu.utils.config import plan_value_dtype
    _reject_x64(A, interpret)
    if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
        raise NotImplementedException(
            "colsort2 kernel supports real dtypes only")
    row, col, val, shape = _coo_arrays(A)
    if row.size == 0:
        raise FormatConversionException("empty matrix — use the default path")
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float64)
    m, n = shape
    dtype = np.dtype(A.dtype)
    store = plan_value_dtype(config, dtype)

    B = int(config.get("block_entries", 16384))
    if B % LANE != 0:
        raise NotImplementedException(
            "block_entries must be a multiple of 128")
    Bs = B // LANE
    if Bs > LANE:
        raise NotImplementedException(
            "block_entries above 16384 exceed the transposed-gather tile")
    # a window wider than the matrix IS the full-width plan — clamp, so
    # an oversized col_window can't inflate W into a multi-GB x pad
    W = max(1, -(-min(int(config.get("col_window", n)), max(n, 1))
                 // (LANE * LANE)))
    CW = W * LANE
    # 0 means "default" for the shared tuning-space axes (a walk config
    # carries every axis; 0 is the not-applicable/default marker)
    K = int(config.get("vrow_planes", 0)) or K_DEFAULT
    lane_cap = int(config.get("lane_cap", 0))
    hub_cap = int(config.get("hub_cap", 0))
    RSp = int(config.get("vrow_span", 0)) or RSP_DEFAULT
    if RSp % 8 != 0:
        raise NotImplementedException("vrow_span must be a multiple of 8")
    mix_raw = config.get("mix_chunks", 0)
    perm = mix_raw == "perm"
    mix = 1 if perm else int(mix_raw or 0) or 1
    if not 1 <= mix <= 8:
        raise NotImplementedException("mix_chunks must be in 1..8 or 'perm'")
    scatter_dot = config.get("scatter_dot", 0) or "exact"
    if scatter_dot not in ("exact", "bf16x3", "bf16"):
        raise NotImplementedException(
            "scatter_dot must be 'exact', 'bf16x3', or 'bf16'")
    if perm and (RSp & (RSp - 1) or Bs % RSp or RSp > 128):
        raise NotImplementedException(
            "mix_chunks='perm' needs a power-of-two vrow_span <= 128 "
            "dividing block_entries/128")
    qbits = max(1, (RSp - 1).bit_length())

    n_pad = max(CW * LANE, round_up(n, CW * LANE))
    x_rows = n_pad // LANE
    m_pad_est = round_up(max(m, 1), LANE)
    yv_est = (K * (m_pad_est // LANE) + RSp) * LANE * dtype.itemsize
    # policy shared with the routed rail (hub chunks only shrink the
    # resident margin)
    from cusp_autotuned_tpu.kernels.streaming import (
        resolve_stream, band_mask, apply_band_mask)
    streamed = resolve_stream(config, x_rows * LANE * dtype.itemsize,
                              yv_est, MAX_VMEM_BYTES())
    if not streamed and x_rows * LANE * dtype.itemsize > MAX_VMEM_BYTES():
        raise NotImplementedException(
            "x too large for the VMEM-resident colsort2 kernel")

    from cusp_autotuned_tpu import native
    nat = None if (streamed or mix > 1 or perm) else getattr(
        native, "plan_colsort2", lambda *a: None)(
        row, col, val, shape, K, CW, Bs, RSp, lane_cap, hub_cap)
    sigma = None
    if nat is not None:
        (vals_, chunks_, pqs_, vbs_, cbs_, m_pad, hub_rows, nch_main,
         spill) = nat
    else:
        (vals_, chunks_, pqs_, vbs_, cbs_, m_pad, hub_rows, nch_main,
         spill, sigma) = _plan_v2(
            row, col, val, shape, K, CW, Bs, RSp, lane_cap, hub_cap,
            hub_split=(Bs // RSp if perm else HUB_SPLIT),
            aligned=streamed, mix=mix, perm_fold=perm)
    nb = vals_.shape[0]

    # shrink the block span to what the plan actually uses: the one-hot
    # dot and the y window RMW both scale with RSp (resident only — the
    # streamed plan's windows sit on the RSp grid)
    if nb and not streamed:
        hi = pqs_ >> 7
        if mix > 1:
            hi = hi & ((1 << qbits) - 1)   # strip the mix-slot bits
        max_q = int(max(hi.max(initial=0), 0))
        if perm:
            # keep RSp a power of two dividing Bs (the residue fold);
            # sigma slots stay valid: s' == q (mod RSp') for RSp' | RSp
            cand = max(8, 1 << max_q.bit_length())
            if cand < RSp and Bs % cand == 0:
                RSp = cand
        else:
            RSp = max(8, min(RSp, round_up(max_q + 1, 8)))
    nch_hub = hub_rows.size // LANE
    if config.get("plan_only"):
        # stats-only probe (no device arrays): the routed tail auto-search
        # prices candidate tail configurations with this
        n_spill = int(spill[0].size)
        slots = int(nb) * Bs * LANE
        return dict(impl="colsort2", nb=int(nb), Bs=Bs, W=W, RSp=RSp, K=K,
                    mix=mix, streamed=bool(streamed), spill=n_spill,
                    nnz=int(row.size), slots=slots,
                    fill=round((row.size - n_spill) / max(slots, 1), 4))
    VRs = round_up(nch_main + nch_hub + RSp, RSp if streamed else 8)
    if not streamed and VRs * LANE * dtype.itemsize > MAX_VMEM_BYTES():
        raise NotImplementedException(
            "virtual rows exceed the VMEM budget — use stream_x=1")

    pack16 = config.get("pack16", "auto")
    pq16_ok = (RSp * LANE < (1 << 15) if mix == 1
               else 7 + qbits + (mix - 1).bit_length() <= 15)
    can16 = (Bs % 16 == 0 and CW < (1 << 15) and pq16_ok)
    if pack16 == "auto":
        pack16 = can16
    elif pack16 and not can16:
        raise NotImplementedException(
            "pack16 requires block_entries % 2048 == 0 and small windows")
    if pack16:
        chunks_ = chunks_.astype(np.int16)
        pqs_ = pqs_.astype(np.int16)
    if perm:
        sigma = sigma.astype(np.int16 if pack16 else np.int32)
    plan_bytes = vals_.nbytes + chunks_.nbytes + pqs_.nbytes \
        + (sigma.nbytes if perm else 0)
    if plan_bytes > _plan_budget(config):
        raise NotImplementedException(
            "planned arrays exceed the compile-request budget")

    if streamed:
        vbs_ = vbs_ // RSp                    # y window index
        cbs_ = cbs_ // CW                     # x window index
    kern = functools.partial(_v2_kernel, Bs=Bs, RSp=RSp, W=W,
                             streamed=streamed, mix=mix, qbits=qbits,
                             perm_fold=perm, scatter_dot=scatter_dot)
    entry_specs = [pl.BlockSpec((1, Bs, LANE), lambda g, *_: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 3
    if perm:
        entry_specs.append(
            pl.BlockSpec((1, LANE, Bs), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM))
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
                flops=2 * nbv * Bs * LANE + 2 * nbv * RSp * Bs * LANE,
                bytes_accessed=(plan_bytes
                                + (x_rows + VRs) * LANE * dtype.itemsize),
                transcendentals=0),
            interpret=interpret))

    arrays = dict(
        v2v=jnp.asarray(vals_.astype(store)), v2c=jnp.asarray(chunks_),
        v2p=jnp.asarray(pqs_), v2vb=jnp.asarray(vbs_),
        v2cb=jnp.asarray(cbs_))
    if perm:
        arrays["v2s"] = jnp.asarray(sigma)
    if streamed:
        # windows no block visits keep garbage: mask them out of the fold
        arrays["v2wm"] = band_mask(vbs_, VRs // RSp, RSp, dtype)
    has_hub = nch_hub > 0
    if has_hub:
        arrays["v2hub"] = jnp.asarray(hub_rows)
    srow, scol, sval = spill
    has_spill = srow.size > 0
    if has_spill:
        so = np.lexsort((scol, srow))
        arrays.update(srow=jnp.asarray(srow[so].astype(np.int32)),
                      scol=jnp.asarray(scol[so].astype(np.int32)),
                      sval=jnp.asarray(sval[so].astype(dtype)))

    def make_call_mm(KK, nbv, _cache={}):
        callK = _cache.get((KK, nbv))
        if callK is None:
            kernK = functools.partial(_v2_kernel, Bs=Bs, RSp=RSp, W=W,
                                      K=KK, streamed=streamed, mix=mix,
                                      qbits=qbits, perm_fold=perm)
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

    def fold(arrs, yv_flat):
        """Virtual -> actual rows: reshape-sum planes + hub scatter-add."""
        planes = yv_flat[..., : nch_main * LANE]
        shp = planes.shape[:-1]
        y = planes.reshape(shp + (K, m_pad))[..., :m].sum(axis=-2)
        if has_hub:
            hubv = jax.lax.dynamic_slice_in_dim(
                yv_flat, nch_main * LANE, nch_hub * LANE, axis=-1)
            if y.ndim == 1:
                y = y.at[arrs["v2hub"]].add(hubv, mode="drop")
            else:
                y = y.at[:, arrs["v2hub"]].add(hubv, mode="drop")
        return y

    def apply(arrs, x):
        nbv = arrs["v2v"].shape[0]
        if x.ndim == 1:
            xt = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE).T
            if nbv:
                extra = (arrs["v2s"],) if perm else ()
                yv = make_call(nbv)(arrs["v2vb"], arrs["v2cb"], xt,
                                    arrs["v2v"], arrs["v2c"], arrs["v2p"],
                                    *extra)
                if "v2wm" in arrs:
                    yv = apply_band_mask(yv, arrs["v2wm"])
                # identity planes fold as a pure reshape + sum: no gather
                y = fold(arrs, yv.reshape(-1))
            else:
                y = jnp.zeros(m, dtype)
            if has_spill:
                y = y + jax.ops.segment_sum(arrs["sval"] * x[arrs["scol"]],
                                            arrs["srow"], num_segments=m,
                                            indices_are_sorted=True)
            return y
        if x.ndim != 2:
            raise NotImplementedException("colsort2 kernel takes 1-D/2-D x")
        KK = x.shape[1]
        if KK == 0:
            return jnp.zeros((m, 0), dtype)
        # k-major chunks: entries read once per chunk, x/yv chunks bounded
        # by the VMEM budget (streamed rail holds only windows in VMEM)
        per_k = ((CW + RSp) if streamed else (x_rows + VRs)) \
            * LANE * dtype.itemsize
        KB = max(1, int(1.5 * MAX_VMEM_BYTES() // (2 * per_k)))
        if KB > 8:
            KB -= KB % 8
        KB = int(config.get("spmm_kb", 0)) or KB
        KB = min(KB, KK)
        xT = jnp.pad(x, ((0, n_pad - n), (0, 0))).T        # (K, n_pad)
        xTp = jnp.pad(xT, ((0, (-KK) % KB), (0, 0)))
        outs = []
        for s0 in range(0, KK, KB):
            xc = jax.lax.dynamic_slice_in_dim(xTp, s0, KB, axis=0)
            if nbv:
                x3t = jnp.swapaxes(xc.reshape(KB, x_rows, LANE), 1, 2)
                extra = (arrs["v2s"],) if perm else ()
                yv = make_call_mm(KB, nbv)(arrs["v2vb"], arrs["v2cb"], x3t,
                                           arrs["v2v"], arrs["v2c"],
                                           arrs["v2p"], *extra)
                if "v2wm" in arrs:
                    yv = apply_band_mask(yv, arrs["v2wm"])
                yk = fold(arrs, yv.reshape(KB, -1))
            else:
                yk = jnp.zeros((KB, m), dtype)
            if has_spill:
                xs = jnp.take(xc, arrs["scol"], axis=1)    # (KB, ns)
                contrib = jax.ops.segment_sum(
                    xs.T * arrs["sval"][:, None], arrs["srow"],
                    num_segments=m, indices_are_sorted=True)
                yk = yk + contrib.T
            outs.append(yk)
        return jnp.concatenate(outs, axis=0)[:KK].T

    def fn(x):
        return apply(arrays, x)
    fn.planned_arrays = arrays
    fn.apply = apply
    # diagnostics: the kernel-class cost model is ~W XLU lane-ops per SLOT
    # per rhs (the W-pass take_along gathers; the one-hot scatter dot rides
    # the idle MXU), so t_xlu ~= nb*Bs*W cycles bounds this plan's SpMV.
    # fill = placed entries / slots is the efficiency knob the colorers buy.
    n_spill = int(srow.size)
    slots = int(nb) * Bs * LANE
    fn.plan_stats = dict(
        impl="colsort2", nb=int(nb), Bs=Bs, W=W, RSp=RSp, K=K, mix=mix,
        streamed=bool(streamed), slots=slots,
        nnz=int(row.size), spill=n_spill,
        fill=round((row.size - n_spill) / max(slots, 1), 4),
        xlu_cycles_per_rhs=int(nb) * Bs * W,
        plan_bytes=int(plan_bytes))
    return fn

"""Pallas TPU DIA SpMV — the flagship kernel.

Rebuild target: the fork's tunable blocked-offsets DIA kernel
(cusp/system/cuda/ktt/kernels/dia_kernel.h:129-252 — shared-memory offset
staging, register prefetch, __ldcs special loads).  The TPU rebuild needs
none of those knobs: the diagonal offsets are *static* (baked into the
program), so each diagonal becomes a compile-time-shifted read of x — pure
VPU FMAs with zero gathers.

Design:
  - x (padded) lives in VMEM for the whole grid, reshaped (rows/128, 128);
    it is read from HBM exactly once.
  - The (num_diags, block_rows) data blocks stream through the implicit
    Pallas pipeline (compiler double-buffers them against compute).
  - A diagonal shift t decomposes into a sublane shift q = t // 128 (a
    dynamic but cheap dim-0 slice of VMEM) and a lane shift r = t % 128
    (two lane-rolls + a select).
  - Surviving tuning axis: block_rows — the analogue of BLOCK_SIZE in the
    reference's space (dia_multiply.h:24-55).

HBM traffic ≈ data once + x once + y once: the roofline minimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusp_autotuned_tpu.utils.padding import LANE, round_up
from cusp_autotuned_tpu.utils.exceptions import NotImplementedException

def MAX_X_VMEM_BYTES():
    # beyond this, x no longer fits comfortably in VMEM next to the data
    # blocks (configurable: CUSP_TPU_VMEM_BUDGET + 2 MB headroom)
    from cusp_autotuned_tpu.utils.config import get_config
    return get_config().vmem_budget_bytes + 2 * 1024 * 1024
MIN_BLOCK_ROWS = 8 * LANE   # (8, 128) min tile
MAX_BLOCK_ROWS = 32768      # measured knee: larger no longer amortizes


def _auto_block_rows(k, rows_padded, itemsize):
    """Largest block that keeps the double-buffered data block under ~4 MB
    of VMEM (next to the resident x) AND leaves at least ~6 grid steps.
    Measured on v5e (poisson5pt 1M rows): br 4096 -> 322 GB/s useful,
    8192 -> 506, 16384 -> 711, 32768 -> 822 — per-block grid overhead,
    not HBM, binds small blocks, so default to the largest budget-fitting
    block at scale.  SMALL matrices invert the rule: one or two grid
    steps leave the Pallas pipeline nothing to double-buffer (FEM/Harbor
    12k rows: br 8192 -> 10.4 us device, br 2048 -> 7.9 — the round-3
    'mid-fill DIA slack' was this, not fill)."""
    br = MIN_BLOCK_ROWS
    while (br < MAX_BLOCK_ROWS and (2 * br) * 5 <= rows_padded
           and k * (2 * br) * itemsize * 2 <= (4 << 20)):
        br *= 2
    return br


def _prep_data3(data, k, mp, rows_sub, store):
    """(k, mp) diagonal data -> (k, rows_sub, 128) blocks in the storage
    dtype.  SMALL concrete data preps on the HOST with one upload — the
    eager jnp pad/reshape/astype spelling is three XLA compile requests
    per level shape on a relayed TPU (~1 s per AMG level).  LARGE
    device-resident data keeps the device spelling: pulling it back and
    re-uploading costs two whole-array transfers through the
    burst-throttled relay (measured 80 s for a 20 MB fine level)."""
    import jax

    # host path ONLY for data already on the host: pulling a device
    # array back costs a whole-array transfer through the erratic
    # burst-throttled relay (measured 8-80 s for 1-20 MB on bad windows)
    host_ok = isinstance(data, np.ndarray)
    if host_ok:
        dn = np.asarray(data)
        if dn.shape[1] != mp:
            dn = np.pad(dn, ((0, 0), (0, mp - dn.shape[1])))
        return jnp.asarray(dn.reshape(k, rows_sub, LANE).astype(store))
    if data.shape[1] != mp:
        data = jnp.pad(data, ((0, 0), (0, mp - data.shape[1])))
    return data.reshape(k, rows_sub, LANE).astype(store)


def build_dia(A, config, interpret: bool = False):
    from cusp_autotuned_tpu.kernels.pallas_binned import _reject_x64
    from cusp_autotuned_tpu.utils.config import plan_value_dtype
    _reject_x64(A, interpret)
    store = plan_value_dtype(config, A.dtype)   # bf16 halves the data stream
    m, n = A.shape
    offsets = A.offsets
    k = len(offsets)
    block_rows = int(config.get("block_rows", 0)) or \
        _auto_block_rows(k, A.rows_padded, store.itemsize)
    if block_rows % MIN_BLOCK_ROWS != 0:
        raise NotImplementedException("block_rows must be a multiple of 1024")
    left = -min(0, min(offsets))          # left padding so all shifts >= 0
    mp = round_up(A.rows_padded, block_rows)
    rows_sub = mp // LANE                 # x/y sublane rows
    sub_block = block_rows // LANE
    max_q = (max(offsets) + left) // LANE + 2
    x_rows = rows_sub + max_q + (left // LANE) + 2
    if x_rows * LANE * A.dtype.itemsize > MAX_X_VMEM_BYTES():
        # x no longer fits next to the data blocks: stream it as two
        # consecutive row blocks per grid step (same trick as the SpMM
        # kernel) — works whenever the diagonal span fits one block
        return _build_dia_streamed(A, block_rows, interpret, store, config)

    grid = mp // block_rows
    data_src = getattr(A, "_host_data", None)
    data3 = _prep_data3(A.data if data_src is None else data_src,
                        k, mp, rows_sub, store)

    kernel = functools.partial(_dia_kernel, offsets=offsets, left=left,
                               sub_block=sub_block)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # x: fully resident
            pl.BlockSpec((k, sub_block, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # streamed data
        ],
        out_specs=pl.BlockSpec((sub_block, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * mp,
            bytes_accessed=(k * mp * store.itemsize
                            + (x_rows * LANE + mp) * A.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    x_len = x_rows * LANE

    def apply(arrays, x):
        if x.ndim == 2:
            if x.shape[1] <= 64:
                # the Pallas SpMM spelling is only profitable for k >= 65
                # (Mosaic lowers sub-128 lane widths poorly); the planned
                # operator must still WORK for narrow blocks (factored AMG
                # operators applied to block vectors, lobpcg, cg_m), so
                # route them through the traffic-optimal XLA fused path
                # built from the same planned data
                return _dia_spmm_xla(arrays["data"], offsets, left,
                                     m, n, A.dtype, x)
            return _dia_spmm(A, block_rows, interpret, store)(x)
        if x.ndim != 1:
            raise NotImplementedException("pallas DIA kernel takes 1-D/2-D x")
        x2 = jnp.pad(x, (left, x_len - left - n)).reshape(x_rows, LANE)
        return call(x2, arrays["data"]).reshape(mp)[:m]

    arrays = {"data": data3}

    def fn(x):
        return apply(arrays, x)

    # planned-operator contract (operators.planned_operator): the DIA data
    # rides jit as a PARAMETER instead of an embedded constant, so
    # via_dia-planned AMG level operators don't hit the relay's
    # compile-request size cap at 1M-row scale
    fn.planned_arrays = arrays
    fn.apply = apply
    return fn


def _build_dia_streamed(A, block_rows, interpret, store=None, config=None):
    """DIA SpMV with x STREAMED as two consecutive (block_rows/128, 128)
    blocks per grid step instead of fully VMEM-resident — lifts the matrix
    size cap for banded operators whose diagonal span fits one block."""
    m, n = A.shape
    offsets = A.offsets
    k = len(offsets)
    left = -min(0, min(offsets))
    if left + max(max(offsets), 0) > block_rows - LANE:
        raise NotImplementedException(
            "diagonal span exceeds block_rows for the streamed DIA kernel")
    if store is None:
        store = np.dtype(A.dtype)
    mp = round_up(A.rows_padded, block_rows)
    rows_sub = mp // LANE
    sub_block = block_rows // LANE
    grid = mp // block_rows
    data_src = getattr(A, "_host_data", None)
    data3 = _prep_data3(A.data if data_src is None else data_src,
                        k, mp, rows_sub, store)
    x_rows_total = (grid + 2) * sub_block

    kernel = functools.partial(_dia_streamed_kernel, offsets=offsets,
                               left=left, sub_block=sub_block)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((sub_block, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # x block i
            pl.BlockSpec((sub_block, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),          # x block i+1
            pl.BlockSpec((k, sub_block, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # streamed data
        ],
        out_specs=pl.BlockSpec((sub_block, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * mp,
            bytes_accessed=(k * mp * store.itemsize
                            + 3 * mp * A.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    x_len = x_rows_total * LANE

    def apply(arrays, x):
        if x.ndim == 2:
            if x.shape[1] <= 64:
                return _dia_spmm_xla(arrays["data"], offsets, left,
                                     m, n, A.dtype, x)
            return _dia_spmm(A, block_rows, interpret, store)(x)
        if x.ndim != 1:
            raise NotImplementedException("pallas DIA kernel takes 1-D/2-D x")
        x2 = jnp.pad(x, (left, x_len - left - n)).reshape(x_rows_total, LANE)
        return call(x2, x2, arrays["data"]).reshape(mp)[:m]

    arrays = {"data": data3}

    def fn(x):
        return apply(arrays, x)

    fn.planned_arrays = arrays
    fn.apply = apply
    return fn


def _dia_streamed_kernel(xa_ref, xb_ref, data_ref, y_ref, *, offsets, left,
                         sub_block):
    xcat = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub_block, LANE), 1)
    acc = None
    for d, off in enumerate(offsets):
        t = off + left
        q, r = divmod(t, LANE)
        if r == 0:
            shifted = xcat[q: q + sub_block, :]
        else:
            # one roll on the (sub_block+1)-row slice serves BOTH row offsets
            # (roll is per-row along lanes, so the two shifted views are just
            # static sub-slices of the rolled tile) — measured ~6% whole-
            # kernel win over rolling a and b separately
            xx = xcat[q: q + sub_block + 1, :]
            rolled = pltpu.roll(xx, LANE - r, 1)
            shifted = jnp.where(lane < LANE - r, rolled[:sub_block],
                                rolled[1:])
        term = _upcast(data_ref[d], y_ref.dtype) * shifted
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def _upcast(v, dtype):
    """bf16-stored plan values promote to the accumulation dtype before the
    FMA (explicit, so Mosaic never sees a mixed-dtype multiply); a static
    no-op when value_dtype isn't narrowed."""
    return v if v.dtype == dtype else v.astype(dtype)


def _dia_spmm_xla(data3, offsets, left, m, n, dtype, x):
    """Narrow-block DIA SpMM (k <= 64) from the PLANNED data arrays: one
    shifted-slice FMA per diagonal, which XLA fuses into a single
    traffic-optimal pass (measured on v5e: beats every Pallas spelling at
    sub-128 lane widths — see the k-gate in _dia_spmm)."""
    nd = data3.shape[0]
    mp = data3.shape[1] * LANE
    data = data3.reshape(nd, mp).astype(dtype)
    max_off = max(max(offsets), 0)
    need = left + max_off + mp
    # bottom pad clamps at 0: for wide matrices (n > mp + max_off) x is
    # already longer than the slices need (ADVICE r3 — jnp.pad raises on
    # negative widths)
    xp = jnp.pad(x.astype(dtype),
                 ((left, max(0, need - left - x.shape[0])), (0, 0)))
    y = None
    for d, off in enumerate(offsets):
        seg = jax.lax.dynamic_slice_in_dim(xp, off + left, mp, axis=0)
        term = data[d][:, None] * seg
        y = term if y is None else y + term
    return y[:m]


def _dia_spmm(A, block_rows, interpret, store=None):
    """DIA x dense-block multiply, y (m, k) = A @ x (n, k).

    Rebuild target: the reference's CSR x array2d block kernel
    (cusp/system/cuda/detail/multiply/csr_block_spmv.h:187-226).  With k
    riding the lane dimension, every diagonal shift is a STATIC sublane
    slice of two consecutive streamed x blocks — no lane rolls, no gathers;
    XLA's fallback re-reads x once per diagonal, this kernel reads it once
    total (the memory-bound optimum for small k)."""
    m, n = A.shape
    offsets = A.offsets
    ndiag = len(offsets)
    left = -min(0, min(offsets))
    if store is None:
        store = np.dtype(A.dtype)
    if left + max(max(offsets), 0) > block_rows:
        raise NotImplementedException(
            "diagonal span exceeds block_rows for the DIA SpMM kernel")
    mp = round_up(A.rows_padded, block_rows)
    grid = mp // block_rows
    data = A.data
    if data.shape[1] != mp:
        data = jnp.pad(data, ((0, 0), (0, mp - data.shape[1])))

    def make(k):
        # native k as the block minor dim (equal to the array dim — allowed
        # by the tiling rules) keeps HBM traffic at k columns, not 128
        kp = k if k <= LANE else round_up(k, LANE)
        # VMEM budget: xa/xb double-buffered + y + concat/acc temporaries.
        # VMEM lane-pads sub-128 minor dims, so account full 128 lanes.
        kp_vmem = round_up(kp, LANE)
        br = block_rows
        while br > 8 * LANE and br * kp_vmem * A.dtype.itemsize * 9 > \
                12 * 1024 * 1024:
            br //= 2
        if left + max(max(offsets), 0) > br:
            raise NotImplementedException(
                "diagonal span exceeds the VMEM-budgeted block_rows")
        mp_l = round_up(A.rows_padded, br)
        grid_l = mp_l // br
        data_l = A.data
        if data_l.shape[1] != mp_l:
            data_l = jnp.pad(data_l, ((0, 0), (0, mp_l - data_l.shape[1])))
        data_l = data_l.astype(store)
        x_rows_total = (grid_l + 2) * br

        kernel = functools.partial(_dia_spmm_kernel, offsets=offsets,
                                   left=left, block_rows=br)
        return pl.pallas_call(
            kernel,
            grid=(grid_l,),
            in_specs=[
                pl.BlockSpec((ndiag, br), lambda i: (0, i),
                             memory_space=pltpu.VMEM),       # data (streamed)
                pl.BlockSpec((br, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),       # x block i
                pl.BlockSpec((br, kp), lambda i: (i + 1, 0),
                             memory_space=pltpu.VMEM),       # x block i+1
            ],
            out_specs=pl.BlockSpec((br, kp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp_l, kp), A.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * ndiag * mp_l * k,
                bytes_accessed=(ndiag * mp_l + (mp_l + m) * kp)
                * A.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        ), kp, x_rows_total, data_l, mp_l

    def fn(x):
        k = x.shape[1]
        if k <= 64:
            # measured on v5e: for small k the XLA fused path beats both the
            # native-k and row-packed Pallas spellings (Mosaic lowers the
            # per-diagonal lane work poorly at sub-128 widths) — surface a
            # skippable error so the tuner keeps the XLA variant
            raise NotImplementedException(
                "DIA SpMM Pallas kernel is profitable for k >= 65 only")
        call, kp, x_rows_total, data_l, mp_l = make(k)
        x2 = jnp.pad(x, ((left, x_rows_total - left - n), (0, kp - k)))
        return call(data_l, x2, x2)[:m, :k]

    return fn


def _dia_spmm_kernel(data_ref, xa_ref, xb_ref, y_ref, *, offsets, left,
                     block_rows):
    xcat = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=0)
    acc = None
    for d, off in enumerate(offsets):
        t = off + left                          # static, in [0, 2*block_rows)
        seg = xcat[t: t + block_rows, :]
        term = _upcast(data_ref[d], y_ref.dtype)[:, None] * seg
        acc = term if acc is None else acc + term
    y_ref[...] = acc


def _dia_kernel(x_ref, data_ref, y_ref, *, offsets, left, sub_block):
    base = pl.program_id(0) * sub_block
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub_block, LANE), 1)
    acc = None
    for d, off in enumerate(offsets):
        t = off + left
        q, r = divmod(t, LANE)
        if r == 0:
            shifted = x_ref[pl.ds(base + q, sub_block), :]
        else:
            # roll left by r == roll right by LANE - r (pltpu.roll needs a
            # non-negative shift): out[l] = src[(l + r) mod LANE].  One roll
            # on the (sub_block+1)-row slice serves both row offsets — the
            # two shifted views are static sub-slices of the rolled tile
            xx = x_ref[pl.ds(base + q, sub_block + 1), :]
            rolled = pltpu.roll(xx, LANE - r, 1)
            shifted = jnp.where(lane < LANE - r, rolled[:sub_block],
                                rolled[1:])
        term = _upcast(data_ref[d], y_ref.dtype) * shifted
        acc = term if acc is None else acc + term
    y_ref[:] = acc

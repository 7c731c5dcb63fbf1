"""Kernel-variant registry + per-format tuning spaces.

The fork's per-format tuning spaces (cusp/system/cuda/ktt/{dia,csr,ell,coo}
_multiply.h) are rebuilt here with TPU-meaningful axes: implementation choice
(XLA-fused vs Pallas), Pallas block shapes (rows per program), and masking
strategy.  Configuration values are baked into Python closures that jit
specializes — the TPU analogue of KTT's NVRTC '#define' injection.

Every variant is a function build(A, config) -> fn(x) -> y with fn traceable
(the tuner jits and caches it).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu import formats as F
from cusp_autotuned_tpu.autotune.space import TuningSpace, Parameter
from cusp_autotuned_tpu.utils.exceptions import NotImplementedException


# -- XLA-fused variants (reuse the generic jnp SpMV with knobs) ---------------

def _build_dia_slices(A, config):
    import dataclasses as _dc
    import numpy as np
    from cusp_autotuned_tpu.ops.multiply import spmv_dia
    from cusp_autotuned_tpu.utils.config import plan_value_dtype

    # honor value_dtype on the XLA path too (bf16 data x f32 x promotes to
    # f32 — same accumulate precision as the Pallas kernels' _upcast)
    store = plan_value_dtype(config, A.dtype)
    if store != np.dtype(A.dtype):
        A = _dc.replace(A, data=A.data.astype(store))

    def fn(x):
        return spmv_dia(A, x)
    return fn


def _build_dia_gather(A, config):
    def fn(x):
        m, n = A.shape
        mp = A.rows_padded
        idx = (jnp.arange(mp, dtype=jnp.int32)[None, :]
               + jnp.asarray(A.offsets, jnp.int32)[:, None])
        xg = x[jnp.clip(idx, 0, n - 1)]
        valid = (idx >= 0) & (idx < n)
        return jnp.sum(jnp.where(valid, A.data * xg, 0), axis=0)[:m]
    return fn


def _build_ell_gather(A, config):
    from cusp_autotuned_tpu.ops.multiply import spmv_ell

    def fn(x):
        return spmv_ell(A, x)
    return fn


def _build_csr_segsum(A, config):
    from cusp_autotuned_tpu.ops.multiply import spmv_csr

    def fn(x):
        return spmv_csr(A, x)
    return fn


def _build_coo_segsum(A, config):
    from cusp_autotuned_tpu.ops.multiply import spmv_coo

    def fn(x):
        return spmv_coo(A, x)
    return fn


def _build_hyb(A, config):
    from cusp_autotuned_tpu.ops.multiply import spmv_hyb

    def fn(x):
        return spmv_hyb(A, x)
    return fn


def _build_pallas(format_name):
    def build(A, config):
        from cusp_autotuned_tpu.kernels import pallas_spmv
        return pallas_spmv.build(format_name, A, config)
    return build


def _build_binned(A, config):
    """Row-lane-binned Pallas kernel (scatter-free unstructured SpMV)."""
    from cusp_autotuned_tpu.kernels import pallas_spmv
    return pallas_spmv.build_binned(A, config)


def _build_colsort(A, config):
    """Column-lane-binned Pallas kernel (gather-free; scattered patterns)."""
    from cusp_autotuned_tpu.kernels import pallas_spmv
    return pallas_spmv.build_colsort(A, config)


def _build_colsort2(A, config):
    """Plane-aligned virtual-row colsort v2 (MXU matmul scatter +
    reshape fold; scattered patterns)."""
    from cusp_autotuned_tpu.kernels import pallas_spmv
    return pallas_spmv.build_colsort2(A, config)


def _build_routed(A, config):
    """Routed-gather rail v3 (fixed 3-take gather via the
    take/transpose/take sandwich + reshape-sum scatter; the Poisson/hub
    tail rides a colsort2 sub-plan)."""
    from cusp_autotuned_tpu.kernels import pallas_spmv
    return pallas_spmv.build_routed(A, config)


def _build_bcoo(A, config):
    """Vendor-library baseline (jax.experimental.sparse BCOO — the
    reference's cusparse-adapter analogue).  Explicit-config only; not
    part of the tuning walk."""
    from cusp_autotuned_tpu.backend.jsparse import bcoo_spmv
    return bcoo_spmv(A)


def _build_ellr_rowlen(A, config):
    """ELLR-semantics SpMV: mask slots by row_lengths instead of the -1
    sentinel (the fork's ELLR=1 kernel rail, kernels/ell_kernel.h:86-213)."""
    def fn(x):
        n = A.num_cols
        slot = jnp.arange(A.width, dtype=jnp.int32)[:, None]
        live = slot < A.row_lengths[None, :]
        xg = x[jnp.clip(A.col, 0, n - 1)]
        prod = A.val * xg if xg.ndim == 2 else A.val[..., None] * xg
        return jnp.sum(jnp.where(live if prod.ndim == 2 else live[..., None],
                                 prod, 0), axis=0)[: A.num_rows]
    return fn


def _inner_dia_impl(config, D=None):
    """Inner DIA kernel for the via_dia/rcm_dia moves.  Explicit
    dia_impl wins; the auto default picks the Pallas kernel on a real
    TPU once the diagonal count is nontrivial — the XLA slices spelling
    degrades with k and collapses outright on wide scattered offset sets
    (Protein k=159: slices 12.7 ms vs pallas 12.8 us device time; the
    crossover is ~k=9 on v5e)."""
    d = config.get("dia_impl")
    auto = d in (None, "none", 0)     # unset / walk's not-applicable marker
    if not auto:
        return d
    if D is not None:
        from cusp_autotuned_tpu.kernels.pallas_spmv import _interpret
        if not _interpret() and len(D.offsets) >= 9:
            return "pallas"
    return "slices"


def _build_via_dia(A, config):
    """Format-selection move: re-lay the matrix out as DIA (distinct
    col-row deltas become masked diagonals) and run the Pallas/XLA DIA
    kernel.  Viable when the diagonal fill is acceptable — the conversion's
    fill guard rejects pathological patterns, which the tuner records as a
    skippable failure (KTT DeviceLimitsExceeded semantics)."""
    from cusp_autotuned_tpu.ops.convert import convert
    D = convert(A, "dia")   # FormatConversionException -> skippable result
    fn = build_spmv(D, {**config, "impl": _inner_dia_impl(config, D)})
    if hasattr(fn, "planned_arrays"):   # label the rail for introspection
        fn.plan_stats = {**(getattr(fn, "plan_stats", None) or {}),
                         "impl": "via_dia"}
    return fn


def _build_via_dense(A, config):
    """Format-selection move: densify and run the plain MXU GEMV/GEMM
    (the reference serves dense patterns through array2d multiply,
    cusp/system/detail/generic/multiply.inl array2d path).  Viable when
    the dense data volume is comparable to the sparse entry stream —
    fill >= 1/4 makes m*n*4 B <= 2x the 8 B/entry sparse traffic — and
    small enough to embed (the relay size-caps compile requests); the
    guard raises the skippable conversion failure otherwise, exactly
    like via_dia's fill guard."""
    from cusp_autotuned_tpu.backend.reference import to_scipy
    from cusp_autotuned_tpu.utils.exceptions import FormatConversionException
    import numpy as np

    m, n = A.shape
    itemsize = np.dtype(A.dtype).itemsize
    dense_bytes = m * n * itemsize
    fill = A.nnz / max(m * n, 1)
    if fill < 0.25 or dense_bytes > (32 << 20):
        raise FormatConversionException(
            f"via_dense needs fill >= 0.25 and <= 32 MB dense data "
            f"(fill {fill:.3f}, {dense_bytes >> 20} MB)")
    D = jnp.asarray(to_scipy(A).toarray().astype(A.dtype))

    def fn(x):
        return D @ x
    return fn


def _build_rcm_dia(A, config):
    """Format-selection move: symmetric RCM reorder to shrink bandwidth,
    then DIA.  y = P^T (D @ (P x)) with the permutation applied as cheap
    vector gathers around the hot kernel."""
    from cusp_autotuned_tpu.graph.ordering import symmetric_rcm
    from cusp_autotuned_tpu.ops.convert import convert, _coo_arrays
    from cusp_autotuned_tpu.formats.coo import coo_matrix
    from cusp_autotuned_tpu.utils.exceptions import FormatConversionException
    import numpy as np

    if A.shape[0] != A.shape[1]:
        raise FormatConversionException(
            "rcm_dia requires a square matrix (symmetric permutation)")
    P = symmetric_rcm(A)
    perm = jnp.asarray(P.perm)
    inv = jnp.asarray(jnp.argsort(perm))
    row, col, val, shape = _coo_arrays(A)
    inv_np = np.asarray(inv)
    reord = coo_matrix(inv_np[row], inv_np[col], val, shape, sort=True)
    D = convert(reord, "dia")
    inner = build_spmv(D, {**config, "impl": _inner_dia_impl(config, D)})

    def fn(x):
        return inner(x[perm])[inv]
    return fn


VARIANTS: Dict[str, Dict[str, Callable]] = {
    "dia": {
        "slices": _build_dia_slices,
        "gather": _build_dia_gather,
        "pallas": _build_pallas("dia"),
    },
    "ell": {
        "gather": _build_ell_gather,
        "via_dia": _build_via_dia,
        "via_dense": _build_via_dense,
        "rcm_dia": _build_rcm_dia,
        "pallas": _build_pallas("ell"),
        "binned": _build_binned,
        "colsort": _build_colsort,
        "colsort2": _build_colsort2,
        "routed": _build_routed,
        "bcoo": _build_bcoo,
    },
    "ellr": {
        "gather": _build_ell_gather,
        "rowlen": _build_ellr_rowlen,
        "via_dia": _build_via_dia,
        "via_dense": _build_via_dense,
        "rcm_dia": _build_rcm_dia,
        "pallas": _build_pallas("ellr"),
        "binned": _build_binned,
        "colsort": _build_colsort,
        "colsort2": _build_colsort2,
        "routed": _build_routed,
        "bcoo": _build_bcoo,
    },
    "csr": {
        "segsum": _build_csr_segsum,
        "via_dia": _build_via_dia,
        "via_dense": _build_via_dense,
        "rcm_dia": _build_rcm_dia,
        "pallas": _build_pallas("csr"),
        "binned": _build_binned,
        "colsort": _build_colsort,
        "colsort2": _build_colsort2,
        "routed": _build_routed,
        "bcoo": _build_bcoo,
    },
    "coo": {
        "segsum": _build_coo_segsum,
        "via_dia": _build_via_dia,
        "via_dense": _build_via_dense,
        "pallas": _build_pallas("coo"),
        "binned": _build_binned,
        "colsort": _build_colsort,
        "colsort2": _build_colsort2,
        "routed": _build_routed,
        "bcoo": _build_bcoo,
    },
    "hyb": {
        "default": _build_hyb,
        "pallas": _build_pallas("hyb"),
        "via_dia": _build_via_dia,
        "via_dense": _build_via_dense,
        "binned": _build_binned,
        "colsort": _build_colsort,
        "colsort2": _build_colsort2,
        "routed": _build_routed,
        "bcoo": _build_bcoo,
    },
}

_DEFAULTS = {
    "dia": {"impl": "slices", "block_rows": 0},
    "ell": {"impl": "gather", "dia_impl": "none", "block_rows": 0},
    "ellr": {"impl": "rowlen", "dia_impl": "none", "block_rows": 0},
    "csr": {"impl": "segsum", "dia_impl": "none", "block_rows": 0},
    "coo": {"impl": "segsum", "dia_impl": "none", "block_rows": 0},
    "hyb": {"impl": "default"},
}

_PALLAS_BLOCK_ROWS = (2048, 8192, 16384, 32768)


def default_config(A) -> Dict[str, Any]:
    return dict(_DEFAULTS[A.format])


def tuning_space(A) -> TuningSpace:
    """The constrained tuning space for a matrix's format.

    Parameters mirror the fork's spaces in TPU terms: `impl` is the kernel
    strategy (incl. the format-selection moves via_dia / rcm_dia — the
    per-matrix format selection SURVEY.md calls for), `dia_impl` selects the
    inner DIA kernel for those moves, and `block_rows` is the Pallas
    rows-per-program (BLOCK_SIZE analogue, dia_multiply.h:24-55).
    Constraints pin parameters that don't apply — the same trick as the
    fork's PREFETCH_TYPE-only-when-prefetching constraint."""
    fmt = A.format
    space = TuningSpace(parameters=[])
    from cusp_autotuned_tpu.utils.config import get_config
    search_bf16 = get_config().search_low_precision and \
        np.dtype(A.dtype).itemsize == 4
    if fmt == "dia":
        space.add_parameter("impl", ("slices", "gather", "pallas"))
        space.add_parameter("block_rows", (0,) + _PALLAS_BLOCK_ROWS)
        space.add_constraint(("impl", "block_rows"),
                             lambda i, b: (b > 0) == (i == "pallas"))
        if search_bf16:
            # opt-in low-precision axis: bf16 value storage halves the
            # dominant HBM stream (f32 accumulate); validated at its own
            # precision class (Tuner._tolerance)
            space.add_parameter("value_dtype", ("none", "bfloat16"))
            space.add_constraint(("impl", "value_dtype"),
                                 lambda i, v: v == "none"
                                 or i in ("slices", "pallas"))
    elif fmt in ("ell", "ellr", "csr", "coo"):
        impls = {
            "ell": ("gather", "via_dia", "via_dense", "rcm_dia", "pallas",
                    "binned", "colsort", "colsort2", "routed"),
            "ellr": ("gather", "rowlen", "via_dia", "via_dense", "rcm_dia",
                     "pallas", "binned", "colsort", "colsort2", "routed"),
            "csr": ("segsum", "via_dia", "via_dense", "rcm_dia", "pallas",
                    "binned", "colsort", "colsort2", "routed"),
            "coo": ("segsum", "via_dia", "via_dense", "pallas", "binned",
                    "colsort", "colsort2", "routed"),
        }[fmt]
        space.add_parameter("impl", impls)
        space.add_parameter("dia_impl", ("none", "slices", "pallas"))
        space.add_parameter("block_rows", (0, 2048, 8192))
        # Pallas kernel meta-parameters (impl in pallas/binned/colsort):
        # block_entries = entries per grid step, col_window = resident x
        # window (one-hot + binned), row_window = scatter window (binned +
        # colsort).  Values that exceed the matrix are pruned — a block
        # larger than nnz or a window wider than the matrix adds nothing
        # (and would bloat the exhaustive-validation walk).
        def fit(values, cap):
            kept = tuple(v for v in values if v == 0 or v <= cap)
            return kept if len(kept) > 1 else values[:2]
        space.add_parameter("block_entries",
                            fit((0, 2048, 16384), 2 * A.nnz + 2048))
        space.add_parameter("col_window",
                            fit((0, 2048, 131072), 2 * A.num_cols + 2048))
        space.add_parameter("row_window",
                            fit((0, 512, 4096), 2 * A.num_rows + 512))
        # hub-pass rows-per-group (colsort only): 8 packs extreme power-law
        # hubs densely, 32 amortizes block count on milder skews
        space.add_parameter("hub_rows", (0, 8, 32))
        space.add_constraint(("impl", "hub_rows"),
                             lambda i, h: (h > 0) == (i == "colsort"))
        space.add_constraint(("impl", "dia_impl"),
                             lambda i, d: (d == "none") == (i not in ("via_dia", "rcm_dia")))
        space.add_constraint(("dia_impl", "block_rows"),
                             lambda d, b: (b > 0) == (d == "pallas"))
        space.add_constraint(("impl", "block_entries"),
                             lambda i, b: (b > 0) == (i in ("pallas", "binned", "colsort", "colsort2")))
        space.add_constraint(("impl", "col_window"),
                             lambda i, c: (c > 0) == (i in ("pallas", "binned", "colsort", "colsort2")))
        space.add_constraint(("impl", "row_window"),
                             lambda i, r: (r > 0) == (i in ("binned", "colsort")))
        # round-2 verdict: search the REAL surface — the streaming choice,
        # int16 metadata packing, the hub spill threshold, the SpMM chunk,
        # and colsort2's virtual planes are tuned, not auto-only
        space.add_parameter("stream_x", (0, 1))
        space.add_constraint(("impl", "stream_x"),
                             lambda i, s: s == 0
                             or i in ("binned", "colsort", "colsort2",
                                      "routed"))
        space.add_parameter("pack16", ("auto", 0))
        space.add_constraint(("impl", "pack16"),
                             lambda i, p: p == "auto" or i in ("binned", "colsort", "colsort2"))
        # routed-only: g2/perm planes in int8 (they index 0..127), a
        # further -32 KB/block of plan traffic; skippable if Mosaic
        # rejects the int8 tiles on some generation
        space.add_parameter("pack8", (0, 1))
        space.add_constraint(("impl", "pack8"),
                             lambda i, p: p == 0 or i == "routed")
        space.add_parameter("hub_cap", (0, 8, 64))
        space.add_constraint(("impl", "hub_cap"),
                             lambda i, h: h == 0
                             or i in ("colsort", "colsort2", "routed"))
        space.add_parameter("spmm_kb", (0, 8))
        space.add_constraint(("impl", "spmm_kb"),
                             lambda i, k: k == 0
                             or i in ("binned", "colsort", "colsort2",
                                      "routed"))
        # keep the exhaustive walk tractable: the streaming/packing pair is
        # a real 2x2 surface, but hub_cap and spmm_kb vary one at a time
        # against default settings of the other secondary axes
        space.add_constraint(
            ("stream_x", "pack16", "hub_cap", "spmm_kb"),
            lambda s, p, h, k: (h == 0 and k == 0)
            or (s == 0 and p == "auto" and (h == 0 or k == 0)))
        space.add_constraint(
            ("pack8", "stream_x", "pack16", "hub_cap", "spmm_kb",
             "vrow_planes"),
            lambda p8, s, p, h, k, v: p8 == 0
            or (s == 0 and p == "auto" and h == 0 and k == 0
                and v in (0, 1)))
        space.add_parameter("vrow_planes", (0, 1, 2, 4))
        space.add_constraint(("impl", "vrow_planes"),
                             lambda i, v: (v > 0) == (i in ("colsort2",
                                                            "routed")))
        # chunk-mixed sublanes (colsort2): 0 = uniform; 4/8 = up to that
        # many chunks per sublane (mix one-hot dots); varied one at a time
        # against the default vrow_planes to keep the walk tractable
        space.add_parameter("mix_chunks", (0, 4, 8))
        space.add_constraint(("impl", "mix_chunks"),
                             lambda i, x: x == 0 or i == "colsort2")
        space.add_constraint(("vrow_planes", "mix_chunks"),
                             lambda v, x: x == 0 or v == 1)
        # routed rail: the virtual-chunk band per block (128/vrow_span
        # slots per virtual row); win_group stays auto-derived.  Varied
        # against vrow_planes == 1 only, like mix_chunks above.
        space.add_parameter("vrow_span", (0, 64, 128))
        space.add_constraint(("impl", "vrow_span"),
                             lambda i, v: (v > 0) == (i == "routed"))
        space.add_constraint(("vrow_planes", "vrow_span"),
                             lambda v, s: s == 0 or v == 1)
        space.add_constraint(("vrow_span", "hub_cap", "spmm_kb"),
                             lambda s, h, k: s in (0, 64)
                             or (h == 0 and k == 0))
        # routed tail sub-plan mix (pattern-dependent: measured
        # device-time on v5e, Economics tail best at mix2, Accelerator
        # at mix4); varied one-at-a-time like the other secondary axes
        space.add_parameter("tail_mix", (0, 2, 8))
        space.add_constraint(("impl", "tail_mix"),
                             lambda i, t: t == 0 or i == "routed")
        space.add_constraint(("tail_mix", "hub_cap", "spmm_kb", "pack8"),
                             lambda t, h, k, p8: t == 0
                             or (h == 0 and k == 0 and p8 == 0))
        # tail plan-shape overrides (tail_cw / tail_bs / tail_rsp) exist
        # as explicit config keys but are NOT walked: the round-5
        # per-block law (pallas_routed._TAIL_CANDIDATES) showed narrow
        # blocks/windows only multiply the per-block pass cost — the
        # model-guided auto-search plus the tail_mix axis cover the real
        # levers
        if search_bf16:
            # opt-in bf16 value storage on the HBM-bound DIA move only —
            # the scattered rails are XLU-bound (BASELINE.md), so halving
            # their value bytes buys nothing and would bloat the walk
            space.add_parameter("value_dtype", ("none", "bfloat16"))
            space.add_constraint(("impl", "value_dtype"),
                                 lambda i, v: v == "none"
                                 or i in ("via_dia", "rcm_dia"))
    elif fmt == "hyb":
        space.add_parameter("impl", ("default", "via_dia", "pallas", "binned"))
        space.add_parameter("dia_impl", ("none", "slices"))
        space.add_parameter("block_entries", (0, 2048))
        space.add_parameter("col_window", (0, 4096))
        space.add_parameter("row_window", (0, 512))
        space.add_constraint(("impl", "dia_impl"),
                             lambda i, d: (d == "none") == (i != "via_dia"))
        space.add_constraint(("impl", "block_entries"),
                             lambda i, b: (b > 0) == (i in ("pallas", "binned")))
        space.add_constraint(("impl", "col_window"),
                             lambda i, c: (c > 0) == (i in ("pallas", "binned")))
        space.add_constraint(("impl", "row_window"),
                             lambda i, r: (r > 0) == (i == "binned"))
    else:
        raise NotImplementedException(f"no tuning space for format {fmt!r}")
    return space


def build_spmv(A, config: Dict[str, Any]) -> Callable:
    impl = config.get("impl", _DEFAULTS[A.format]["impl"])
    try:
        builder = VARIANTS[A.format][impl]
    except KeyError:
        raise NotImplementedException(
            f"no variant {impl!r} for format {A.format!r}")
    return builder(A, config)

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

from cusp_autotuned_tpu import formats as F
from cusp_autotuned_tpu.autotune.space import TuningSpace, Parameter
from cusp_autotuned_tpu.utils.exceptions import NotImplementedException


# -- XLA-fused variants (reuse the generic jnp SpMV with knobs) ---------------

def _build_dia_slices(A, config):
    from cusp_autotuned_tpu.ops.multiply import spmv_dia

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


VARIANTS: Dict[str, Dict[str, Callable]] = {
    "dia": {
        "slices": _build_dia_slices,
        "gather": _build_dia_gather,
        "pallas": _build_pallas("dia"),
    },
    "ell": {
        "gather": _build_ell_gather,
        "pallas": _build_pallas("ell"),
    },
    "ellr": {
        "gather": _build_ell_gather,
        "pallas": _build_pallas("ellr"),
    },
    "csr": {
        "segsum": _build_csr_segsum,
        "pallas": _build_pallas("csr"),
    },
    "coo": {
        "segsum": _build_coo_segsum,
        "pallas": _build_pallas("coo"),
    },
    "hyb": {
        "default": _build_hyb,
    },
}

_DEFAULTS = {
    "dia": {"impl": "slices", "block_rows": 0},
    "ell": {"impl": "gather", "block_rows": 0, "row_bound": 0},
    "ellr": {"impl": "gather", "block_rows": 0, "row_bound": 1},
    "csr": {"impl": "segsum", "block_rows": 0},
    "coo": {"impl": "segsum", "block_nnz": 0},
    "hyb": {"impl": "default"},
}

_PALLAS_BLOCK_ROWS = (512, 1024, 2048, 4096)
_PALLAS_BLOCK_NNZ = (2048, 4096, 8192, 16384)


def default_config(A) -> Dict[str, Any]:
    return dict(_DEFAULTS[A.format])


def tuning_space(A) -> TuningSpace:
    """The constrained tuning space for a matrix's format.  Block-shape
    parameters only vary on the Pallas implementations (constraints pin them
    to 0 elsewhere — the same trick the fork's spaces use, e.g. PREFETCH_TYPE
    only when PREFETCH_FACTOR > 0, dia_multiply.h:44-55)."""
    fmt = A.format
    space = TuningSpace(parameters=[])
    if fmt == "dia":
        space.add_parameter("impl", ("slices", "gather", "pallas"))
        space.add_parameter("block_rows", (0,) + _PALLAS_BLOCK_ROWS)
        space.add_constraint(("impl", "block_rows"),
                             lambda i, b: (b > 0) == (i == "pallas"))
    elif fmt in ("ell", "ellr"):
        space.add_parameter("impl", ("gather", "pallas"))
        space.add_parameter("block_rows", (0,) + _PALLAS_BLOCK_ROWS)
        # row_bound: 0 = test the -1 sentinel (ELL BREAK analogue),
        #            1 = bound slot loop by row_lengths (ELLR semantics)
        space.add_parameter("row_bound", (0, 1) if fmt == "ellr" else (0,))
        space.add_constraint(("impl", "block_rows"),
                             lambda i, b: (b > 0) == (i == "pallas"))
        if fmt == "ellr":
            space.add_constraint(("impl", "row_bound"),
                                 lambda i, rb: i == "pallas" or rb == 1)
    elif fmt == "csr":
        space.add_parameter("impl", ("segsum", "pallas"))
        space.add_parameter("block_rows", (0,) + _PALLAS_BLOCK_ROWS)
        space.add_constraint(("impl", "block_rows"),
                             lambda i, b: (b > 0) == (i == "pallas"))
    elif fmt == "coo":
        space.add_parameter("impl", ("segsum", "pallas"))
        space.add_parameter("block_nnz", (0,) + _PALLAS_BLOCK_NNZ)
        space.add_constraint(("impl", "block_nnz"),
                             lambda i, b: (b > 0) == (i == "pallas"))
    elif fmt == "hyb":
        space.add_parameter("impl", ("default",))
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

"""Pallas TPU SpMV kernels — implemented in kernels/pallas/*.py; this module
is the registry-facing entry point."""

from __future__ import annotations

from cusp_autotuned_tpu.utils.exceptions import NotImplementedException

AVAILABLE = ("dia", "csr", "coo", "ell", "ellr", "hyb")


def _interpret() -> bool:
    """Pallas kernels compile with Mosaic on TPU and run interpreted on the
    CPU reference platform (tests); CUSP_TPU_INTERPRET=1 forces interpret
    mode everywhere (debugging)."""
    import jax
    from cusp_autotuned_tpu.utils.config import get_config
    return get_config().force_interpret or jax.default_backend() != "tpu"


def build(format_name, A, config):
    if format_name == "dia":
        from cusp_autotuned_tpu.kernels.pallas_dia import build_dia
        return build_dia(A, config, interpret=_interpret())
    if format_name in ("csr", "coo", "ell", "ellr", "hyb"):
        # the windowed one-hot kernel plans from the COO view of any format
        from cusp_autotuned_tpu.kernels.pallas_csr import build_csr_onehot
        return build_csr_onehot(A, config, interpret=_interpret())
    raise NotImplementedException(
        f"pallas kernel for {format_name} not yet available")


def build_binned(A, config):
    from cusp_autotuned_tpu.kernels.pallas_binned import build_binned as bb
    return bb(A, config, interpret=_interpret())


def build_colsort(A, config):
    from cusp_autotuned_tpu.kernels.pallas_colsort import build_colsort as bc
    return bc(A, config, interpret=_interpret())


def build_colsort2(A, config):
    from cusp_autotuned_tpu.kernels.pallas_colsort2 import (
        build_colsort2 as bc2,
    )
    return bc2(A, config, interpret=_interpret())


def build_routed(A, config):
    from cusp_autotuned_tpu.kernels.pallas_routed import (
        build_routed as br,
    )
    return br(A, config, interpret=_interpret())

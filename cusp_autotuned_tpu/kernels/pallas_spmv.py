"""Pallas TPU SpMV kernels — implemented in kernels/pallas/*.py; this module
is the registry-facing entry point."""

from __future__ import annotations

from cusp_autotuned_tpu.utils.exceptions import NotImplementedException

AVAILABLE = False


def build(format_name, A, config):
    raise NotImplementedException(
        f"pallas kernel for {format_name} not yet available")

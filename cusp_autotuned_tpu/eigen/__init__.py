"""Eigensolvers (parity: cusp/eigen/ — lanczos + lanczos_options, lobpcg,
arnoldi, spectral-radius estimators, gram_schmidt)."""

from cusp_autotuned_tpu.eigen.spectral_radius import (
    disks_spectral_radius, estimate_spectral_radius, ritz_spectral_radius,
)
from cusp_autotuned_tpu.eigen.lanczos import lanczos, LanczosOptions
from cusp_autotuned_tpu.eigen.arnoldi import arnoldi
from cusp_autotuned_tpu.eigen.lobpcg import lobpcg
from cusp_autotuned_tpu.eigen.gram_schmidt import gram_schmidt

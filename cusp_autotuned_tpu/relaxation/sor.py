"""SOR relaxation (parity: cusp/relaxation/sor.h:98-165 — successive
over-relaxation via weighted Gauss-Seidel sweeps)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from cusp_autotuned_tpu.formats.base import MatrixBase, register_matrix, static_field
from cusp_autotuned_tpu.relaxation.gauss_seidel import GaussSeidel, gauss_seidel, FORWARD


@register_matrix
@dataclasses.dataclass(frozen=True)
class SOR(MatrixBase):
    gs: GaussSeidel
    default_omega: jnp.ndarray
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "sor_relaxation"

    def __call__(self, A, b, x, omega=None, direction=None):
        omega = self.default_omega if omega is None else omega
        x_gs = self.gs(A, b, x, direction)
        return (1 - omega) * x + omega * x_gs


def sor(A, omega: float = 1.0, default_direction: str = FORWARD,
        seed: int = 0) -> SOR:
    gs = gauss_seidel(A, default_direction, seed)
    return SOR(gs=gs, default_omega=jnp.asarray(omega, gs.diag_inv.dtype),
               shape=A.shape)

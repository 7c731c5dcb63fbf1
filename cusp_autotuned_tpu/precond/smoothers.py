"""Smoother adapters: the presmooth/postsmooth interface the multilevel
V-cycle consumes (parity: cusp/precond/smoother/{jacobi,gauss_seidel,sor,
polynomial}_smoother.h; default selection in cusp/detail/multilevel.h:56-58).

presmooth exploits x0 = 0 (no SpMV needed for the first application);
postsmooth is a full relaxation step."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from cusp_autotuned_tpu.formats.base import MatrixBase, register_matrix, static_field
from cusp_autotuned_tpu.ops.multiply import multiply
from cusp_autotuned_tpu.relaxation.jacobi import Jacobi, jacobi
from cusp_autotuned_tpu.relaxation.gauss_seidel import (
    GaussSeidel, gauss_seidel, FORWARD, BACKWARD,
)
from cusp_autotuned_tpu.relaxation.sor import SOR, sor
from cusp_autotuned_tpu.relaxation.polynomial import Polynomial, polynomial


@register_matrix
@dataclasses.dataclass(frozen=True)
class JacobiSmoother(MatrixBase):
    relax: Jacobi
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "jacobi_smoother"

    def presmooth(self, A, b):
        # x0 = 0: x = omega * D^-1 b
        return self.relax.default_omega * self.relax.diag_inv * b

    def postsmooth(self, A, b, x):
        return self.relax(A, b, x)


@register_matrix
@dataclasses.dataclass(frozen=True)
class GaussSeidelSmoother(MatrixBase):
    relax: GaussSeidel
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "gauss_seidel_smoother"

    def presmooth(self, A, b):
        return self.relax(A, b, jnp.zeros_like(b), FORWARD)

    def postsmooth(self, A, b, x):
        return self.relax(A, b, x, BACKWARD)


@register_matrix
@dataclasses.dataclass(frozen=True)
class SORSmoother(MatrixBase):
    relax: SOR
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "sor_smoother"

    def presmooth(self, A, b):
        return self.relax(A, b, jnp.zeros_like(b))

    def postsmooth(self, A, b, x):
        return self.relax(A, b, x)


@register_matrix
@dataclasses.dataclass(frozen=True)
class PolynomialSmoother(MatrixBase):
    relax: Polynomial
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "polynomial_smoother"

    def presmooth(self, A, b):
        return self.relax(A, b, jnp.zeros_like(b))

    def postsmooth(self, A, b, x):
        return self.relax(A, b, x)


def jacobi_smoother(A, rho_DinvA: float | None = None) -> JacobiSmoother:
    """Weighted Jacobi with the SA-default omega = (4/3)/rho(D^-1 A)."""
    if rho_DinvA is None:
        from cusp_autotuned_tpu.precond.aggregation.strength import rho_Dinv_A
        rho_DinvA = rho_Dinv_A(A)
    omega = (4.0 / 3.0) / max(rho_DinvA, 1e-30)
    return JacobiSmoother(relax=jacobi(A, omega=omega), shape=A.shape)


def gauss_seidel_smoother(A) -> GaussSeidelSmoother:
    return GaussSeidelSmoother(relax=gauss_seidel(A), shape=A.shape)


def sor_smoother(A, omega: float = 1.0) -> SORSmoother:
    return SORSmoother(relax=sor(A, omega), shape=A.shape)


def polynomial_smoother(A) -> PolynomialSmoother:
    return PolynomialSmoother(relax=polynomial(A), shape=A.shape)

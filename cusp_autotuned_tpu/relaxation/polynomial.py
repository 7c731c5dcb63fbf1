"""Chebyshev polynomial relaxation.

Parity: cusp::relaxation::polynomial (cusp/relaxation/polynomial.h:101-178 +
detail/polynomial.inl) — degree-3 monic polynomial with Chebyshev roots
scaled to [rho/30, 1.1 rho], coefficients normalized so C(0) = 1, rho from an
8-step Ritz estimate; apply is the same Horner-in-A recurrence."""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cusp_autotuned_tpu.formats.base import MatrixBase, register_matrix, static_field
from cusp_autotuned_tpu.ops.multiply import multiply


def chebyshev_polynomial_coefficients(rho: float, lower_bound: float = 1.0 / 30.0,
                                      upper_bound: float = 1.1) -> np.ndarray:
    """Monic cubic with Chebyshev roots on [lower*rho, upper*rho], scaled so
    the constant term is 1 (reference: detail/polynomial.inl:40-75)."""
    degree = 3
    x0, x1 = lower_bound * rho, upper_bound * rho
    roots = [math.cos(math.pi * (i + 0.5) / degree) for i in range(degree)]
    roots = [0.5 * (x1 - x0) * (1 + r) + x0 for r in roots]
    a, b, c = roots
    coefficients = np.array([1.0, -(a + b + c), a * b + b * c + c * a,
                             -(a * b * c)])
    return coefficients / coefficients[-1]


@register_matrix
@dataclasses.dataclass(frozen=True)
class Polynomial(MatrixBase):
    coefficients: jnp.ndarray          # residual-polynomial coefficients
    shape: Tuple[int, int] = static_field(default=(0, 0))

    format = "polynomial_relaxation"

    def __call__(self, A, b, x, coefficients=None):
        cf = self.coefficients if coefficients is None else jnp.asarray(coefficients)
        r = b - multiply(A, x)
        h = cf[0] * r
        for i in range(1, cf.shape[0]):
            h = multiply(A, h) + cf[i] * r
        return x + h


def polynomial(A, coefficients=None, rho: float | None = None) -> Polynomial:
    if coefficients is None:
        if rho is None:
            from cusp_autotuned_tpu.eigen.spectral_radius import ritz_spectral_radius
            rho = ritz_spectral_radius(A, 8, symmetric=True)
        cf = chebyshev_polynomial_coefficients(float(rho))
        cf = -cf[:-1]                       # reference drops C(0), negates
    else:
        cf = -np.asarray(coefficients, dtype=np.float64)[:-1]
    dtype = jnp.float32 if "32" in str(A.dtype) else jnp.float64
    return Polynomial(coefficients=jnp.asarray(cf, dtype), shape=A.shape)

"""Relaxation methods (parity: cusp/relaxation/ — jacobi, multicolor
gauss_seidel, sor, chebyshev polynomial).  All are pytree linear operators:
setup extracts the static structure (diagonal, coloring, coefficients) once;
the sweeps are traceable and fuse into jitted solver loops."""

from cusp_autotuned_tpu.relaxation.jacobi import Jacobi, jacobi
from cusp_autotuned_tpu.relaxation.gauss_seidel import (
    GaussSeidel, gauss_seidel, FORWARD, BACKWARD, SYMMETRIC,
)
from cusp_autotuned_tpu.relaxation.sor import SOR, sor
from cusp_autotuned_tpu.relaxation.polynomial import Polynomial, polynomial

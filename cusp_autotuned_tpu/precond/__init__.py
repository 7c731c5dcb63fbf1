"""Preconditioners (parity: cusp/precond/ — diagonal, AINV family,
smoothed-aggregation AMG) and smoother adapters."""

from cusp_autotuned_tpu.precond.diagonal import DiagonalPreconditioner, diagonal
from cusp_autotuned_tpu.precond.ainv import (
    bridson_ainv, scaled_bridson_ainv, nonsym_bridson_ainv,
)
from cusp_autotuned_tpu.precond.smoothers import (
    JacobiSmoother, GaussSeidelSmoother, SORSmoother, PolynomialSmoother,
)
from cusp_autotuned_tpu.precond.multilevel import Multilevel
from cusp_autotuned_tpu.precond.aggregation import smoothed_aggregation

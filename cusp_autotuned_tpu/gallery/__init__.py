"""Matrix gallery (parity: cusp/gallery/ + the fork's KTT generators)."""

from cusp_autotuned_tpu.gallery.poisson import (
    poisson5pt, poisson9pt, poisson7pt, poisson27pt,
)
from cusp_autotuned_tpu.gallery.grid import grid2d, grid3d
from cusp_autotuned_tpu.gallery.diffusion import diffusion, FE, FD
from cusp_autotuned_tpu.gallery.random import random
from cusp_autotuned_tpu.gallery.stencil import generate_matrix_from_stencil
from cusp_autotuned_tpu.gallery.generators import (
    make_diagonal_matrix, make_diagonal_symmetric_matrix,
)

"""Sparse/dense containers (parity: cusp/{coo,csr,dia,ell,hyb,permutation}_matrix.h
plus the fork's cusp/ktt/ellr_matrix.h).  Dense vectors are jnp arrays
(array1d/array1d_view exist as parity constructors); pitched dense matrices
with row/column orientation and views live in formats/dense.py (Array2d)."""

from cusp_autotuned_tpu.formats.base import MatrixBase
from cusp_autotuned_tpu.formats.dense import (
    Array2d, array2d, make_array2d_view, array1d, array1d_view,
)
from cusp_autotuned_tpu.formats.coo import COO, coo_matrix, coo_from_scipy
from cusp_autotuned_tpu.formats.csr import CSR, csr_matrix, csr_from_scipy
from cusp_autotuned_tpu.formats.dia import DIA, dia_matrix
from cusp_autotuned_tpu.formats.ell import ELL, ELLR, ell_matrix, ellr_matrix, INVALID_INDEX
from cusp_autotuned_tpu.formats.hyb import HYB, hyb_matrix
from cusp_autotuned_tpu.formats.permutation import PermutationMatrix, permutation_matrix

SPARSE_FORMATS = ("coo", "csr", "dia", "ell", "ellr", "hyb")

_FORMAT_CLASSES = {
    "coo": COO, "csr": CSR, "dia": DIA, "ell": ELL, "ellr": ELLR,
    "hyb": HYB, "permutation": PermutationMatrix,
}


def format_class(name: str):
    try:
        return _FORMAT_CLASSES[name]
    except KeyError:
        raise ValueError(f"unknown format {name!r}; known: {sorted(_FORMAT_CLASSES)}")


def is_sparse(a) -> bool:
    return isinstance(a, MatrixBase) and getattr(a, "format", None) in SPARSE_FORMATS


def is_coo(a) -> bool:
    return isinstance(a, COO)


def is_csr(a) -> bool:
    return isinstance(a, CSR)


def is_dia(a) -> bool:
    return isinstance(a, DIA)


def is_ell(a) -> bool:
    return isinstance(a, ELL)


def is_ellr(a) -> bool:
    return isinstance(a, ELLR)


def is_hyb(a) -> bool:
    return isinstance(a, HYB)


def is_permutation(a) -> bool:
    return isinstance(a, PermutationMatrix)

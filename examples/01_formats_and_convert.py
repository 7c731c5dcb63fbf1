"""Matrix formats and conversion (reference: examples/MatrixFormats,
examples/MatrixAssembly)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cusp_autotuned_tpu as ct
from cusp_autotuned_tpu.formats import coo_matrix
from cusp_autotuned_tpu.ops.printing import print_matrix, spy


def main():
    # assemble a small matrix from triplets (duplicates are kept distinct
    # until converted)
    A = coo_matrix(row=[0, 0, 1, 2, 2, 3],
                   col=[0, 2, 1, 0, 3, 3],
                   val=[1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                   shape=(4, 4))
    print_matrix(A)

    # all-pairs conversion; COO is the hub format
    for fmt in ("csr", "dia", "ell", "ellr", "hyb"):
        B = ct.convert(A, fmt)
        print(f"{fmt}: {B.num_entries} entries, dtype {B.dtype}")

    # sparsity pattern in the terminal
    spy(A)


if __name__ == "__main__":
    main()

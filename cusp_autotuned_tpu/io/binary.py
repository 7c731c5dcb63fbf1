"""Raw binary matrix serialization (parity: cusp/io/binary.h:68-139 —
read/write_binary_file|stream).  The on-disk format is a NumPy .npz archive
holding the container's arrays plus format/shape metadata — endianness- and
version-safe, unlike a hand-rolled struct layout."""

from __future__ import annotations

import numpy as np

from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy
import scipy.sparse as sp


def write_binary_file(A, path) -> None:
    S = to_scipy(A).tocoo()
    np.savez_compressed(path, fmt=np.bytes_(A.format.encode()),
                        shape=np.asarray(S.shape, np.int64),
                        row=S.row.astype(np.int32),
                        col=S.col.astype(np.int32),
                        val=S.data)


def read_binary_file(path, format: str | None = None, dtype=None):
    with np.load(path, allow_pickle=False) as z:
        fmt = bytes(z["fmt"]).decode() if format is None else format
        shape = tuple(int(s) for s in z["shape"])
        S = sp.coo_matrix((z["val"], (z["row"], z["col"])), shape=shape)
    return from_scipy(S, fmt, dtype=dtype)


write_binary_stream = write_binary_file
read_binary_stream = read_binary_file

"""Raw binary matrix serialization (parity: cusp/io/binary.h:68-139 —
read/write_binary_file|stream).

Two formats:
  - the native on-disk format is a NumPy .npz archive holding the
    container's arrays plus format/shape metadata — endianness- and
    version-safe, unlike a hand-rolled struct layout;
  - `read_cusp_binary_file` / `write_cusp_binary_file` speak the
    reference's byte layout (cusp/io/detail/binary.inl:42-104: three
    size_t counts, then the COO row indices, column indices, and values as
    raw little-endian arrays) for interop with files written by the C++
    library.
"""

from __future__ import annotations

import io as _io

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


def write_binary_stream(A, stream) -> None:
    write_binary_file(A, stream)


def read_binary_stream(stream, format: str | None = None, dtype=None):
    return read_binary_file(stream, format=format, dtype=dtype)


# -- cusp wire-format interop ---------------------------------------------------

def read_cusp_binary_stream(stream, format: str = "coo",
                            index_dtype=np.int32, value_dtype=np.float32,
                            dtype=None):
    """Read a matrix in the reference's raw binary layout
    (cusp/io/detail/binary.inl:42-78): three size_t (num_rows, num_cols,
    num_entries) followed by the row indices, column indices, and values.
    index_dtype/value_dtype must match the template types the file was
    written with (IndexType/ValueType; int/float by default)."""
    header = np.frombuffer(stream.read(3 * 8), dtype=np.uint64)
    if header.size != 3:
        raise ValueError("truncated cusp binary header")
    m, n, nnz = (int(v) for v in header)
    idt = np.dtype(index_dtype)
    vdt = np.dtype(value_dtype)
    row = np.frombuffer(stream.read(nnz * idt.itemsize), dtype=idt)
    col = np.frombuffer(stream.read(nnz * idt.itemsize), dtype=idt)
    val = np.frombuffer(stream.read(nnz * vdt.itemsize), dtype=vdt)
    if row.size != nnz or col.size != nnz or val.size != nnz:
        raise ValueError("truncated cusp binary payload")
    S = sp.coo_matrix((val, (row, col)), shape=(m, n))
    return from_scipy(S, format, dtype=dtype)


def read_cusp_binary_file(path, format: str = "coo", index_dtype=np.int32,
                          value_dtype=np.float32, dtype=None):
    with open(path, "rb") as f:
        return read_cusp_binary_stream(f, format=format,
                                       index_dtype=index_dtype,
                                       value_dtype=value_dtype, dtype=dtype)


def write_cusp_binary_stream(A, stream, index_dtype=np.int32,
                             value_dtype=np.float32) -> None:
    """Write the reference's raw binary layout
    (cusp/io/detail/binary.inl:95-104)."""
    S = to_scipy(A).tocoo()
    stream.write(np.asarray([S.shape[0], S.shape[1], S.nnz],
                            np.uint64).tobytes())
    stream.write(S.row.astype(index_dtype).tobytes())
    stream.write(S.col.astype(index_dtype).tobytes())
    stream.write(S.data.astype(value_dtype).tobytes())


def write_cusp_binary_file(A, path, index_dtype=np.int32,
                           value_dtype=np.float32) -> None:
    with open(path, "wb") as f:
        write_cusp_binary_stream(A, f, index_dtype=index_dtype,
                                 value_dtype=value_dtype)

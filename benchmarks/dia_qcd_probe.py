"""On-chip probe: why does the QCD stand-in's via_dia SpMV read ~0.5 of
stream (BASELINE Williams table) while the poisson5pt headline reads 0.94?

Same probe modes as dia_probe.py but on the suite's QCD stand-in (4-D
periodic lattice, ~27 diagonals with large mixed offsets — many lane
rolls), sweeping block_rows and bf16 storage.  If `noroll` closes the gap
the kernel is VPU-roll-bound on many-diagonal operators; if bf16 halves
the time it is bandwidth-bound (then the gap is the useful-vs-stored byte
model, not the kernel).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cusp_autotuned_tpu.gallery.suite import _qcd_stencil      # noqa: E402
from cusp_autotuned_tpu.backend.reference import from_scipy    # noqa: E402
from cusp_autotuned_tpu.ops.convert import convert             # noqa: E402
from cusp_autotuned_tpu.kernels.pallas_dia import build_dia    # noqa: E402
from benchmarks.dia_probe import build_probe                   # noqa: E402
from benchmarks.harness import time_fn_marginal                # noqa: E402


def main():
    S = _qcd_stencil(L=10, dof=12, seed=6)          # suite row at scale 1.0
    A = convert(from_scipy(S.tocoo().astype(np.float32), "csr"), "dia")
    nd = A.num_diagonals
    stored = (nd * A.rows_padded + 2 * A.num_rows) * 4
    useful = (S.nnz * 8 + A.num_rows * 8)
    rolls = sum(1 for o in np.asarray(A.offsets) if int(o) % 128)
    print(f"rows {A.num_rows}  nnz {S.nnz}  diagonals {nd} "
          f"({rolls} need lane rolls)  stored {stored/1e6:.1f} MB  "
          f"useful(nnz*8) {useful/1e6:.1f} MB  fill {S.nnz/(nd*A.num_rows):.2f}")
    x = jnp.asarray(np.random.RandomState(0).randn(A.num_cols)
                    .astype(np.float32))

    for mode in ("full", "noroll", "noshift"):
        for br in (4096, 8192, 16384, 32768):
            try:
                f = jax.jit(build_probe(A, br, mode))
                t, _ = time_fn_marginal(f, x)
                print(f"{mode:8s} br={br:5d}  {t*1e6:8.1f} us  "
                      f"{stored/t/1e9:7.1f} GB/s stored  "
                      f"{useful/t/1e9:7.1f} useful")
            except Exception as e:  # noqa: BLE001
                print(f"{mode:8s} br={br:5d}  SKIP {str(e)[:60]}")

    for cfg in ({}, {"block_rows": 8192},
                {"value_dtype": "bfloat16"}):
        f = jax.jit(build_dia(A, cfg))
        t, _ = time_fn_marginal(f, x)
        print(f"shipped {str(cfg):40s} {t*1e6:8.1f} us  "
              f"{stored/t/1e9:7.1f} GB/s stored-f32-equiv")


if __name__ == "__main__":
    main()

"""On-chip probe: what binds the DIA SpMM (k >= 65) Pallas rail?

Variants (perf probes; all numerically checked against the oracle):
  shipped     the production kernel (xa/xb concat per grid step)
  noconcat    per-diagonal two-slice select instead of one concat
  budget=N    VMEM-budget multiplier sweep (larger block_rows)
  xla         the fused-slice XLA path (spmv_dia on 2-D x)
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from cusp_autotuned_tpu import gallery                        # noqa: E402
from cusp_autotuned_tpu.kernels.pallas_dia import build_dia   # noqa: E402
from cusp_autotuned_tpu.ops.multiply import spmv_dia          # noqa: E402
from cusp_autotuned_tpu.utils.padding import LANE, round_up   # noqa: E402
from cusp_autotuned_tpu.backend.reference import to_scipy     # noqa: E402
from benchmarks.harness import time_fn_marginal               # noqa: E402


def _kernel(data_ref, xa_ref, xb_ref, y_ref, *, offsets, left, block_rows,
            mode):
    if mode == "shipped":
        xcat = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=0)
    acc = None
    for d, off in enumerate(offsets):
        t = off + left
        if mode == "shipped":
            seg = xcat[t: t + block_rows, :]
        else:  # noconcat: static split across the two refs
            if t == 0:
                seg = xa_ref[...]
            elif t >= block_rows:
                seg = xb_ref[t - block_rows: t, :]  # placeholder, unused
            else:
                seg = jnp.concatenate(
                    [xa_ref[t:, :], xb_ref[:t, :]], axis=0)
        term = data_ref[d][:, None] * seg
        acc = term if acc is None else acc + term
    y_ref[...] = acc


def build_probe(A, k, budget_mult=1.0, mode="shipped"):
    m, n = A.shape
    offsets = A.offsets
    ndiag = len(offsets)
    left = -min(0, min(offsets))
    kp = round_up(k, LANE)
    br = 32768
    while br > 8 * LANE and br * kp * 4 * 9 > budget_mult * 12 * 1024 * 1024:
        br //= 2
    mp = round_up(A.rows_padded, br)
    grid = mp // br
    data = A.data
    if data.shape[1] != mp:
        data = jnp.pad(data, ((0, 0), (0, mp - data.shape[1])))
    x_rows_total = (grid + 2) * br
    kernel = functools.partial(_kernel, offsets=offsets, left=left,
                               block_rows=br, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ndiag, br), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, kp), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * mp * k,
            bytes_accessed=(ndiag * mp + (mp + m) * kp) * 4,
            transcendentals=0),
        interpret=False,
    )

    def fn(x):
        x2 = jnp.pad(x, ((left, x_rows_total - left - n), (0, kp - k)))
        return call(data, x2, x2)[:m, :k]
    return fn, br


def main():
    k = 128
    A = gallery.poisson5pt(300, 300, format="dia", dtype=np.float32)
    m, n = A.shape
    S = to_scipy(A)
    X = np.random.RandomState(2).randn(n, k).astype(np.float32)
    ref = S @ X
    Xj = jnp.asarray(X)
    flops = 2 * S.nnz * k
    traffic = (len(A.offsets) * A.rows_padded + 2 * m * k) * 4
    print(f"flops {flops/1e6:.0f} MF   min traffic {traffic/1e6:.0f} MB "
          f"(x read once)")

    def run(label, fn):
        f = jax.jit(fn)
        y = np.asarray(jax.block_until_ready(f(Xj)))
        err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        tm, _ = time_fn_marginal(f, Xj)
        print(f"{label:28s} {tm*1e6:9.1f} us  {flops/tm/1e9:7.1f} GF/s  "
              f"eff {traffic/tm/1e9:6.1f} GB/s  err {err:.1e}")

    run("xla fused slices", lambda x: spmv_dia(A, x))
    run("shipped build_dia", build_dia(A, {}))
    for mode in ("shipped", "noconcat"):
        for bm in (1.0, 2.0, 4.0):
            fn, br = build_probe(A, k, budget_mult=bm, mode=mode)
            run(f"probe {mode} bm={bm} br={br}", fn)


if __name__ == "__main__":
    main()

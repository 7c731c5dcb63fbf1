"""On-chip probe: what binds the DIA SpMV kernel?

Variants (some numerically WRONG on purpose — perf probes only):
  full      the shipped kernel
  noroll    q-only shifts (drops the lane rolls)        -> VPU roll cost
  noshift   no shifts at all (pure planes*x sum)        -> memory floor
  br=N      block_rows sweep
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
from cusp_autotuned_tpu import gallery                      # noqa: E402
from cusp_autotuned_tpu.kernels.pallas_dia import build_dia  # noqa: E402
from cusp_autotuned_tpu.utils.padding import LANE, round_up  # noqa: E402
from benchmarks.harness import time_fn_marginal              # noqa: E402


def probe_kernel(x_ref, data_ref, y_ref, *, offsets, left, sub_block, mode):
    base = pl.program_id(0) * sub_block
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub_block, LANE), 1)
    acc = None
    for d, off in enumerate(offsets):
        t = off + left
        q, r = divmod(t, LANE)
        if mode == "noshift":
            shifted = x_ref[pl.ds(base, sub_block), :]
        elif r == 0 or mode == "noroll":
            shifted = x_ref[pl.ds(base + q, sub_block), :]
        elif mode == "oneroll":
            xx = x_ref[pl.ds(base + q, sub_block + 1), :]
            rolled = pltpu.roll(xx, LANE - r, 1)
            shifted = jnp.where(lane < LANE - r, rolled[:sub_block],
                                rolled[1:])
        else:
            a = x_ref[pl.ds(base + q, sub_block), :]
            b = x_ref[pl.ds(base + q + 1, sub_block), :]
            ra = pltpu.roll(a, LANE - r, 1)
            rb = pltpu.roll(b, LANE - r, 1)
            shifted = jnp.where(lane < LANE - r, ra, rb)
        term = data_ref[d] * shifted
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def build_probe(A, block_rows, mode):
    m, n = A.shape
    offsets = A.offsets
    k = len(offsets)
    left = -min(0, min(offsets))
    mp = round_up(A.rows_padded, block_rows)
    rows_sub = mp // LANE
    sub_block = block_rows // LANE
    max_q = (max(offsets) + left) // LANE + 2
    x_rows = rows_sub + max_q + (left // LANE) + 2
    grid = mp // block_rows
    data = A.data
    if data.shape[1] != mp:
        data = jnp.pad(data, ((0, 0), (0, mp - data.shape[1])))
    data3 = data.reshape(k, rows_sub, LANE)
    kernel = functools.partial(probe_kernel, offsets=offsets, left=left,
                               sub_block=sub_block, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, sub_block, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub_block, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_sub, LANE), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * mp,
            bytes_accessed=k * mp * 4 + (x_rows * LANE + mp) * 4,
            transcendentals=0),
        interpret=False,
    )
    x_len = x_rows * LANE

    def fn(x):
        x2 = jnp.pad(x, (left, x_len - left - n)).reshape(x_rows, LANE)
        return call(x2, data3).reshape(mp)[:m]
    return fn


def main():
    A = gallery.poisson5pt(1000, 1000, format="dia", dtype=np.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(A.num_cols)
                    .astype(np.float32))
    useful = (len(A.offsets) * A.rows_padded + 2 * A.num_rows) * 4
    print(f"useful bytes: {useful/1e6:.1f} MB   offsets: {list(A.offsets)}")

    for mode in ("full", "oneroll", "noroll"):
        for br in (4096, 8192, 16384, 32768):
            f = jax.jit(build_probe(A, br, mode))
            t, _ = time_fn_marginal(f, x)
            print(f"{mode:8s} br={br:5d}  {t*1e6:8.1f} us  "
                  f"{useful/t/1e9:7.1f} GB/s useful")

    # shipped builder for cross-check + bf16
    for cfg in ({"block_rows": 4096},
                {"block_rows": 4096, "value_dtype": "bfloat16"}):
        f = jax.jit(build_dia(A, cfg))
        t, _ = time_fn_marginal(f, x)
        print(f"shipped {str(cfg):50s} {t*1e6:8.1f} us  "
              f"{useful/t/1e9:7.1f} GB/s f32-equiv")


if __name__ == "__main__":
    main()

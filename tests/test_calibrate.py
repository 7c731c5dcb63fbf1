"""Device-model calibration (autotune.calibrate) — VERDICT r3 item 7.

The analytic cost model's constants must come from a measurement on the
CURRENT device when one exists, with the one-session literals demoted to
fallback.  On the CPU test backend the measured values are meaningless as
TPU constants, but the machinery — measure, persist keyed by device kind,
load, auto-apply — is fully checkable."""

import json
import os

import numpy as np
import pytest

from cusp_autotuned_tpu.autotune import calibrate, cost_model


def test_calibrate_measures_and_persists(tmp_path, monkeypatch):
    path = str(tmp_path / "device_model.json")
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", path)
    consts = calibrate.calibrate(persist=True, apply=False, guard=False)
    assert set(consts) >= {"stream_gbps", "tile_take_ns", "gather_ns",
                           "segsum_ns"}
    assert all(np.isfinite(v) and v > 0 for v in consts.values())
    with open(path) as f:
        blob = json.load(f)
    assert blob["constants"]["stream_gbps"] == consts["stream_gbps"]
    assert blob["device_kind"]  # keyed by the measuring device

    loaded = calibrate.load(path)
    assert loaded == pytest.approx(consts)


def test_load_rejects_other_device_kind(tmp_path):
    path = str(tmp_path / "device_model.json")
    with open(path, "w") as f:
        json.dump({"device_kind": "TPU v9000",
                   "constants": {"stream_gbps": 1.0}}, f)
    assert calibrate.load(path) is None


def test_cost_model_auto_loads_calibration(tmp_path, monkeypatch):
    """predict() picks up persisted constants on first use; literals
    remain only the fallback."""
    from cusp_autotuned_tpu.gallery import poisson5pt

    path = str(tmp_path / "device_model.json")
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", path)
    import jax
    kind = jax.devices()[0].device_kind
    sentinel = 123.25
    with open(path, "w") as f:
        json.dump({"device_kind": kind,
                   "constants": {"stream_gbps": sentinel,
                                 "not_a_model_key": 1.0}}, f)

    saved = dict(cost_model.DEVICE_MODEL)
    saved_flag = cost_model._calibration_checked
    try:
        cost_model._calibration_checked = False
        cost_model.predict(poisson5pt(16, 16, format="csr",
                                      dtype=np.float32))
        assert cost_model.DEVICE_MODEL["stream_gbps"] == sentinel
        assert "not_a_model_key" not in cost_model.DEVICE_MODEL
    finally:
        cost_model.DEVICE_MODEL.clear()
        cost_model.DEVICE_MODEL.update(saved)
        cost_model._calibration_checked = saved_flag
        cost_model._SLOT_NS.clear()


def test_default_path_prefers_env(monkeypatch):
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", "/tmp/x.json")
    assert calibrate.default_path() == "/tmp/x.json"
    monkeypatch.delenv("CUSP_TPU_CALIBRATION")
    monkeypatch.setenv("CUSP_TPU_TUNING_CACHE", "/tmp/cachedir/tuning.json")
    p = calibrate.default_path("TPU v5e")
    assert p.startswith("/tmp/cachedir/") and "TPU_v5e" in p


def test_calibrate_persists_to_bare_filename(tmp_path, monkeypatch):
    """CUSP_TPU_CALIBRATION set to a bare filename writes to the CWD
    instead of crashing in os.makedirs('') (review finding)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", "model.json")
    calibrate.calibrate(persist=True, apply=False, guard=False)
    assert (tmp_path / "model.json").exists()


def test_take_probe_takes_are_independent():
    """Pin the calibration kernel's pattern (VERDICT r4 weak #1): every
    pass must read the ORIGINAL x block through its own index plane — the
    VMEM-sourced pattern real scattered kernels track at ~136 ns/pass —
    not a dependent `acc = take(acc, ix)` chain (which composes the
    permutations, measures ~68 ns on v5e, and would silently halve every
    scattered-class price if applied)."""
    import jax.numpy as jnp

    G, passes = 2, 3
    rng = np.random.RandomState(0)
    idx = jnp.asarray(calibrate._take_probe_planes(rng))
    x = rng.randn(G * calibrate.LANE, calibrate.LANE).astype(np.float32)
    out = np.asarray(calibrate._take_probe_build(passes, idx, G)(
        jnp.asarray(x)))

    idx_np = np.asarray(idx)
    L = calibrate.LANE
    expect = np.zeros_like(x)
    chained = x.copy()
    chain_acc = np.zeros_like(x)
    for p in range(passes):
        planes = np.tile(idx_np[p * L:(p + 1) * L, :], (G, 1))
        g = np.take_along_axis(x, planes, axis=1) * (1.0 + 0.001 * p)
        expect = np.where(planes % 2 == p % 2, g + expect, expect)
        chained = np.take_along_axis(chained, planes, axis=1)
        chain_acc += chained * (1.0 + 0.001 * p)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    assert not np.allclose(out, chain_acc)   # the buggy pattern differs


def test_calibrate_guard_rejects_bad_constants(tmp_path, monkeypatch):
    """Constants that break model-vs-archive agreement are discarded:
    DEVICE_MODEL untouched, nothing persisted, 'rejected' flagged."""
    path = str(tmp_path / "device_model.json")
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", path)
    monkeypatch.setattr(calibrate, "_model_check_guard",
                        lambda consts: dict(agree=5, total=14, rows=[]))
    saved = dict(cost_model.DEVICE_MODEL)
    with pytest.warns(UserWarning, match="rejected"):
        consts = calibrate.calibrate(persist=True, apply=True)
    assert consts["rejected"] and consts["model_agree"] == 5
    assert cost_model.DEVICE_MODEL == saved
    assert not os.path.exists(path)


def test_calibrate_guard_accepts_good_constants(tmp_path, monkeypatch):
    path = str(tmp_path / "device_model.json")
    monkeypatch.setenv("CUSP_TPU_CALIBRATION", path)
    monkeypatch.setattr(calibrate, "_model_check_guard",
                        lambda consts: dict(agree=14, total=14, rows=[]))
    saved = dict(cost_model.DEVICE_MODEL)
    try:
        consts = calibrate.calibrate(persist=True, apply=True)
        assert "rejected" not in consts
        assert os.path.exists(path)
        assert (cost_model.DEVICE_MODEL["tile_take_ns"]
                == consts["tile_take_ns"])
        # non-model keys (agreement bookkeeping) must not leak in
        assert "model_agree" not in cost_model.DEVICE_MODEL
    finally:
        cost_model.DEVICE_MODEL.clear()
        cost_model.DEVICE_MODEL.update(saved)
        cost_model._SLOT_NS.clear()


def test_model_check_guard_restores_device_model():
    """The guard must evaluate WITH the candidate constants applied and
    restore the prior model afterwards regardless of outcome."""
    seen = {}

    saved = dict(cost_model.DEVICE_MODEL)
    import benchmarks.model_check as mc

    def spy_check():
        seen["tile_take_ns"] = cost_model.DEVICE_MODEL["tile_take_ns"]
        return dict(agree=14, total=14, rows=[])

    orig = mc.check
    mc.check = spy_check
    try:
        out = calibrate._model_check_guard(dict(tile_take_ns=999.0))
        assert out["agree"] == 14
        assert seen["tile_take_ns"] == 999.0
        assert cost_model.DEVICE_MODEL == saved
    finally:
        mc.check = orig

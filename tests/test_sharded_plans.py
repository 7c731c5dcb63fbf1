"""Shard-partitionable planned operators (VERDICT r3 item 4): the tuned
via_dia rail banded over an 8-device mesh — each device holds ONLY its row
band's plan arrays — and distribute_multilevel using it for the AMG
hierarchy's tuned path instead of replicating.

No reference analog (the reference is single-GPU, SURVEY §2.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cusp_autotuned_tpu.gallery import poisson5pt, poisson9pt
from cusp_autotuned_tpu.ops.convert import convert
from cusp_autotuned_tpu.parallel.sharded import (
    make_row_mesh, distribute_multilevel)
from cusp_autotuned_tpu.parallel.sharded_plans import (
    shard_planned_dia, shard_structured_tentative, ShardedPlannedOperator)
from cusp_autotuned_tpu.backend.reference import reference_spmv
from cusp_autotuned_tpu.precond.aggregation import smoothed_aggregation
from cusp_autotuned_tpu.operators import StructuredTentative
from cusp_autotuned_tpu import solvers
from cusp_autotuned_tpu.solvers.monitor import Monitor


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the 8-virtual-device conftest")


@pytest.mark.parametrize("gen,shape", [(poisson5pt, (64, 64)),
                                       (poisson9pt, (48, 80))])
def test_shard_planned_dia_matches_oracle(gen, shape):
    A = gen(*shape, format="csr", dtype=np.float32)
    mesh = make_row_mesh()
    op = shard_planned_dia(convert(A, "dia"), mesh)
    x = np.linspace(-1, 1, A.num_cols).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    ref = reference_spmv(A, x)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_each_device_holds_only_its_band():
    A = poisson5pt(64, 64, format="csr", dtype=np.float32)
    mesh = make_row_mesh()
    op = shard_planned_dia(convert(A, "dia"), mesh)
    leaf = op.arrays["data"]
    nd = mesh.devices.size
    assert leaf.shape[0] == nd
    for s in leaf.addressable_shards:
        assert s.data.shape[0] == 1          # one band per device
    # the bands tile the global plan exactly
    got = np.zeros(leaf.shape, np.dtype(leaf.dtype))
    for s in leaf.addressable_shards:
        got[s.index] = np.asarray(s.data)
    np.testing.assert_array_equal(got, np.asarray(leaf))


def test_shard_planned_dia_under_jit_as_argument():
    """The operator is a pytree: the banded arrays ride jit as parameters
    and the shard_map apply composes inside a jitted caller."""
    A = poisson5pt(48, 48, format="csr", dtype=np.float32)
    mesh = make_row_mesh()
    op = shard_planned_dia(convert(A, "dia"), mesh)
    x = jnp.asarray(np.linspace(0, 1, A.num_cols).astype(np.float32))
    jf = jax.jit(lambda o, v: o(v))
    np.testing.assert_allclose(np.asarray(jf(op, x)), np.asarray(op(x)),
                               rtol=1e-6)


def test_distribute_multilevel_shards_tuned_path():
    A = poisson5pt(96, 96, format="csr", dtype=np.float32)
    b = np.ones(A.num_rows, np.float32)
    M = smoothed_aggregation(A, spmv_config={})
    x1, mon1 = solvers.cg(A, b, M=M, monitor=Monitor(b, 60, 1e-6))
    mesh = make_row_mesh()
    Md = distribute_multilevel(M, mesh, cutoff=2048)
    lv0 = Md.levels[0]
    assert isinstance(lv0.Aop, ShardedPlannedOperator)
    assert lv0.Aop.impl == "via_dia_sharded"
    # the factored R/P share the sharded A and shard their tentative data
    assert isinstance(lv0.Pop.Aop, ShardedPlannedOperator)
    w = lv0.Pop.Top.w
    assert not w.sharding.is_fully_replicated
    x2, mon2 = solvers.cg(A, b, M=Md, monitor=Monitor(b, 60, 1e-6),
                          mesh=mesh)
    assert mon2.converged()
    assert mon2.iteration_count() == mon1.iteration_count()
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=1e-3, atol=1e-3)


def test_distribute_multilevel_idempotent():
    A = poisson5pt(96, 96, format="csr", dtype=np.float32)
    M = smoothed_aggregation(A, spmv_config={})
    mesh = make_row_mesh()
    Md = distribute_multilevel(M, mesh, cutoff=2048)
    Md2 = distribute_multilevel(Md, mesh, cutoff=2048)
    assert Md2.levels[0].Aop is Md.levels[0].Aop


def test_shard_structured_tentative_placement_and_result():
    A = poisson5pt(96, 96, format="csr", dtype=np.float32)
    M = smoothed_aggregation(A, spmv_config={}, aggregator="structured")
    Top = M.levels[0].Pop.Top
    assert isinstance(Top, StructuredTentative)
    mesh = make_row_mesh()
    Ts = shard_structured_tentative(Top, mesh)
    e = jnp.asarray(np.linspace(-1, 1, Top.shape[1]).astype(np.float32))
    with mesh:
        np.testing.assert_allclose(np.asarray(Ts(e)), np.asarray(Top(e)),
                                   rtol=1e-6)


def test_sharded_planned_dia_block_vectors():
    """2-D x (lobpcg / cg_m / factored AMG multi-rhs) applies column-wise
    — a regression from round 3's replicated operators that supported it
    (review finding)."""
    A = poisson5pt(48, 48, format="csr", dtype=np.float32)
    mesh = make_row_mesh()
    op = shard_planned_dia(convert(A, "dia"), mesh)
    X = np.random.RandomState(0).randn(A.num_cols, 3).astype(np.float32)
    got = np.asarray(op(jnp.asarray(X)))
    for j in range(3):
        np.testing.assert_allclose(got[:, j], reference_spmv(A, X[:, j]),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_block_vector_k16_single_dispatch():
    """k=16 block-vector apply (the SpMM-rail scale) is ONE shard_map —
    columns batch through a vmap over the band kernel instead of k
    separate dispatches (VERDICT r4 weak #6)."""
    A = poisson9pt(48, 48, format="csr", dtype=np.float32)
    mesh = make_row_mesh()
    op = shard_planned_dia(convert(A, "dia"), mesh)
    X = np.random.RandomState(1).randn(A.num_cols, 16).astype(np.float32)
    got = np.asarray(op(jnp.asarray(X)))
    assert got.shape == (A.num_rows, 16)
    for j in range(16):
        np.testing.assert_allclose(got[:, j], reference_spmv(A, X[:, j]),
                                   rtol=1e-4, atol=1e-4)
    jaxpr = jax.make_jaxpr(lambda o, v: o(v))(op, jnp.asarray(X))
    n_shmap = str(jaxpr).count("shard_map")
    assert n_shmap == 1, f"expected 1 shard_map dispatch, saw {n_shmap}"


def _power_law(n=1500, seed=0, fmt="csr"):
    import scipy.sparse as sp
    from cusp_autotuned_tpu.backend.reference import from_scipy
    rng = np.random.RandomState(seed)
    deg = np.clip((rng.pareto(1.3, n) * 3).astype(int) + 1, 1, 400)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.randint(0, n, rows.size)
    vals = rng.randn(rows.size).astype(np.float32)
    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    S.sum_duplicates()
    return from_scipy(S, fmt)


def _economics_standin():
    from cusp_autotuned_tpu.backend.reference import from_scipy
    from cusp_autotuned_tpu.gallery.suite import williams_suite
    S = williams_suite(0.12)["Economics"].astype(np.float32).tocsr()
    return from_scipy(S, "csr")


@pytest.mark.parametrize("make_A,cfg", [
    (_power_law, {"impl": "binned", "block_entries": 1024,
                  "col_window": 1024, "row_window": 512}),
    (_power_law, {"impl": "colsort2", "block_entries": 1024}),
    (_economics_standin, {"impl": "routed"}),
])
def test_shard_planned_blocks_matches_oracle(make_A, cfg):
    """Scattered planned rails partition their block lists over the mesh
    (VERDICT r4 item 5): a contiguous slice of the global plan per device,
    partial outputs psum-combined; result matches the host oracle."""
    from cusp_autotuned_tpu.parallel.sharded_plans import (
        shard_planned_blocks)
    A = make_A()
    mesh = make_row_mesh()
    op = shard_planned_blocks(A, mesh, dict(cfg))
    assert op.impl == f"{cfg['impl']}_sharded" and op.out_mode == "sum"
    rng = np.random.RandomState(3)
    x = rng.randn(A.num_cols).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x)))
    want = reference_spmv(A, x)
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())
    # each device holds exactly its slice of the plan's block list
    key = {"binned": "vals", "colsort2": "v2v", "routed": "rv"}[cfg["impl"]]
    leaf = op.arrays[key]
    nd = mesh.devices.size
    assert leaf.shape[0] == nd
    for s in leaf.addressable_shards:
        assert s.data.shape[0] == 1


def test_shard_planned_blocks_block_vectors():
    from cusp_autotuned_tpu.parallel.sharded_plans import (
        shard_planned_blocks)
    A = _power_law(900, seed=2)
    mesh = make_row_mesh()
    op = shard_planned_blocks(
        A, mesh, {"impl": "colsort2", "block_entries": 1024})
    X = np.random.RandomState(4).randn(A.num_cols, 4).astype(np.float32)
    got = np.asarray(op(jnp.asarray(X)))
    for j in range(4):
        want = reference_spmv(A, X[:, j])
        np.testing.assert_allclose(got[:, j], want, rtol=2e-4,
                                   atol=2e-4 * np.abs(want).max())


def test_tuned_operator_mesh_shards_scattered():
    """tuned_operator(mesh=) returns the block-partitioned sharded plan
    when the best configuration is a scattered rail."""
    from cusp_autotuned_tpu.autotune.tuner import Tuner, matrix_signature
    import cusp_autotuned_tpu.autotune.tuner as tuner_mod
    from cusp_autotuned_tpu.autotune.result import ResultStatus, TuningResult
    from cusp_autotuned_tpu.parallel.sharded_plans import (
        ShardedPlannedOperator)

    A = _power_law(900, seed=5)
    t = Tuner()
    cfg = {"impl": "colsort2", "block_entries": 1024}
    from cusp_autotuned_tpu.autotune.space import config_key
    t.results[matrix_signature(A)] = {
        config_key(cfg): TuningResult(cfg, ResultStatus.Ok, duration_ms=1.0)}
    saved = tuner_mod._global_tuner
    tuner_mod._global_tuner = t
    try:
        mesh = make_row_mesh()
        op = tuner_mod.tuned_operator(A, mesh=mesh)
        assert isinstance(op, ShardedPlannedOperator)
        assert op.impl == "colsort2_sharded"
        x = np.linspace(-1, 1, A.num_cols).astype(np.float32)
        want = reference_spmv(A, x)
        np.testing.assert_allclose(np.asarray(op(jnp.asarray(x))), want,
                                   rtol=2e-4, atol=2e-4 * np.abs(want).max())
    finally:
        tuner_mod._global_tuner = saved


def test_shard_aop_carries_bf16_storage():
    """A via_dia plan tuned to bfloat16 storage must keep bf16 data when
    banded over the mesh (review finding: config was dropped)."""
    import dataclasses as _dc
    from cusp_autotuned_tpu.operators import planned_operator
    A = poisson5pt(96, 96, format="csr", dtype=np.float32)
    M = smoothed_aggregation(A, spmv_config={})
    lv = M.levels[0]
    op_b = planned_operator(A, {"impl": "via_dia", "dia_impl": "pallas",
                                "value_dtype": "bfloat16"})
    lvl_b = _dc.replace(lv, Aop=op_b)
    M_b = _dc.replace(M, levels=(lvl_b,) + M.levels[1:])
    mesh = make_row_mesh()
    Md = distribute_multilevel(M_b, mesh, cutoff=2048)
    assert isinstance(Md.levels[0].Aop, ShardedPlannedOperator)
    assert Md.levels[0].Aop.arrays["data"].dtype == jnp.bfloat16

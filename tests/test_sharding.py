"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest.py sets xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recom_tpu import Engine, EngineConfig
from recom_tpu.ir.spec import Combiner
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.oracle import OracleModel
from recom_tpu.ops import lookup_xla
from recom_tpu.parallel import make_mesh, sharded_group_pooled
from recom_tpu.parallel.sharded_lookup import pad_rows_to_multiple, stripe_rows

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
def test_sharded_group_pooled_matches_single_device():
    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(0)
    C, V, d, B, L = 3, 100, 8, 16, 4
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    ids = rng.integers(0, V, size=(B, C, L)).astype(np.int32)
    ids[rng.random((B, C, L)) < 0.3] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([0, 1, 2], np.int32)

    out_sh = jax.jit(
        lambda t, i: sharded_group_pooled(mesh, t, i, offs, code)
    )(jnp.asarray(tp), jnp.asarray(ids))
    out_1d = lookup_xla.group_pooled(
        jnp.asarray(table), jnp.asarray(ids), offs, code
    )
    np.testing.assert_allclose(
        np.asarray(out_sh), np.asarray(out_1d), atol=1e-6, rtol=1e-6
    )


@needs_8
def test_all_to_all_group_pooled_bitexact_vs_single_device():
    """The a2a path restores entry order before pooling, so unlike the
    psum path it must be BIT-exact with the single-device kernel."""
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(1)
    C, V, d, B, L = 3, 128, 8, 32, 4
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    ids = rng.integers(0, V, size=(B, C, L)).astype(np.int32)
    ids[rng.random((B, C, L)) < 0.3] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([0, 1, 2], np.int32)

    out_sh, overflow = jax.jit(
        lambda t, i: all_to_all_group_pooled(mesh, t, i, offs, code)
    )(jnp.asarray(tp), jnp.asarray(ids))
    assert int(overflow) == 0
    out_1d = lookup_xla.group_pooled(
        jnp.asarray(table), jnp.asarray(ids), offs, code
    )
    np.testing.assert_array_equal(np.asarray(out_sh), np.asarray(out_1d))


@needs_8
def test_all_to_all_weighted_bitexact():
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(4)
    C, V, d, B, L = 2, 64, 4, 16, 3
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    ids = rng.integers(0, V, size=(B, C, L)).astype(np.int32)
    ids[rng.random((B, C, L)) < 0.4] = -1
    w = rng.random((B, C, L)).astype(np.float32)
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([1, 2], np.int32)

    out_sh, overflow = jax.jit(
        lambda t, i, ww: all_to_all_group_pooled(
            mesh, t, i, offs, code, weights=ww
        )
    )(jnp.asarray(tp), jnp.asarray(ids), jnp.asarray(w))
    assert int(overflow) == 0
    out_1d = lookup_xla.group_pooled(
        jnp.asarray(table), jnp.asarray(ids), offs, code, jnp.asarray(w)
    )
    np.testing.assert_array_equal(np.asarray(out_sh), np.asarray(out_1d))


@needs_8
def test_all_to_all_dedup_fits_heavy_duplication_in_tiny_capacity():
    """Unique-before-exchange (the reference's Unique+Gather idiom,
    lookup_optimizer.cc:89-99): 2048 id slots drawing from only 8 distinct
    ids must fit a sub-1.0 capacity factor without overflow — and stay
    bit-exact.  With dedup disabled the same setup must overflow."""
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((1, 4))
    rng = np.random.default_rng(9)
    C, V, d, B, L = 4, 64, 8, 64, 8
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    # 8 distinct ids repeated across 2048 slots
    pool = rng.choice(V, size=8, replace=False).astype(np.int32)
    ids = pool[rng.integers(0, 8, size=(B, C, L))]
    ids[rng.random((B, C, L)) < 0.2] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([0, 1, 2, 0], np.int32)

    out_d, ov_d = jax.jit(
        lambda t, i: all_to_all_group_pooled(
            mesh, t, i, offs, code, capacity_factor=0.1, dedup=True
        )
    )(jnp.asarray(tp), jnp.asarray(ids))
    assert int(ov_d) == 0
    ref = lookup_xla.group_pooled(jnp.asarray(table), jnp.asarray(ids), offs, code)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(ref))

    _, ov_nd = jax.jit(
        lambda t, i: all_to_all_group_pooled(
            mesh, t, i, offs, code, capacity_factor=0.1, dedup=False
        )
    )(jnp.asarray(tp), jnp.asarray(ids))
    assert int(ov_nd) > 0


@needs_8
def test_all_to_all_grad_accumulates_duplicates():
    """Gradient through the dedup'd exchange: duplicates of one id must
    accumulate into that table row, matching the dense lookup's grad."""
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(11)
    C, V, d, B, L = 2, 32, 4, 16, 4
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    ids = rng.integers(0, 8, size=(B, C, L)).astype(np.int32)  # heavy dups
    ids[rng.random((B, C, L)) < 0.3] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.zeros((C,), np.int32)
    g_out = rng.standard_normal((B, C, d)).astype(np.float32)

    def loss_sharded(t):
        out, _ = all_to_all_group_pooled(mesh, t, ids, offs, code)
        return (out * g_out).sum()

    def loss_dense(t):
        return (
            lookup_xla.group_pooled(t, jnp.asarray(ids), offs, code) * g_out
        ).sum()

    gs = jax.jit(jax.grad(loss_sharded))(jnp.asarray(tp))
    gd = jax.jit(jax.grad(loss_dense))(jnp.asarray(table))
    from recom_tpu.parallel.sharded_lookup import unstripe_rows

    gs_logical = unstripe_rows(np.asarray(gs), 4)[: C * V]
    np.testing.assert_allclose(gs_logical, np.asarray(gd), atol=1e-5)


@needs_8
def test_all_to_all_overflow_counted_and_rows_zeroed():
    """Skew every id onto shard 0 with a sub-1.0 capacity factor: the
    overflow must be counted, and dropped entries pool as zeros (graceful
    degradation, not corruption)."""
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((1, 4))
    rng = np.random.default_rng(5)
    C, V, d, B, L = 1, 64, 4, 64, 4
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    # ids = multiples of 4 -> striped owner 0 for all; 16 DISTINCT ids so
    # dedup cannot absorb them, well past the sub-1.0-factor capacity
    ids = (rng.integers(0, 16, size=(B, C, L)) * 4).astype(np.int32)
    offs = np.zeros((C,), np.int32)
    code = np.zeros((C,), np.int32)

    out_sh, overflow = jax.jit(
        lambda t, i: all_to_all_group_pooled(
            mesh, t, i, offs, code, capacity_factor=0.5
        )
    )(jnp.asarray(tp), jnp.asarray(ids))
    assert int(overflow) > 0
    # every surviving contribution is a real table row; output is finite
    assert np.isfinite(np.asarray(out_sh)).all()


@needs_8
def test_engine_all_to_all_bitexact_vs_oracle():
    """Engine-level: row-sharded group via shard_comm=all_to_all must be
    bit-exact with the oracle (the psum path only promises 1e-6)."""
    m = make_dlrm_model(4, 2, 2, 2, 1, 4, [8], [16], name="sharda2a",
                        large_rows=4096)
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(32, 64), shard_comm="all_to_all",
    )
    eng = Engine(m, cfg)
    assert eng._sharded_gids
    b = make_random_batch(m, 32, seed=2)
    out = eng.predict(b, return_pooled=True)
    assert eng.stats.get("a2a_overflow", 0) == 0
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


@needs_8
def test_sharded_engine_matches_oracle():
    m = make_dlrm_model(4, 2, 2, 2, 1, 4, [8], [16], name="shard",
                        large_rows=4096)
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(32, 64),
    )
    eng = Engine(m, cfg)
    assert eng._sharded_gids, "expected sharded groups"
    b = make_random_batch(m, 30, seed=2)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_allclose(
            out["pooled"][c], r, atol=1e-6, rtol=1e-6, err_msg=c
        )
    np.testing.assert_allclose(
        out["output"], ref["output"], atol=1e-5, rtol=1e-4
    )


@needs_8
def test_pure_data_parallel_unsharded_tables_bitexact():
    m = make_dlrm_model(4, 2, 2, 1, 0, 2, [4], [8], name="dp")
    cfg = EngineConfig(mesh_shape=(8, 1), use_pallas=False,
                      batch_buckets=(32, 64))
    eng = Engine(m, cfg)
    assert not eng._sharded_gids
    b = make_random_batch(m, 32, seed=3)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        # replicated tables + DP batch keeps single-device exactness
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


@needs_8
def test_trainer_loss_decreases():
    from recom_tpu.train import Trainer

    m = make_dlrm_model(3, 1, 1, 1, 1, 2, [4], [8, 1], name="train",
                        large_rows=2048)
    cfg = EngineConfig(
        mesh_shape=(4, 2), shard_rows_above=1024, use_pallas=False,
        batch_buckets=(32,),
    )
    tr = Trainer(m, cfg)
    rng = np.random.default_rng(0)
    losses = []
    b = make_random_batch(m, 32, seed=5)
    labels = rng.integers(0, 2, 32)
    for _ in range(5):
        losses.append(tr.step(b, labels))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    # scaled-down flagship for test time
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.runtime.host_prep import prepare_batch

    model = make_dlrm_model(8, 2, 2, 2, 1, 4, [8], [16, 1], name="entry",
                            large_rows=4096)
    eng = Engine(model, EngineConfig(use_pallas=False))
    batch = make_random_batch(model, 16, seed=0)
    prepared = prepare_batch(eng.compiled, batch)
    fn = lambda p, a: eng._forward(p, a)["output"]
    out = jax.jit(fn)(eng.device_params, prepared.arrays)
    assert np.isfinite(np.asarray(out)).all()


@needs_8
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@needs_8
def test_dim_sharded_tensor_parallel_bitexact():
    """TP layout: dim-sharded tables partition the gather via GSPMD with
    no shard_map and stay bit-exact (per-dim-element math is unchanged)."""
    m = make_dlrm_model(0, 2, 2, 2, 0, 2, [4], [8], name="dimshard",
                        dim=8)
    cfg = EngineConfig(
        mesh_shape=(2, 4), dim_shard_above=4, use_pallas=False,
        batch_buckets=(32,),
    )
    eng = Engine(m, cfg)
    assert eng._dim_sharded_gids, "expected dim-sharded groups"
    assert not eng._sharded_gids
    b = make_random_batch(m, 32, seed=7)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


@needs_8
def test_a2a_overflow_policy_recompute_warn_raise():
    """ADVICE r01: an overflowing a2a step must not silently violate the
    bit-exact contract.  Default policy re-runs the step via the lossless
    psum path; "warn" keeps the degraded result but surfaces the count;
    "raise" fails the request."""
    m = make_dlrm_model(0, 0, 0, 0, 1, 2, [4], [8], name="ovf",
                        large_rows=4096)
    base = dict(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(32,), shard_comm="all_to_all",
        a2a_capacity_factor=0.01,
    )
    b = make_random_batch(m, 32, seed=3, max_list_len=16)
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(m)

    eng = Engine(m, EngineConfig(**base), params=params)  # recompute
    assert eng._sharded_gids
    out = eng.predict(b, return_pooled=True)
    assert eng.stats.get("a2a_recomputes", 0) >= 1
    assert out["a2a_overflow"] == 0
    ref = OracleModel(m, params=params).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)

    eng_w = Engine(
        m, EngineConfig(a2a_overflow_policy="warn", **base), params=params
    )
    out_w = eng_w.predict(b)
    assert out_w["a2a_overflow"] > 0

    eng_r = Engine(
        m, EngineConfig(a2a_overflow_policy="raise", **base), params=params
    )
    with pytest.raises(RuntimeError, match="overflow"):
        eng_r.predict(b)


@needs_8
def test_sharded_softmax_combiner_bitexact():
    """Combiner.SOFTMAX on a row-sharded (a2a) group: the host softmaxes
    the staged scores, the sharded path pools them as a weighted SUM —
    bit-exact vs the oracle."""
    from recom_tpu.ir.spec import (
        FeatureColumn, FeatureKind, FeatureSource, LookupSpec, ModelSpec,
        NumToId, TableSpec, TowerSpec,
    )

    V = 4096
    m = ModelSpec(
        "shsmx",
        {"big": TableSpec("big", V, 4), "small": TableSpec("small", 32, 4)},
        [
            FeatureColumn(
                "sm", FeatureSource("sm", FeatureKind.INT_LIST),
                (NumToId(V),),
                LookupSpec("big", Combiner.SOFTMAX, weight_field="w"),
            ),
            FeatureColumn(
                "pl", FeatureSource("pl", FeatureKind.INT_LIST),
                (NumToId(32),), LookupSpec("small", Combiner.MEAN),
            ),
        ],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    rng = np.random.default_rng(6)
    lens = rng.integers(0, 6, 24)
    batch = {
        "sm": [list(rng.integers(-1, V, int(n))) for n in lens],
        "pl": [list(rng.integers(0, 32, 3)) for _ in lens],
    }
    batch["w"] = [list((rng.standard_normal(len(r)) * 2).astype(np.float32))
                  for r in batch["sm"]]
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(24,), shard_comm="all_to_all",
    )
    eng = Engine(m, cfg)
    assert eng._sharded_gids
    out = eng.predict(batch, return_pooled=True)
    ref = OracleModel(m).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


@needs_8
def test_serving_pipeline_applies_a2a_overflow_policy():
    """Round-3 runtime review, finding 2: the pipeline path must enforce
    a2a_overflow_policy exactly like Engine.predict_prepared — recompute
    re-runs the step through the lossless full-capacity exchange, raise
    fails the request's Future — instead of silently resolving Futures
    with the lossy output."""
    from recom_tpu.runtime.server import ServingPipeline

    m = make_dlrm_model(0, 0, 0, 0, 1, 2, [4], [8], name="povf",
                        large_rows=4096)
    base = dict(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(32,), shard_comm="all_to_all",
        a2a_capacity_factor=0.01,
    )
    b = make_random_batch(m, 32, seed=3, max_list_len=16)
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(m)

    eng = Engine(m, EngineConfig(**base), params=params)  # recompute
    assert eng._sharded_gids
    want = eng.predict(b)["output"]          # lossless via recompute
    pre = eng.stats.get("a2a_recomputes", 0)
    with ServingPipeline(eng, prep_workers=1, max_inflight=1) as pipe:
        got = pipe.submit(b).result()
        assert pipe.stats.get("a2a_recomputes", 0) >= 1
    assert eng.stats.get("a2a_recomputes", 0) > pre
    np.testing.assert_array_equal(got, want)

    eng_r = Engine(
        m, EngineConfig(a2a_overflow_policy="raise", **base), params=params
    )
    with ServingPipeline(eng_r, prep_workers=1, max_inflight=1,
                         retries=0) as pipe:
        fut = pipe.submit(b)
        with pytest.raises(RuntimeError, match="overflow"):
            fut.result()


@needs_8
def test_a2a_chunked_return_bitexact():
    """chunks>1 pipelines the row-return exchange (one all_to_all per
    capacity slice, restoration accumulated per chunk) — outputs must be
    BIT-identical to the monolithic exchange and the single-device kernel
    for every chunking, including chunk counts that force capacity
    padding."""
    from recom_tpu.parallel import all_to_all_group_pooled

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(3)
    C, V, d, B, L = 3, 128, 8, 16, 5
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    tp = stripe_rows(pad_rows_to_multiple(table, 4), 4)
    ids = rng.integers(0, V, size=(B, C, L)).astype(np.int32)
    ids[rng.random((B, C, L)) < 0.3] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([0, 1, 2], np.int32)

    outs = {}
    for chunks in (1, 2, 3):
        out, overflow = jax.jit(
            lambda t, i, ck=chunks: all_to_all_group_pooled(
                mesh, t, i, offs, code, chunks=ck
            )
        )(jnp.asarray(tp), jnp.asarray(ids))
        assert int(overflow) == 0
        outs[chunks] = np.asarray(out)
    out_1d = lookup_xla.group_pooled(
        jnp.asarray(table), jnp.asarray(ids), offs, code
    )
    for chunks in (1, 2, 3):
        np.testing.assert_array_equal(outs[chunks], np.asarray(out_1d))

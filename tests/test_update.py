"""Online table updates (Engine.update_table_rows): streaming embedding
refresh into a live serving engine.

Contract: after update_table_rows(t, rows, vals), the engine must serve
exactly what a freshly-built engine with the updated table would serve —
bit-exact vs the oracle on the updated params — on EVERY storage layout
(plain stacked, Pallas one-hot, striped row-sharded, dim-sharded, int8
quantized), and checkpoint export must reflect the update.
"""

import copy

import numpy as np
import pytest

import jax

from recom_tpu import Engine, EngineConfig
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.oracle import OracleModel
from recom_tpu.runtime.checkpoint import export_params
from recom_tpu.utils.params import init_model_params

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _updated(np_params, table, rows, vals):
    upd = copy.deepcopy(np_params)
    upd["tables"][table][rows] = vals
    return upd


def _gid_of_table(eng, table):
    for g in eng.compiled.groups:
        if any(m.table == table for m in g.members):
            return g.gid
    raise KeyError(table)


def test_update_plain_xla_bitexact_vs_oracle():
    m = make_dlrm_model(3, 1, 1, 1, 0, 2, [4], [8, 1], name="upd_plain")
    np_params = init_model_params(m)
    eng = Engine(
        m, EngineConfig(use_pallas=False, batch_buckets=(16,)),
        params=np_params,
    )
    b = make_random_batch(m, 16, seed=0)
    base = eng.predict(b, return_pooled=True)

    rng = np.random.default_rng(1)
    upd = copy.deepcopy(np_params)
    for t in ("emb_bucketize0", "emb_hash_str0", "emb_sparse0"):
        vocab = m.tables[t].vocab_size
        # every row, in shuffled order: unsorted scatter indices must land
        rows = rng.permutation(vocab)
        vals = rng.standard_normal((rows.size, m.tables[t].dim)).astype(
            np.float32
        )
        assert eng.update_table_rows(t, rows, vals) == 1
        upd["tables"][t][rows] = vals

    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m, params=upd).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    # something actually changed
    assert any(
        not np.array_equal(base["pooled"][c], out["pooled"][c])
        for c in base["pooled"]
    )
    # export reflects the update
    exported = export_params(eng)
    for t in ("emb_bucketize0", "emb_hash_str0", "emb_sparse0"):
        np.testing.assert_array_equal(exported["tables"][t],
                                      upd["tables"][t], err_msg=t)


def test_update_pallas_onehot_layout():
    m = make_dlrm_model(4, 0, 0, 0, 0, 1, [4], [8, 1], name="upd_pl")
    np_params = init_model_params(m)
    eng = Engine(
        m,
        EngineConfig(use_pallas=True, interpret=True, batch_buckets=(16,)),
        params=np_params,
    )
    assert any(
        g.pallas_vocab is not None for g in eng.compiled.groups
    ), "model was expected to take the Pallas one-hot layout"
    t = "emb_bucketize2"
    rng = np.random.default_rng(2)
    rows = rng.choice(m.tables[t].vocab_size, size=9, replace=False)
    vals = rng.standard_normal((9, m.tables[t].dim)).astype(np.float32)
    eng.update_table_rows(t, rows, vals)

    b = make_random_batch(m, 16, seed=3)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(
        m, params=_updated(np_params, t, rows, vals)
    ).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    np.testing.assert_array_equal(
        export_params(eng)["tables"][t][rows], vals
    )


@needs_8
def test_update_striped_sharded_table():
    m = make_dlrm_model(2, 1, 1, 1, 1, 2, [4], [8, 1], name="upd_sh",
                        large_rows=4096)
    np_params = init_model_params(m)
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(16,), shard_comm="all_to_all",
    )
    eng = Engine(m, cfg, params=np_params)
    t = "emb_large_sparse0"
    gid = _gid_of_table(eng, t)
    assert gid in eng._sharded_gids
    sharding_before = eng.device_params["stacked"][str(gid)].sharding

    rng = np.random.default_rng(4)
    rows = rng.choice(m.tables[t].vocab_size, size=33, replace=False)
    vals = rng.standard_normal((33, m.tables[t].dim)).astype(np.float32)
    eng.update_table_rows(t, rows, vals)
    # the striped P("model", None) layout must survive the scatter
    assert (
        eng.device_params["stacked"][str(gid)].sharding == sharding_before
    )

    b = make_random_batch(m, 16, seed=5)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(
        m, params=_updated(np_params, t, rows, vals)
    ).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    # export unstripes back to the updated logical rows
    np.testing.assert_array_equal(
        export_params(eng)["tables"][t][rows], vals
    )


@needs_8
def test_update_dim_sharded_table():
    m = make_dlrm_model(2, 1, 1, 1, 1, 2, [4], [8, 1], name="upd_dim",
                        large_rows=2048)
    np_params = init_model_params(m)
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=1 << 30, dim_shard_above=16,
        use_pallas=False, batch_buckets=(16,),
    )
    eng = Engine(m, cfg, params=np_params)
    t = "emb_large_sparse0"
    gid = _gid_of_table(eng, t)
    assert gid in eng._dim_sharded_gids
    sharding_before = eng.device_params["stacked"][str(gid)].sharding

    rng = np.random.default_rng(6)
    rows = rng.choice(m.tables[t].vocab_size, size=17, replace=False)
    vals = rng.standard_normal((17, m.tables[t].dim)).astype(np.float32)
    eng.update_table_rows(t, rows, vals)
    assert (
        eng.device_params["stacked"][str(gid)].sharding == sharding_before
    )

    b = make_random_batch(m, 16, seed=7)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(
        m, params=_updated(np_params, t, rows, vals)
    ).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


def test_update_quantized_int8_requantizes_rows():
    m = make_dlrm_model(2, 1, 1, 1, 0, 2, [4], [8, 1], name="upd_q")
    np_params = init_model_params(m)
    eng = Engine(
        m,
        EngineConfig(table_dtype="int8", use_pallas=False,
                     batch_buckets=(16,)),
        params=np_params,
    )
    t = "emb_hash_str0"
    rng = np.random.default_rng(8)
    rows = rng.choice(m.tables[t].vocab_size, size=11, replace=False)
    # rows with very different magnitudes: per-row scales must refresh
    vals = (
        rng.standard_normal((11, m.tables[t].dim))
        * np.exp(rng.uniform(-4, 4, size=(11, 1)))
    ).astype(np.float32)
    eng.update_table_rows(t, rows, vals)

    # engine output is bit-exact vs the oracle on its OWN dequantized
    # storage (the quant exactness contract), and the stored rows carry
    # the fresh values to within one quantization step
    deq = export_params(eng)
    amax = np.abs(vals).max(axis=1, keepdims=True)
    assert (
        np.abs(deq["tables"][t][rows] - vals) <= amax / 127.0 * 0.5 + 1e-12
    ).all()
    b = make_random_batch(m, 16, seed=9)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m, params=deq).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


def test_update_shared_table_updates_every_slot():
    """Two columns sharing one table (shared_embedding analogue): a single
    update must be visible through BOTH columns."""
    from recom_tpu.ir.spec import (
        Combiner, FeatureColumn, FeatureKind, FeatureSource, HashBucket,
        LookupSpec, ModelSpec, TableSpec, TowerSpec,
    )

    t = TableSpec("shared_t", 64, 4)
    cols = [
        FeatureColumn(
            "ca", FeatureSource("fa", FeatureKind.STRING),
            (HashBucket(64),), LookupSpec("shared_t", Combiner.MEAN),
        ),
        FeatureColumn(
            "cb", FeatureSource("fb", FeatureKind.STRING_LIST, delimiter=","),
            (HashBucket(64),), LookupSpec("shared_t", Combiner.SUM),
        ),
    ]
    m = ModelSpec(
        "upd_shared", {"shared_t": t}, cols,
        TowerSpec(arch="mlp", top_mlp=(8, 1), final_activation=None),
    )
    np_params = init_model_params(m)
    eng = Engine(
        m, EngineConfig(use_pallas=False, batch_buckets=(8,)),
        params=np_params,
    )
    rng = np.random.default_rng(10)
    rows = np.arange(64)
    vals = rng.standard_normal((64, 4)).astype(np.float32)
    # one table, possibly stacked in several member slots
    assert eng.update_table_rows("shared_t", rows, vals) >= 1

    b = {
        "fa": np.asarray([f"s{i}" for i in range(8)]),
        "fb": np.asarray([f"a{i},b{i},c{i}" for i in range(8)]),
    }
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(
        m, params=_updated(np_params, "shared_t", rows, vals)
    ).forward(b)
    for c in ("ca", "cb"):
        np.testing.assert_array_equal(out["pooled"][c], ref["pooled"][c],
                                      err_msg=c)


def test_update_validation_errors():
    m = make_dlrm_model(1, 1, 0, 0, 0, 1, [4], [8, 1], name="upd_err")
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(8,)))
    with pytest.raises(KeyError):
        eng.update_table_rows("nope", [0], np.zeros((1, 8), np.float32))
    with pytest.raises(ValueError):
        eng.update_table_rows(
            "emb_hash_int0", [10 ** 9], np.zeros((1, 8), np.float32)
        )
    with pytest.raises(ValueError):
        eng.update_table_rows(
            "emb_hash_int0", [-1], np.zeros((1, 8), np.float32)
        )
    with pytest.raises(ValueError):  # wrong dim
        eng.update_table_rows(
            "emb_hash_int0", [0], np.zeros((1, 5), np.float32)
        )
    with pytest.raises(ValueError):  # misaligned n
        eng.update_table_rows(
            "emb_hash_int0", [0, 1], np.zeros((1, 8), np.float32)
        )


def test_reload_params_hot_swap_without_recompile():
    """Engine.reload_params swaps the whole model's weights into the live
    engine: outputs match the oracle on the new params BIT-exactly and no
    new program is compiled (the jit cache is shape-keyed)."""
    m = make_dlrm_model(2, 1, 1, 1, 0, 2, [4], [8, 1], name="reload")
    p1 = init_model_params(m)
    eng = Engine(
        m, EngineConfig(use_pallas=False, batch_buckets=(16,)), params=p1
    )
    b = make_random_batch(m, 16, seed=20)
    out1 = eng.predict(b, return_pooled=True)
    compiles = eng.stats["compiles"]

    from recom_tpu.utils.params import init_model_params as imp

    p2 = imp(m)
    rng = np.random.default_rng(21)
    for t in p2["tables"]:
        p2["tables"][t] = rng.standard_normal(
            p2["tables"][t].shape
        ).astype(np.float32)
    eng.reload_params(p2)
    out2 = eng.predict(b, return_pooled=True)
    assert eng.stats["compiles"] == compiles, "reload must not recompile"

    ref = OracleModel(m, params=p2).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out2["pooled"][c], r, err_msg=c)
    np.testing.assert_array_equal(out2["output"], ref["output"])
    # the swap is visible (final logits can degenerate to exactly 0 at
    # init, so probe the pooled embeddings)
    assert any(
        not np.array_equal(out1["pooled"][c], out2["pooled"][c])
        for c in out1["pooled"]
    )
    exported = export_params(eng)
    for t in p2["tables"]:
        np.testing.assert_array_equal(exported["tables"][t],
                                      p2["tables"][t], err_msg=t)


def test_update_duplicate_rows_last_wins():
    """Duplicate row_ids must resolve LAST-wins (XLA scatter order is
    undefined, and the int8 path's independent q/scale scatters could
    otherwise leave a torn row: q from one occurrence, scale from
    another)."""
    for dtype in ("float32", "int8"):
        m = make_dlrm_model(1, 1, 0, 0, 0, 1, [4], [8, 1],
                            name=f"dup_{dtype}")
        np_params = init_model_params(m)
        eng = Engine(
            m,
            EngineConfig(table_dtype=dtype, use_pallas=False,
                         batch_buckets=(8,)),
            params=np_params,
        )
        t = "emb_hash_int0"
        dim = m.tables[t].dim
        # row 7 twice: huge magnitude first, tiny last — a torn int8 row
        # (q of one, scale of the other) would be wildly off both
        rows = np.array([7, 3, 7])
        vals = np.stack([
            np.full(dim, 1000.0, np.float32),
            np.arange(dim, dtype=np.float32),
            np.full(dim, 1e-3, np.float32),
        ])
        eng.update_table_rows(t, rows, vals)
        got = export_params(eng)["tables"][t]
        np.testing.assert_allclose(got[7], vals[2], rtol=1 / 127,
                                   atol=1e-9, err_msg=dtype)
        np.testing.assert_allclose(got[3], vals[1], rtol=1 / 127,
                                   atol=1e-9, err_msg=dtype)


def test_update_concurrent_with_serving_never_tears():
    """Requests racing update_table_rows must each serve either the OLD
    or the NEW table per column — never a torn mix within one column
    (the single-reference-swap concurrency contract)."""
    import threading

    m = make_dlrm_model(2, 1, 1, 1, 0, 1, [4], [8, 1], name="upd_race")
    np_params = init_model_params(m)
    eng = Engine(
        m, EngineConfig(use_pallas=False, batch_buckets=(16,)),
        params=np_params,
    )
    b = make_random_batch(m, 16, seed=30)
    oracle_old = OracleModel(m, params=np_params).pooled_outputs(b)

    rng = np.random.default_rng(31)
    new_tables = {
        t: rng.standard_normal(
            (spec.vocab_size, spec.dim)
        ).astype(np.float32)
        for t, spec in m.tables.items()
    }
    upd = copy.deepcopy(np_params)
    upd["tables"].update(new_tables)
    oracle_new = OracleModel(m, params=upd).pooled_outputs(b)

    outs = []
    stop = threading.Event()

    def serve():
        while not stop.is_set() or len(outs) < 8:
            outs.append(eng.predict(b, return_pooled=True)["pooled"])
            if len(outs) > 200:
                break

    th = threading.Thread(target=serve)
    th.start()
    try:
        for t, vals in new_tables.items():
            eng.update_table_rows(t, np.arange(vals.shape[0]), vals)
    finally:
        stop.set()
        th.join(timeout=120)
    assert not th.is_alive()

    for pooled in outs:
        for c in pooled:
            po = np.asarray(pooled[c])
            ok = np.array_equal(po, oracle_old[c]) or np.array_equal(
                po, oracle_new[c]
            )
            assert ok, f"torn output in column {c}"
    # a request issued after all updates completed serves the NEW tables
    final = eng.predict(b, return_pooled=True)["pooled"]
    for c, r in oracle_new.items():
        np.testing.assert_array_equal(np.asarray(final[c]), r, err_msg=c)

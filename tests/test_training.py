"""End-to-end learnability: train on synthetic data with planted signal and
check AUC rises well above chance (the BASELINE.md "end-to-end AUC" gate,
scaled down for CI)."""

import numpy as np

from recom_tpu import EngineConfig
from recom_tpu.ir.spec import (
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    LookupSpec,
    ModelSpec,
    NumToId,
    TableSpec,
    TowerSpec,
)
from recom_tpu.train import Trainer


def auc(labels: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def make_learnable_model():
    tables = {"t": TableSpec("t", 32, 8)}
    cols = [
        FeatureColumn(
            "ids", FeatureSource("ids", FeatureKind.INT_LIST),
            (NumToId(32),), LookupSpec("t", Combiner.MEAN),
        ),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
    ]
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(16, 1),
                      final_activation="sigmoid")
    return ModelSpec("learn", tables, cols, tower)


def make_data(rng, n):
    # planted rule: label depends on whether the id set skews high + dense
    ids = [list(rng.integers(0, 32, size=int(k)))
           for k in rng.integers(1, 5, n)]
    d0 = rng.standard_normal(n).astype(np.float32)
    signal = np.array([np.mean(row) / 31.0 for row in ids]) + 0.3 * d0
    labels = (signal + 0.1 * rng.standard_normal(n) > 0.55).astype(np.float32)
    return {"ids": ids, "d0": d0}, labels


def test_training_learns_signal():
    rng = np.random.default_rng(0)
    cfg = EngineConfig(use_pallas=False, batch_buckets=(128,),
                       persistent_compilation_cache=False)
    tr = Trainer(make_learnable_model(), cfg)

    batch, labels = make_data(rng, 128)
    eng = tr.engine
    before = eng.predict(batch)["output"][:, 0]
    auc_before = auc(labels, before)

    losses = []
    for step in range(60):
        b, l = make_data(rng, 128)
        losses.append(tr.step(b, l))

    after = tr.engine.predict(batch)["output"][:, 0]
    auc_after = auc(labels, after)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert auc_after > 0.8, (auc_before, auc_after)
    assert auc_after > auc_before + 0.1


def test_training_updates_reach_serving():
    """The trainer and engine share params: post-training predictions must
    differ from init (no stale-parameter serving)."""
    rng = np.random.default_rng(1)
    cfg = EngineConfig(use_pallas=False, batch_buckets=(128,),
                       persistent_compilation_cache=False)
    tr = Trainer(make_learnable_model(), cfg)
    batch, labels = make_data(rng, 128)
    before = tr.engine.predict(batch)["output"]
    tr.step(batch, labels)
    after = tr.engine.predict(batch)["output"]
    assert not np.array_equal(before, after)


def test_rowwise_adagrad_state_is_per_row_and_learns():
    import jax
    import numpy as np

    from recom_tpu import EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.train import Trainer, dlrm_optimizer

    m = make_dlrm_model(4, 2, 2, 1, 0, 2, [4], [8, 1], name="rwag")
    tr = Trainer(
        m, EngineConfig(use_pallas=False, batch_buckets=(32,)),
        optimizer=dlrm_optimizer(table_lr=0.05, tower_lr=1e-3),
    )
    # optimizer state for each stacked [R, d] table must be [R] (row-wise)
    inner = tr.opt_state.inner_states["tables"].inner_state
    accs = [
        a for a in jax.tree_util.tree_leaves(inner)
        if a.ndim == 1
    ]
    assert accs, "expected 1-D row accumulators in optimizer state"
    rows = {t.shape[0] for t in tr.engine.device_params["stacked"].values()}
    assert {a.shape[0] for a in accs} & rows

    b = make_random_batch(m, 32, seed=7)
    labels = np.random.default_rng(0).integers(0, 2, 32)
    losses = [tr.step(b, labels) for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_train_checkpoint_resume_bitexact(tmp_path):
    """Trainer.save at step k, Trainer.restore, continue: the resumed run
    must reproduce the uninterrupted run BIT-exactly (losses and final
    exported params) — params and every optimizer-state leaf round-trip."""
    from recom_tpu.runtime.checkpoint import export_params
    from recom_tpu.train import dlrm_optimizer

    cfg = EngineConfig(use_pallas=False, batch_buckets=(128,),
                       persistent_compilation_cache=False)
    rng = np.random.default_rng(3)
    batches, labels = [], []
    for _ in range(6):
        f, l = make_data(rng, 128)
        batches.append(f)
        labels.append(l)

    tr_a = Trainer(make_learnable_model(), cfg, optimizer=dlrm_optimizer())
    for b, l in zip(batches[:3], labels[:3]):
        tr_a.step(b, l)
    path = str(tmp_path / "train_ck")
    tr_a.save(path)
    cont_a = [tr_a.step(b, l) for b, l in zip(batches[3:], labels[3:])]

    tr_b = Trainer.restore(path, cfg, optimizer=dlrm_optimizer())
    cont_b = [tr_b.step(b, l) for b, l in zip(batches[3:], labels[3:])]
    assert cont_a == cont_b, (cont_a, cont_b)

    ea, eb = export_params(tr_a.engine), export_params(tr_b.engine)
    for t in ea["tables"]:
        np.testing.assert_array_equal(ea["tables"][t], eb["tables"][t],
                                      err_msg=t)
    for k in ea["tower"]:
        for la, lb in zip(ea["tower"][k], eb["tower"][k]):
            np.testing.assert_array_equal(la["w"], lb["w"])
            np.testing.assert_array_equal(la["b"], lb["b"])


def test_train_checkpoint_resume_sharded(tmp_path):
    """Same resume contract on a (2,4) mesh with the big table
    row-sharded: striped optimizer leaves round-trip and land back on
    their shards."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.runtime.checkpoint import export_params
    from recom_tpu.train import dlrm_optimizer

    m = make_dlrm_model(2, 1, 1, 1, 1, 2, [4], [8, 1], name="resume_sh",
                        large_rows=4096)
    cfg = EngineConfig(
        mesh_shape=(2, 4), shard_rows_above=2048, use_pallas=False,
        batch_buckets=(32,), persistent_compilation_cache=False,
    )
    rng = np.random.default_rng(5)
    batches = [make_random_batch(m, 32, seed=50 + i) for i in range(4)]
    labs = [rng.integers(0, 2, 32).astype(np.float32) for _ in range(4)]

    tr_a = Trainer(m, cfg, optimizer=dlrm_optimizer())
    assert tr_a.engine._sharded_gids
    for b, l in zip(batches[:2], labs[:2]):
        tr_a.step(b, l)
    path = str(tmp_path / "train_ck_sh")
    tr_a.save(path)
    cont_a = [tr_a.step(b, l) for b, l in zip(batches[2:], labs[2:])]

    tr_b = Trainer.restore(path, cfg, optimizer=dlrm_optimizer())
    cont_b = [tr_b.step(b, l) for b, l in zip(batches[2:], labs[2:])]
    assert cont_a == cont_b, (cont_a, cont_b)
    ea, eb = export_params(tr_a.engine), export_params(tr_b.engine)
    for t in ea["tables"]:
        np.testing.assert_array_equal(ea["tables"][t], eb["tables"][t],
                                      err_msg=t)

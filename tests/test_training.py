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

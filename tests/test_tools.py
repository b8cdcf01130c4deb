"""Measurement-tool correctness (round-3 tools review)."""

import numpy as np


def test_auc_midranks_match_brute_force_u():
    """Mann-Whitney AUC with ties must use midranks: saturated f32
    sigmoids tie many scores at exactly 0.0/1.0, and order-based ranks
    shift the statistic by up to the tied mass (corrupting the parity
    gate).  Compare against the brute-force U on heavily tied data."""
    from recom_tpu.tools.auc_parity import auc

    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(5, 60))
        y = rng.integers(0, 2, n)
        s = rng.choice([0.0, 0.25, 0.5, 1.0], n)
        pos, neg = s[y == 1], s[y == 0]
        if len(pos) and len(neg):
            u = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
            want = u / (len(pos) * len(neg))
        else:
            want = 0.5
        assert abs(auc(y, s) - want) < 1e-12

    # all-tied scores = chance, exactly
    assert auc(np.array([1, 0, 1, 0]), np.zeros(4)) == 0.5


def test_weighted_scalar_batch_generation():
    """make_random_batch must produce the flat [B] weight form for
    weighted SINGLE-VALUE columns (it crashed on them before)."""
    from recom_tpu.ir.spec import (
        Combiner, FeatureColumn, FeatureKind, FeatureSource, HashBucket,
        LookupSpec, ModelSpec, TableSpec, TowerSpec,
    )
    from recom_tpu.models import make_random_batch

    m = ModelSpec(
        "ws", {"t": TableSpec("t", 32, 4)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.DENSE_INT),
                       (HashBucket(32),),
                       LookupSpec("t", Combiner.SUM, weight_field="w"))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    b = make_random_batch(m, 16, seed=1)
    w = np.asarray(b["w"])
    assert w.shape == (16,) and w.dtype == np.float32

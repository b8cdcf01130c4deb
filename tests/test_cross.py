"""Hashed feature-cross tests (tf.feature_column.crossed_column analogue)."""

import numpy as np

from recom_tpu import Engine, EngineConfig
from recom_tpu.ir.serde import model_from_json, model_to_json
from recom_tpu.ir.spec import (
    Combiner,
    CrossHash,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    LookupSpec,
    ModelSpec,
    TableSpec,
    TowerSpec,
)
from recom_tpu.oracle import OracleModel
from recom_tpu.oracle.hashing import cross_hash, farmhash64, fingerprint_cat64


def cross_model(nb=1000):
    tables = {"t": TableSpec("t", nb, 4)}
    cols = [
        FeatureColumn(
            "city_x_device",
            FeatureSource("city_x_device", FeatureKind.CROSS,
                          fields=("city", "device")),
            (CrossHash(nb),),
            LookupSpec("t", Combiner.SUM),
        )
    ]
    return ModelSpec("cross", tables, cols,
                     TowerSpec(arch="mlp", top_mlp=(), final_activation=None))


def test_fingerprint_cat64_structure():
    a, b = farmhash64("x"), farmhash64("y")
    # order-dependent, deterministic, 64-bit
    assert fingerprint_cat64(a, b) != fingerprint_cat64(b, a)
    assert fingerprint_cat64(a, b) == fingerprint_cat64(a, b)
    assert 0 <= fingerprint_cat64(a, b) < (1 << 64)


def test_cross_hash_left_to_right():
    nb = 10**9
    h = cross_hash(("a", "b"), nb, hash_key=7)
    manual = fingerprint_cat64(
        fingerprint_cat64(7, farmhash64("a")), farmhash64("b")
    ) % nb
    assert h == manual
    # int members feed their RAW value into the combine (TF SparseCross
    # int64 semantics) — NOT the decimal-string fingerprint
    assert cross_hash((5, "z"), nb) != cross_hash(("5", "z"), nb)
    assert cross_hash((5, "z"), nb) == (
        fingerprint_cat64(
            fingerprint_cat64(0xDECAFCAFFE, 5), farmhash64("z")
        ) % nb
    )


def test_cross_hash_matches_tf_ground_truth():
    """Golden values from installed TF 2.21 feature_column.crossed_column
    (hash_bucket_size=1000, default hash key): bit-exactness of the cross
    path is validated against REAL TF, not just self-consistency."""
    assert cross_hash(("u1", "x"), 1000) == 79
    assert cross_hash(("u2", "y"), 1000) == 195
    # identity(int) key crossed with a string key
    assert cross_hash((7, "z"), 1000) == 494


def test_dense_cross_oracle_and_engine():
    m = cross_model()
    batch = {
        "city": ["SF", "NYC", "SF"],
        "device": np.array([1, 2, 1], np.int64),
    }
    om = OracleModel(m)
    sp = om.column_ids(m.columns[0], batch)
    exp = [cross_hash(("SF", 1), 1000), cross_hash(("NYC", 2), 1000),
           cross_hash(("SF", 1), 1000)]
    np.testing.assert_array_equal(sp.values, exp)

    eng = Engine(m, EngineConfig(use_pallas=False))
    out = eng.predict(batch, return_pooled=True)
    ref = om.forward(batch)
    np.testing.assert_array_equal(
        out["pooled"]["city_x_device"], ref["pooled"]["city_x_device"]
    )


def test_list_cross_combinatorial():
    m = cross_model()
    batch = {
        "city": [["SF", "LA"], ["NYC"]],
        "device": [[1, 2], [3]],
    }
    om = OracleModel(m)
    sp = om.column_ids(m.columns[0], batch)
    # row 0: SF x {1,2}, LA x {1,2} = 4 crosses; row 1: 1
    np.testing.assert_array_equal(sp.row_ids, [0, 0, 0, 0, 1])
    exp0 = cross_hash(("SF", 1), 1000)
    assert sp.values[0] == exp0

    eng = Engine(m, EngineConfig(use_pallas=False))
    out = eng.predict(batch, return_pooled=True)
    ref = om.forward(batch)
    np.testing.assert_array_equal(
        out["pooled"]["city_x_device"], ref["pooled"]["city_x_device"]
    )


def test_cross_serde_roundtrip():
    m = cross_model()
    s = model_to_json(m)
    m2 = model_from_json(s)
    assert m2.columns[0].source.fields == ("city", "device")
    assert isinstance(m2.columns[0].transforms[0], CrossHash)
    assert model_to_json(m2) == s

import numpy as np
import pytest

from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.ir.spec import (
    Bucketize,
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    FilterRange,
    HashBucket,
    LookupSpec,
    ModelSpec,
    NumToId,
    SelectRange,
    TableSpec,
    TowerSpec,
    VocabLookup,
)
from recom_tpu.models import make_model_e, make_random_batch
from recom_tpu.oracle import OracleModel
from recom_tpu.oracle.hashing import farmhash64


def id_tower():
    return TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(), final_activation=None)


def simple_model(transforms, kind=FeatureKind.DENSE_FLOAT, vocab=10, dim=4,
                 combiner=Combiner.SUM, weight_field=None):
    tables = {"t": TableSpec("t", vocab, dim)}
    col = FeatureColumn(
        "c0", FeatureSource("x", kind), tuple(transforms),
        LookupSpec("t", combiner, weight_field=weight_field),
    )
    return ModelSpec("m", tables, [col], id_tower())


def test_bucketize_upper_bound_semantics():
    m = simple_model([Bucketize([0.0, 5.0, 10.0])])
    om = OracleModel(m)
    sp = om.column_ids(m.columns[0], {"x": np.array([-1.0, 0.0, 4.9, 5.0, 10.0, 11.0])})
    # TF Bucketize: id = count of boundaries <= x
    np.testing.assert_array_equal(sp.values, [0, 1, 1, 2, 3, 3])


def test_hash_bucket_string_and_sparse():
    m = simple_model([HashBucket(100)], kind=FeatureKind.STRING_LIST, vocab=100)
    om = OracleModel(m)
    sp = om.column_ids(m.columns[0], {"x": [["ab", "cd"], [], ["ef"]]})
    exp = [farmhash64(s) % 100 for s in ["ab", "cd", "ef"]]
    np.testing.assert_array_equal(sp.values, exp)
    np.testing.assert_array_equal(sp.row_ids, [0, 0, 2])


def test_vocab_lookup_oov_and_default():
    m = simple_model(
        [VocabLookup(["a", "b", "c"], num_oov=0, default=-1)],
        kind=FeatureKind.STRING_LIST, vocab=3,
    )
    om = OracleModel(m)
    sp = om.column_ids(m.columns[0], {"x": [["a", "zzz", "c"]]})
    np.testing.assert_array_equal(sp.values, [0, -1, 2])
    m2 = simple_model(
        [VocabLookup(["a", "b", "c"], num_oov=5)],
        kind=FeatureKind.STRING_LIST, vocab=8,
    )
    sp2 = OracleModel(m2).column_ids(m2.columns[0], {"x": [["zzz"]]})
    assert sp2.values[0] == 3 + farmhash64("zzz") % 5


def test_filter_and_select_ranges():
    m = simple_model(
        [NumToId(100), FilterRange(IntervalSet.closed(0, 9))],
        kind=FeatureKind.INT_LIST, vocab=100,
    )
    sp = OracleModel(m).column_ids(m.columns[0], {"x": [[1, 50, 3], [99]]})
    np.testing.assert_array_equal(sp.values, [1, 3])
    np.testing.assert_array_equal(sp.row_ids, [0, 0])

    m2 = simple_model(
        [NumToId(100), SelectRange(IntervalSet.closed(0, 9), substitute=0)],
        kind=FeatureKind.INT_LIST, vocab=100,
    )
    sp2 = OracleModel(m2).column_ids(m2.columns[0], {"x": [[1, 50, 3]]})
    np.testing.assert_array_equal(sp2.values, [1, 0, 3])


def test_safe_lookup_empty_rows_zero():
    m = simple_model([NumToId(10)], kind=FeatureKind.INT_LIST)
    om = OracleModel(m)
    out = om.pooled_outputs({"x": [[1, 2], [], [3]]})["c0"]
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out[1], np.zeros(4, np.float32))
    table = om.params["tables"]["t"]
    np.testing.assert_array_equal(out[0], table[1] + table[2])
    np.testing.assert_array_equal(out[2], table[3])


def test_negative_ids_pruned():
    # safe_embedding_lookup_sparse prunes ids < 0 (vocab default -1)
    m = simple_model(
        [VocabLookup(["a", "b"], default=-1)],
        kind=FeatureKind.STRING_LIST, vocab=2,
    )
    om = OracleModel(m)
    out = om.pooled_outputs({"x": [["zzz"], ["a", "qqq", "b"]]})["c0"]
    np.testing.assert_array_equal(out[0], np.zeros(4, np.float32))
    table = om.params["tables"]["t"]
    np.testing.assert_array_equal(out[1], table[0] + table[1])


def test_combiners():
    for combiner, denom in [
        (Combiner.SUM, 1.0), (Combiner.MEAN, 3.0), (Combiner.SQRTN, np.sqrt(3.0))
    ]:
        m = simple_model([NumToId(10)], kind=FeatureKind.INT_LIST,
                         combiner=combiner)
        om = OracleModel(m)
        out = om.pooled_outputs({"x": [[1, 2, 3]]})["c0"]
        t = om.params["tables"]["t"]
        exp = ((t[1] + t[2]) + t[3]) / np.float32(denom)
        np.testing.assert_array_equal(out[0], exp.astype(np.float32))


def test_weighted_lookup():
    m = simple_model([NumToId(10)], kind=FeatureKind.INT_LIST,
                     combiner=Combiner.MEAN, weight_field="w")
    om = OracleModel(m)
    out = om.pooled_outputs({"x": [[1, 2]], "w": [[2.0, 4.0]]})["c0"]
    t = om.params["tables"]["t"]
    exp = (t[1] * np.float32(2) + t[2] * np.float32(4)) / np.float32(6)
    np.testing.assert_array_equal(out[0], exp)


def test_model_e_scaled_end_to_end():
    m = make_model_e(scale=0.01)
    b = make_random_batch(m, 32, seed=3)
    out = OracleModel(m).forward(b)
    assert out["output"].shape == (32, 1)
    assert np.isfinite(out["concat"]).all()
    assert out["concat"].shape[1] == sum(
        m.tables[c.lookup.table].dim for c in m.embedding_columns
    ) + len(m.tower.bottom_mlp and [m.tower.bottom_mlp[-1]] or []) * m.tower.bottom_mlp[-1]


def test_validation_errors():
    with pytest.raises(ValueError):
        ModelSpec(
            "bad", {},
            [FeatureColumn("c", FeatureSource("x", FeatureKind.DENSE_FLOAT),
                           (), LookupSpec("missing"))],
        )

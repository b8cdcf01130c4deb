import numpy as np

from recom_tpu import Engine, EngineConfig
from recom_tpu.ir.serde import model_from_json, model_to_json
from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.ir.spec import (
    Combiner, FeatureColumn, FeatureKind, FeatureSource, FilterRange,
    LookupSpec, ModelSpec, SelectRange, TableSpec, TowerSpec, VocabLookup,
)
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.runtime.checkpoint import (
    export_params, load_checkpoint, save_checkpoint,
)

CFG = EngineConfig(use_pallas=False, persistent_compilation_cache=False)


def test_spec_json_roundtrip():
    m = make_dlrm_model(3, 1, 1, 1, 1, 2, [4], [8, 1], name="rt",
                        large_rows=1000)
    # add exotic transforms to cover serde paths
    m.columns.append(
        FeatureColumn(
            "vocab_col",
            FeatureSource("vc", FeatureKind.STRING_LIST),
            (VocabLookup(["a", "b"], num_oov=2),
             SelectRange(IntervalSet.closed(0, 3), 0),
             FilterRange(IntervalSet.closed(0, 2))),
            LookupSpec("emb_bucketize0", Combiner.SQRTN),
        )
    )
    s = model_to_json(m)
    m2 = model_from_json(s)
    assert model_to_json(m2) == s
    assert m2.columns[-1].transforms == m.columns[-1].transforms
    assert m2.spec_hash() == m.spec_hash()


def test_checkpoint_roundtrip(tmp_path):
    m = make_dlrm_model(2, 1, 1, 1, 0, 2, [4], [8, 1], name="ck")
    eng = Engine(m, CFG)
    b = make_random_batch(m, 16, seed=1)
    out1 = eng.predict(b, return_pooled=True)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, eng)
    m2, params = load_checkpoint(path)
    eng2 = Engine(m2, CFG, params=params)
    out2 = eng2.predict(b, return_pooled=True)

    np.testing.assert_array_equal(out1["output"], out2["output"])
    for c in out1["pooled"]:
        np.testing.assert_array_equal(out1["pooled"][c], out2["pooled"][c])


def test_export_params_slices_back():
    from recom_tpu.utils.params import init_model_params

    m = make_dlrm_model(2, 1, 1, 0, 0, 1, [2], [4], name="xp")
    np_params = init_model_params(m)
    eng = Engine(m, CFG, params=np_params)
    exported = export_params(eng)
    for t, arr in np_params["tables"].items():
        np.testing.assert_array_equal(exported["tables"][t], arr)

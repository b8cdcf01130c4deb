import numpy as np

from recom_tpu import Engine, EngineConfig
from recom_tpu.ir.serde import model_from_json, model_to_json
from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.ir.spec import (
    Combiner, FeatureColumn, FeatureKind, FeatureSource, FilterRange,
    FilterStrSentinel, HashBucket, LookupSpec, ModelSpec, SelectRange,
    TableSpec, TowerSpec, VocabLookup,
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
            (FilterStrSentinel("NA"),
             VocabLookup(["a", "b"], num_oov=2),
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


def test_npz_fallback_handles_slash_in_table_name(tmp_path):
    """Round-3 runtime review, finding 3: imported TF table names carry
    '/' (variable scopes).  The npz fallback's key parse must keep the
    WHOLE remainder as the table name — a bare split('/') loaded
    'tables/scope/emb' as tables['scope'] and then KeyError'd (or silently
    mis-mapped) at engine build."""
    import os

    m = ModelSpec(
        "slash",
        {"scope/emb": TableSpec("scope/emb", 32, 4)},
        [FeatureColumn(
            "c", FeatureSource("x", FeatureKind.DENSE_INT),
            (HashBucket(32),),
            LookupSpec("scope/emb", Combiner.MEAN),
        )],
        TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(4, 1),
                  final_activation=None),
    )
    eng = Engine(m, CFG)
    b = make_random_batch(m, 8, seed=4)
    out1 = eng.predict(b)

    path = str(tmp_path / "ck_slash")
    # force the npz fallback regardless of whether orbax is importable
    import recom_tpu.runtime.checkpoint as ck

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model_spec.json"), "w") as f:
        f.write(model_to_json(eng.model))
    params = export_params(eng)
    flat = {}
    for t, arr in params["tables"].items():
        flat[f"tables/{t}"] = arr
    for key, layers in params["tower"].items():
        for i, l in enumerate(layers):
            flat[f"tower/{key}/{i}/w"] = l["w"]
            flat[f"tower/{key}/{i}/b"] = l["b"]
    np.savez(os.path.join(path, "params.npz"), **flat)

    m2, params2 = load_checkpoint(path)
    assert "scope/emb" in params2["tables"]
    np.testing.assert_array_equal(
        params2["tables"]["scope/emb"], params["tables"]["scope/emb"]
    )
    eng2 = Engine(m2, CFG, params=params2)
    np.testing.assert_array_equal(eng2.predict(b)["output"], out1["output"])

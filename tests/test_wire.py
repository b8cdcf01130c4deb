"""Single-blob wire staging (runtime/wire.py): layout, packing, unpacking.

Contract: the wire path is a pure re-encoding — Engine outputs must be
BIT-IDENTICAL to the structured-array path for every column type, and the
device-side unpack must reproduce exactly the arrays host_prep builds.
"""

import numpy as np
import pytest

import jax

from recom_tpu import Engine, EngineConfig
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
)
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.runtime.host_prep import prepare_batch
from recom_tpu.runtime.wire import (
    _id_dtype,
    prepare_batch_wire,
    unpack_blob,
    wire_layout,
)
from recom_tpu.utils.params import init_model_params


def make_kitchen_sink():
    """Every wire-relevant column shape: bucketize (+LUT suffix), int/str
    hash, delimited sparse, weighted sparse, large-vocab sparse."""
    bz = Bucketize(list(range(0, 50, 5)))
    tables = {
        "t_bz": TableSpec("t_bz", 11, 8),
        "t_lut": TableSpec("t_lut", 11, 8),
        "t_int": TableSpec("t_int", 40, 8),
        "t_str": TableSpec("t_str", 5000, 8),
        "t_sp": TableSpec("t_sp", 5000, 8),
        "t_w": TableSpec("t_w", 120, 8),
        "t_sm": TableSpec("t_sm", 64, 8),
        "t_big": TableSpec("t_big", 1 << 20, 16),
    }
    cols = [
        FeatureColumn("bz", FeatureSource("bz", FeatureKind.DENSE_FLOAT),
                      (bz,), LookupSpec("t_bz", Combiner.MEAN)),
        FeatureColumn("lut", FeatureSource("lut", FeatureKind.DENSE_FLOAT),
                      (bz, FilterRange(IntervalSet.closed(2, 8)),
                       SelectRange(IntervalSet.closed(3, 7), 9)),
                      LookupSpec("t_lut", Combiner.SUM)),
        FeatureColumn("ih", FeatureSource("ih", FeatureKind.DENSE_INT),
                      (HashBucket(40),), LookupSpec("t_int", Combiner.MEAN)),
        FeatureColumn("sh", FeatureSource("sh", FeatureKind.STRING),
                      (HashBucket(5000),), LookupSpec("t_str", Combiner.MEAN)),
        FeatureColumn("sp", FeatureSource("sp", FeatureKind.STRING_LIST,
                                          delimiter=";"),
                      (HashBucket(5000),), LookupSpec("t_sp", Combiner.SUM)),
        FeatureColumn("w", FeatureSource("w", FeatureKind.INT_LIST),
                      (NumToId(120, default_id=0),),
                      LookupSpec("t_w", Combiner.MEAN, weight_field="w_wt")),
        FeatureColumn("sm", FeatureSource("sm", FeatureKind.INT_LIST),
                      (NumToId(64, default_id=0),),
                      LookupSpec("t_sm", Combiner.SOFTMAX,
                                 weight_field="sm_wt")),
        FeatureColumn("big", FeatureSource("big", FeatureKind.STRING_LIST,
                                           delimiter=";"),
                      (HashBucket(1 << 20),),
                      LookupSpec("t_big", Combiner.SQRTN)),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
        FeatureColumn("d1", FeatureSource("d1", FeatureKind.DENSE_FLOAT)),
        FeatureColumn("dv", FeatureSource("dv", FeatureKind.DENSE_FLOAT,
                                          width=3)),
    ]
    tower = TowerSpec(arch="mlp", bottom_mlp=(4,), top_mlp=(16, 1),
                      final_activation="sigmoid")
    return ModelSpec("sink", tables, cols, tower)


def _fix_weight_field(batch, model):
    # make_random_batch names the weight field via the spec already
    return batch


@pytest.mark.parametrize("host_bucketize", [True, False])
def test_wire_matches_structured_bitexact(host_bucketize):
    model = make_kitchen_sink()
    batch = make_random_batch(model, 37, seed=11)
    params = init_model_params(model)

    ref = Engine(
        model, EngineConfig(wire_pack=False), params=params
    ).predict(batch, return_pooled=True, return_concat=True)
    out = Engine(
        model,
        EngineConfig(wire_pack=True, host_bucketize=host_bucketize),
        params=params,
    ).predict(batch, return_pooled=True, return_concat=True)

    assert np.array_equal(out["output"], ref["output"])
    assert np.array_equal(out["concat"], ref["concat"])
    for k in ref["pooled"]:
        assert np.array_equal(out["pooled"][k], ref["pooled"][k]), k


def test_unpack_blob_reproduces_structured_arrays():
    model = make_kitchen_sink()
    batch = make_random_batch(model, 21, seed=3)
    # host_bucketize=False: same views both paths; device_hash=False: the
    # structured path has no verbatim-staging analogue, so the wire must
    # produce the PLAIN signature here
    cfg = EngineConfig(host_bucketize=False, device_hash=False)
    eng = Engine(model, cfg, params=init_model_params(model))
    structured = prepare_batch(eng.compiled, batch)
    wired = prepare_batch_wire(eng.compiled, batch)
    assert wired.signature == structured.signature
    bp, rowlens = wired.signature
    unpacked = jax.jit(
        lambda b: unpack_blob(eng.compiled, b, bp, rowlens)
    )(wired.arrays["blob"])
    assert np.array_equal(
        np.asarray(unpacked["dense"]), structured.arrays["dense"]
    )
    for got, want in zip(unpacked["groups"], structured.arrays["groups"]):
        assert set(got) == set(want)
        for k in want:
            g = np.asarray(got[k])
            # ids are widened to int32 on device; compare as int32
            assert np.array_equal(g, want[k].astype(g.dtype)), k


def test_id_dtype_selection():
    assert _id_dtype(-1, 100) == np.int8
    assert _id_dtype(-1, 127) == np.int8
    assert _id_dtype(-1, 128) == np.int16
    assert _id_dtype(-1, 32767) == np.int16
    assert _id_dtype(-1, 32768) == np.int32
    assert _id_dtype(-200, 50) == np.int16


def test_layout_dtypes_and_alignment():
    model = make_kitchen_sink()
    eng = Engine(model, EngineConfig(), params=init_model_params(model))
    layout = wire_layout(eng.compiled, 64, tuple(
        16 if g.ragged else 1 for g in eng.compiled.groups
    ), True)
    by = {}
    for v in layout.views:
        assert v.offset % 8 == 0
        by.setdefault(v.name, []).append(v)
    # bucketize ids fit int8 (K=10, LUT max 9); large vocab needs int32
    assert all(v.dtype == np.int8 for v in by["bz_ids"])
    dts = {v.dtype.itemsize for v in by["host_ids"]}
    assert 4 in dts        # 2^20 vocab group
    assert min(dts) <= 2   # small vocab groups travel narrow
    # blob is strictly smaller than the f32/int32 structured encoding
    structured_bytes = sum(
        int(np.prod(v.shape)) * 4 for v in layout.views
    )
    assert layout.total_bytes < structured_bytes


def test_wrong_rowlen_hint_recovers():
    model = make_kitchen_sink()
    params = init_model_params(model)
    eng = Engine(model, EngineConfig(), params=params)
    batch_long = make_random_batch(model, 16, seed=5, max_list_len=20)
    batch_short = make_random_batch(model, 16, seed=6, max_list_len=2)
    ref = Engine(model, EngineConfig(wire_pack=False), params=params)
    # seed hints with the short batch, then serve the long one (hint busts)
    for b in (batch_short, batch_long, batch_short):
        out = eng.predict(b)
        want = ref.predict(b)
        assert np.array_equal(out["output"], want["output"])


def test_wire_python_fallback_matches_native(monkeypatch):
    from recom_tpu.native import ops as native_ops

    model = make_dlrm_model(4, 2, 2, 2, 1, 3, [4], [8, 1], name="tiny",
                            large_rows=70_000)
    batch = make_random_batch(model, 19, seed=8)
    params = init_model_params(model)
    native = Engine(model, EngineConfig(), params=params).predict(batch)
    monkeypatch.setattr(native_ops, "get_lib", lambda: None)
    fallback = Engine(model, EngineConfig(), params=params).predict(batch)
    assert np.array_equal(native["output"], fallback["output"])


def test_empty_prepared_wire_compiles():
    from recom_tpu.runtime.wire import make_empty_prepared_wire

    model = make_kitchen_sink()
    eng = Engine(model, EngineConfig(), params=init_model_params(model))
    p = make_empty_prepared_wire(eng.compiled, 32)
    fn = eng._get_jitted(p.signature)
    out = fn(eng.device_params, p.arrays)
    assert np.asarray(out["output"]).shape[0] == 32


def test_wire_fast_run_offset_with_ragged_forced_hash_members():
    """Regression (round-3 runtime review, finding 1): a softmax-weighted
    scalar hash column (host class 0, forced into a RAGGED group) sorts
    BEFORE the delimited split members (class 2) in the host order, so the
    fast split-hash run starts at fast_lo > 0.  The packer used to write
    split ids into rows [0, n_fast), i.e. the hash member's rows —
    breaking the wire == structured bit-identical invariant."""
    tables = {
        "t_a": TableSpec("t_a", 40, 8),
        "t_b": TableSpec("t_b", 5000, 8),
    }
    cols = [
        FeatureColumn("hsm", FeatureSource("hsm", FeatureKind.DENSE_INT),
                      (HashBucket(40),),
                      LookupSpec("t_a", Combiner.SOFTMAX)),
        FeatureColumn("spl", FeatureSource("spl", FeatureKind.STRING_LIST,
                                           delimiter=";"),
                      (HashBucket(5000),), LookupSpec("t_b", Combiner.SUM)),
    ]
    model = ModelSpec(
        "fastlo", tables, cols,
        TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(8, 1),
                  final_activation=None),
    )
    batch = make_random_batch(model, 19, seed=23)
    params = init_model_params(model)

    ref = Engine(model, EngineConfig(wire_pack=False),
                 params=params).predict(batch, return_pooled=True)
    out = Engine(model, EngineConfig(wire_pack=True),
                 params=params).predict(batch, return_pooled=True)
    for k in ref["pooled"]:
        np.testing.assert_array_equal(out["pooled"][k], ref["pooled"][k])


@pytest.mark.parametrize("host_bucketize", [True, False])
def test_wire_device_hash_matches_structured_bitexact(host_bucketize):
    """device_hash staging (raw string bytes + on-device FarmHash) is a
    pure re-encoding too: outputs bit-identical to the structured path on
    the kitchen sink (fixed strings, delimited sparse incl. a 2^20-bucket
    column, weighted/softmax groups falling back to host)."""
    model = make_kitchen_sink()
    batch = make_random_batch(model, 37, seed=11)
    params = init_model_params(model)

    ref = Engine(
        model, EngineConfig(wire_pack=False), params=params
    ).predict(batch, return_pooled=True, return_concat=True)
    eng = Engine(
        model,
        EngineConfig(wire_pack=True, host_bucketize=host_bucketize,
                     device_hash=True),
        params=params,
    )
    out = eng.predict(batch, return_pooled=True, return_concat=True)

    assert np.array_equal(out["output"], ref["output"])
    assert np.array_equal(out["concat"], ref["concat"])
    for k in ref["pooled"]:
        assert np.array_equal(out["pooled"][k], ref["pooled"][k]), k
    # the staging actually engaged: some group ships raw bytes
    sig = eng.prepare(batch).signature
    assert len(sig) == 3 and any(ws or wd for ws, wd in sig[2]), sig


def test_wire_device_hash_long_piece_falls_back_to_host():
    """A request whose delimited pieces exceed the device kernel's 64-byte
    cap must route that group through host hashing (wd == 0) and still be
    bit-exact; a later normal request re-engages device hashing."""
    model = make_kitchen_sink()
    params = init_model_params(model)
    eng_ref = Engine(model, EngineConfig(wire_pack=False), params=params)
    eng = Engine(
        model, EngineConfig(wire_pack=True, device_hash=True), params=params
    )

    long_batch = make_random_batch(model, 16, seed=5)
    # 'big' lives in an unweighted ragged group (weighted groups stay on
    # host by design — their weights plane derives from host ids)
    long_batch["big"] = np.asarray(
        ["x" * 80 + ";yy", "ok;fine", "z" * 100] + ["a;b"] * 13, dtype="S"
    )
    prep = eng.prepare(long_batch)
    gi = next(
        i for i, g in enumerate(eng.compiled.groups)
        if any(m.column.name == "big" for m in g.members)
    )
    assert prep.wsig[gi][1] == 0, prep.wsig     # host fallback this request
    out = eng.predict(long_batch, return_pooled=True)
    ref = eng_ref.predict(long_batch, return_pooled=True)
    for k in ref["pooled"]:
        assert np.array_equal(out["pooled"][k], ref["pooled"][k]), k

    ok_batch = make_random_batch(model, 16, seed=6)
    prep2 = eng.prepare(ok_batch)
    assert prep2.wsig[gi][1] > 0, prep2.wsig    # device hashing re-engaged
    out2 = eng.predict(ok_batch, return_pooled=True)
    ref2 = eng_ref.predict(ok_batch, return_pooled=True)
    for k in ref2["pooled"]:
        assert np.array_equal(out2["pooled"][k], ref2["pooled"][k]), k

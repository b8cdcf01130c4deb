"""TF GraphDef importer tests.

TF is not installed in this environment, so tests synthesize GraphDef bytes
with a minimal protobuf writer emitting the same op/attr structure
tf.feature_column.input_layer produces (validated against the op inventory
the reference's extractors match on: Bucketize, StringToHashBucketFast,
StringSplit, SparseSegmentMean/Sum, GatherV2, VariableV2/Const,
ConcatV2)."""

import struct

import numpy as np

from recom_tpu.importers import protowire as pw
from recom_tpu.importers.tf_graph import import_tf_graphdef
from recom_tpu.ir.spec import Bucketize, Combiner, FeatureKind, HashBucket


# --------------- GraphDef writer helpers (TF wire format) -------------------

DT_FLOAT, DT_INT32, DT_STRING, DT_INT64 = 1, 3, 7, 9


def attr_entry(key: str, value: bytes) -> bytes:
    return pw.field_bytes(1, key.encode()) + pw.field_bytes(2, value)


def av_type(t: int) -> bytes:
    return pw.field_varint(6, t)


def av_int(i: int) -> bytes:
    return pw.field_varint(3, i)


def av_float_list(vals) -> bytes:
    packed = b"".join(struct.pack("<f", v) for v in vals)
    lst = pw.field_bytes(4, packed)  # ListValue.f packed
    return pw.field_bytes(1, lst)


def av_shape(dims) -> bytes:
    shape = b"".join(
        pw.field_bytes(2, pw.field_varint(1, d)) for d in dims
    )
    return pw.field_bytes(7, shape)


def av_tensor_float(arr: np.ndarray) -> bytes:
    t = pw.field_varint(1, DT_FLOAT)
    shape = b"".join(
        pw.field_bytes(2, pw.field_varint(1, d)) for d in arr.shape
    )
    t += pw.field_bytes(2, shape)
    t += pw.field_bytes(4, arr.astype("<f4").tobytes())
    return pw.field_bytes(8, t)


def av_tensor_string(s: str) -> bytes:
    t = pw.field_varint(1, DT_STRING)
    t += pw.field_bytes(2, b"")  # scalar shape
    t += pw.field_bytes(8, s.encode())  # string_val
    return pw.field_bytes(8, t)


def node(name, op, inputs=(), **attrs) -> bytes:
    body = pw.field_bytes(1, name.encode()) + pw.field_bytes(2, op.encode())
    for i in inputs:
        body += pw.field_bytes(3, i.encode())
    for k, v in attrs.items():
        body += pw.field_bytes(5, attr_entry(k, v))
    return pw.field_bytes(1, body)  # GraphDef.node


def make_reference_style_graph():
    """2 bucketize cols + 1 string-hash + 1 sparse-split-hash + 1 dense,
    frozen Const tables, input_layer ConcatV2."""
    rng = np.random.default_rng(0)
    g = b""
    concat_inputs = []
    tables = {}

    for i in range(2):  # bucketized columns
        f = f"bucketize{i}"
        tbl = rng.standard_normal((11, 4)).astype(np.float32)
        tables[f"emb_{f}"] = tbl
        g += node(f, "Placeholder", dtype=av_type(DT_FLOAT))
        g += node(f"{f}/Bucketize", "Bucketize", [f],
                  boundaries=av_float_list([float(x) for x in range(0, 50, 5)]))
        g += node(f"emb_{f}", "Const", value=av_tensor_float(tbl))
        g += node(f"{f}/GatherV2", "GatherV2",
                  [f"emb_{f}", f"{f}/Bucketize", f"{f}/axis"])
        g += node(f"{f}/SparseSegmentMean", "SparseSegmentMean",
                  [f"emb_{f}", f"{f}/Bucketize", f"{f}/segs"])
        concat_inputs.append(f"{f}/SparseSegmentMean")

    # string hash column
    tbl = rng.standard_normal((100, 4)).astype(np.float32)
    tables["emb_shash"] = tbl
    g += node("shash", "Placeholder", dtype=av_type(DT_STRING))
    g += node("shash/Hash", "StringToHashBucketFast", ["shash"],
              num_buckets=av_int(100))
    g += node("emb_shash", "Const", value=av_tensor_float(tbl))
    g += node("shash/SparseSegmentMean", "SparseSegmentMean",
              ["emb_shash", "shash/Hash", "shash/segs"])
    concat_inputs.append("shash/SparseSegmentMean")

    # delimited sparse column (sum combiner)
    tbl = rng.standard_normal((200, 4)).astype(np.float32)
    tables["emb_sparse"] = tbl
    g += node("sparse", "Placeholder", dtype=av_type(DT_STRING))
    g += node("sparse/delim", "Const", value=av_tensor_string(";"))
    g += node("sparse/Split", "StringSplit", ["sparse", "sparse/delim"])
    g += node("sparse/Hash", "StringToHashBucketFast", ["sparse/Split:1"],
              num_buckets=av_int(200))
    g += node("emb_sparse", "Const", value=av_tensor_float(tbl))
    g += node("sparse/SparseSegmentSum", "SparseSegmentSum",
              ["emb_sparse", "sparse/Hash", "sparse/segs"])
    concat_inputs.append("sparse/SparseSegmentSum")

    # dense passthrough
    g += node("dense0", "Placeholder", dtype=av_type(DT_FLOAT))
    concat_inputs.append("dense0")

    g += node("concat/axis", "Const")
    g += node("input_layer/concat", "ConcatV2",
              concat_inputs + ["concat/axis"], N=av_int(len(concat_inputs)))
    return g, tables


def test_import_reference_style_graph():
    data, expected_tables = make_reference_style_graph()
    model, weights = import_tf_graphdef(data, name="imp")

    by_name = {c.name: c for c in model.columns}
    assert set(by_name) == {"bucketize0", "bucketize1", "shash", "sparse",
                            "dense0"}

    b0 = by_name["bucketize0"]
    assert isinstance(b0.transforms[0], Bucketize)
    assert b0.transforms[0].boundaries == tuple(float(x) for x in range(0, 50, 5))
    assert b0.source.kind == FeatureKind.DENSE_FLOAT
    assert b0.lookup.combiner == Combiner.MEAN

    sh = by_name["shash"]
    assert isinstance(sh.transforms[0], HashBucket)
    assert sh.transforms[0].num_buckets == 100
    assert sh.source.kind == FeatureKind.STRING

    sp = by_name["sparse"]
    assert sp.source.kind == FeatureKind.STRING_LIST
    assert sp.source.delimiter == ";"
    assert sp.lookup.combiner == Combiner.SUM
    assert sp.transforms[0].num_buckets == 200

    assert by_name["dense0"].lookup is None

    for t, arr in expected_tables.items():
        np.testing.assert_array_equal(weights[t], arr)
        assert model.tables[t].vocab_size == arr.shape[0]
        assert model.tables[t].dim == arr.shape[1]


def test_imported_model_serves():
    """Imported spec + frozen weights run through the engine vs oracle."""
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.oracle import OracleModel
    from recom_tpu.utils.params import init_model_params

    data, _tables = make_reference_style_graph()
    model, weights = import_tf_graphdef(data, name="imp")
    params = init_model_params(model)
    params["tables"].update(weights)  # frozen weights override random init

    batch = {
        "bucketize0": np.array([1.0, 7.0, 100.0], np.float32),
        "bucketize1": np.array([0.0, 5.0, 44.9], np.float32),
        "shash": np.array(["a", "bb", "ccc"], dtype="S"),
        "sparse": np.array(["x;y", "", "z"], dtype="S"),
        "dense0": np.array([0.5, 1.5, 2.5], np.float32),
    }
    eng = Engine(model, EngineConfig(use_pallas=False), params=params)
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = OracleModel(model, params=params).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    np.testing.assert_array_equal(out["concat"], ref["concat"])


def test_no_concat_raises():
    g = node("x", "Placeholder", dtype=av_type(DT_FLOAT))
    try:
        import_tf_graphdef(g)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "ConcatV2" in str(e)


def av_tensor_int64_scalar(v: int) -> bytes:
    t = pw.field_varint(1, DT_INT64)
    t += pw.field_bytes(2, b"")              # scalar shape
    t += pw.field_varint(10, v & ((1 << 64) - 1))  # int64_val
    return pw.field_bytes(8, t)


def test_import_prelookup_filter_and_select_patterns():
    """The reference PreLookupOptimizer's Where+Gather filter and Select
    substitution idioms (pre_lookup_optimizer.cc:25-123) must import as
    FilterRange/SelectRange interval transforms."""
    from recom_tpu.ir.intervals import IntervalSet
    from recom_tpu.ir.spec import FilterRange, SelectRange

    rng = np.random.default_rng(0)
    g = b""
    concat_inputs = []

    # column A: hash -> filter(ids > 10 AND ids <= 90) via Where+GatherV2
    tbl = rng.standard_normal((100, 4)).astype(np.float32)
    g += node("colA", "Placeholder", dtype=av_type(DT_STRING))
    g += node("colA/Hash", "StringToHashBucketFast", ["colA"],
              num_buckets=av_int(100))
    g += node("colA/c10", "Const", value=av_tensor_int64_scalar(10))
    g += node("colA/c90", "Const", value=av_tensor_int64_scalar(90))
    g += node("colA/gt", "Greater", ["colA/Hash", "colA/c10"])
    g += node("colA/le", "LessEqual", ["colA/Hash", "colA/c90"])
    g += node("colA/and", "LogicalAnd", ["colA/gt", "colA/le"])
    g += node("colA/Where", "Where", ["colA/and"])
    g += node("colA/GatherV2", "GatherV2",
              ["colA/Hash", "colA/Where", "colA/axis"])
    g += node("emb_colA", "Const", value=av_tensor_float(tbl))
    g += node("colA/SparseSegmentMean", "SparseSegmentMean",
              ["emb_colA", "colA/GatherV2", "colA/segs"])
    concat_inputs.append("colA/SparseSegmentMean")

    # column B: hash -> Select(ids < 50, ids, 0)
    tbl2 = rng.standard_normal((64, 4)).astype(np.float32)
    g += node("colB", "Placeholder", dtype=av_type(DT_STRING))
    g += node("colB/Hash", "StringToHashBucketFast", ["colB"],
              num_buckets=av_int(64))
    g += node("colB/c50", "Const", value=av_tensor_int64_scalar(50))
    g += node("colB/lt", "Less", ["colB/Hash", "colB/c50"])
    g += node("colB/zero", "Const", value=av_tensor_int64_scalar(0))
    g += node("colB/Select", "Select",
              ["colB/lt", "colB/Hash", "colB/zero"])
    g += node("emb_colB", "Const", value=av_tensor_float(tbl2))
    g += node("colB/SparseSegmentMean", "SparseSegmentMean",
              ["emb_colB", "colB/Select", "colB/segs"])
    concat_inputs.append("colB/SparseSegmentMean")

    # need >5 concat inputs? find_output_concat heuristic — pad with more
    for i in range(4):
        g += node(f"dense{i}", "Placeholder", dtype=av_type(DT_FLOAT))
        concat_inputs.append(f"dense{i}")

    g += node("concat/axis", "Const")
    g += node("input_layer/concat", "ConcatV2",
              concat_inputs + ["concat/axis"], N=av_int(len(concat_inputs)))

    model, weights = import_tf_graphdef(g, name="flt")
    by_name = {c.name: c for c in model.columns}

    a = by_name["colA"]
    assert isinstance(a.transforms[0], HashBucket)
    filt = [t for t in a.transforms if isinstance(t, FilterRange)]
    assert len(filt) == 1
    assert filt[0].keep == IntervalSet.closed(11, 90)

    b = by_name["colB"]
    sel = [t for t in b.transforms if isinstance(t, SelectRange)]
    assert len(sel) == 1
    assert sel[0].keep == IntervalSet.lt(50)
    assert sel[0].substitute == 0

    # semantics survive end to end: engine vs oracle on the imported model
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.oracle import OracleModel
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(model)
    for t, w in weights.items():
        params["tables"][t] = w
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(32,)),
                 params=params)
    batch = {
        "colA": np.asarray([f"u{i}" for i in range(20)]),
        "colB": np.asarray([f"v{i}" for i in range(20)]),
        **{f"dense{i}": rng.standard_normal(20) for i in range(4)},
    }
    out = eng.predict(batch, return_pooled=True)
    ref = OracleModel(model, params=params).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


def _bucketize_slot_graph(inject_mul: bool = False, residue_op: str = None):
    """One bucketize column (+5 dense pads for the concat heuristic);
    optionally with a Mul(2.0) between the placeholder and the Bucketize
    (the compute a presence-based matcher would silently drop), or with a
    ``residue_op`` node hanging off the id chain."""
    rng = np.random.default_rng(0)
    g = b""
    concat_inputs = []
    tbl = rng.standard_normal((11, 4)).astype(np.float32)
    g += node("bz", "Placeholder", dtype=av_type(DT_FLOAT))
    src = "bz"
    if inject_mul:
        g += node("bz/two", "Const",
                  value=av_tensor_float(np.asarray(2.0, np.float32)))
        g += node("bz/Mul", "Mul", ["bz", "bz/two"], T=av_type(DT_FLOAT))
        src = "bz/Mul"
    g += node("bz/Bucketize", "Bucketize", [src],
              boundaries=av_float_list([float(x) for x in range(0, 50, 5)]))
    ids = "bz/Bucketize"
    if residue_op:
        g += node("bz/odd", residue_op, [ids])
        ids = "bz/odd"
    g += node("emb_bz", "Const", value=av_tensor_float(tbl))
    g += node("bz/SparseSegmentMean", "SparseSegmentMean",
              ["emb_bz", ids, "bz/segs"])
    concat_inputs.append("bz/SparseSegmentMean")
    for i in range(5):
        g += node(f"dense{i}", "Placeholder", dtype=av_type(DT_FLOAT))
        concat_inputs.append(f"dense{i}")
    g += node("concat/axis", "Const")
    g += node("input_layer/concat", "ConcatV2",
              concat_inputs + ["concat/axis"], N=av_int(len(concat_inputs)))
    return g


def test_compute_before_anchor_compiles_to_host_eval():
    """Placeholder -> Mul(2.0) -> Bucketize contains 'Bucketize', but
    importing it as Bucketize(placeholder) would silently drop the Mul
    (ADVICE r02: presence-based matching loophole).  The value-path check
    catches it, and the Mul compiles into a HostEvalChain so the column
    serves with TF semantics instead of raising."""
    from recom_tpu.ir.spec import HostEvalChain

    g = _bucketize_slot_graph(inject_mul=True)
    model, _ = import_tf_graphdef(g, name="m", strict=True)
    (col,) = model.embedding_columns
    assert isinstance(col.transforms[0], HostEvalChain)
    assert col.transforms[0].steps == (("mul", 2.0, "f32"),)
    assert isinstance(col.transforms[1], Bucketize)
    assert any("host evaluator" in w for w in model.import_warnings)
    # and the oracle/engine actually evaluate it: x=6 -> 12 -> bucket 3
    from recom_tpu.oracle import OracleModel
    import recom_tpu.utils.params as up

    params = up.init_model_params(model)
    oracle = OracleModel(model, params=params)
    batch = {"bz": np.asarray([6.0, 100.0, -3.0], np.float32)}
    for i in range(5):
        batch[f"dense{i}"] = np.zeros(3, np.float32)
    pooled = oracle.pooled_outputs(batch)["bz"]
    tbl = params["tables"]["emb_bz"]
    np.testing.assert_array_equal(pooled[0], tbl[3])   # 12.0 -> bucket 3
    np.testing.assert_array_equal(pooled[1], tbl[10])  # 200 -> clamp top
    np.testing.assert_array_equal(pooled[2], tbl[0])   # -6 -> bucket 0


def test_strict_rejects_uncompilable_compute_before_anchor():
    """Compute the host evaluator can't express (Square has no const
    operand) still raises under strict."""
    rng = np.random.default_rng(0)
    g = b""
    concat_inputs = []
    tbl = rng.standard_normal((11, 4)).astype(np.float32)
    g += node("bz", "Placeholder", dtype=av_type(DT_FLOAT))
    g += node("bz/Sq", "Square", ["bz"], T=av_type(DT_FLOAT))
    g += node("bz/Bucketize", "Bucketize", ["bz/Sq"],
              boundaries=av_float_list([float(x) for x in range(0, 50, 5)]))
    g += node("emb_bz", "Const", value=av_tensor_float(tbl))
    g += node("bz/SparseSegmentMean", "SparseSegmentMean",
              ["emb_bz", "bz/Bucketize", "bz/segs"])
    concat_inputs.append("bz/SparseSegmentMean")
    for i in range(5):
        g += node(f"dense{i}", "Placeholder", dtype=av_type(DT_FLOAT))
        concat_inputs.append(f"dense{i}")
    g += node("concat/axis", "Const")
    g += node("input_layer/concat", "ConcatV2",
              concat_inputs + ["concat/axis"], N=av_int(len(concat_inputs)))
    try:
        import_tf_graphdef(g, name="m", strict=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "value path" in str(e) or "Square" in str(e)
    model, _ = import_tf_graphdef(g, name="m", strict=False)
    assert any("value path" in w or "Square" in w
               for w in model.import_warnings)


def test_strict_rejects_residue_ops():
    """A recognized chain carrying an op outside the measured
    feature-column vocabulary (here Softplus) must raise under strict."""
    g = _bucketize_slot_graph(residue_op="Softplus")
    try:
        import_tf_graphdef(g, name="m", strict=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "Softplus" in str(e)
    model, _ = import_tf_graphdef(g, name="m", strict=False)
    assert any("Softplus" in w for w in model.import_warnings)


def test_clean_graph_still_imports_under_strict():
    g = _bucketize_slot_graph()
    model, _ = import_tf_graphdef(g, name="m", strict=True)
    assert len(model.embedding_columns) == 1
    assert isinstance(model.embedding_columns[0].transforms[0], Bucketize)

"""Import fidelity against a REAL TensorFlow graph.

Builds the reference's deployment artifact for real — a frozen TF1-style
feature-column graph (tf.compat.v1.feature_column.input_layer over
bucketized / hash-bucket / numeric columns, variables frozen to Consts,
exactly what examples/python/dlrm.py produces for the reference benchmark)
— then imports it with recom_tpu's TF-free importer and checks the engine
reproduces the TF session's own output BIT-exactly.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
tf = pytest.importorskip("tensorflow")

from recom_tpu import Engine, EngineConfig
from recom_tpu.importers.tf_graph import import_tf_graphdef
from recom_tpu.utils.params import init_model_params


def _build_frozen_graph():
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        cols = []
        feats = {}
        # two bucketized embedding columns
        for i in range(2):
            name = f"bz{i}"
            feats[name] = tf1.placeholder(tf.float32, [None], name=name)
            num = fc.numeric_column(name)
            bz = fc.bucketized_column(
                num, boundaries=[float(x) for x in range(0, 50, 5)]
            )
            cols.append(fc.embedding_column(bz, dimension=4, combiner="mean"))
        # string hash column
        feats["sh"] = tf1.placeholder(tf.string, [None], name="sh")
        cat = fc.categorical_column_with_hash_bucket("sh", 64)
        cols.append(fc.embedding_column(cat, dimension=4, combiner="mean"))
        # int hash column
        feats["ih"] = tf1.placeholder(tf.int64, [None], name="ih")
        cati = fc.categorical_column_with_hash_bucket(
            "ih", 32, dtype=tf.int64
        )
        cols.append(fc.embedding_column(cati, dimension=4, combiner="mean"))
        # dense passthrough
        feats["dn"] = tf1.placeholder(tf.float32, [None], name="dn")
        cols.append(fc.numeric_column("dn"))

        out = tf1.feature_column.input_layer(
            {k: tf.reshape(v, [-1, 1]) if v.dtype != tf.string
             else tf.reshape(v, [-1, 1]) for k, v in feats.items()},
            cols,
        )
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(0)
            feed = {
                feats["bz0"]: rng.uniform(-5, 55, 16),
                feats["bz1"]: rng.uniform(-5, 55, 16),
                feats["sh"]: np.asarray(
                    ["s%d" % v for v in rng.integers(0, 10**6, 16)]
                ),
                feats["ih"]: rng.integers(0, 10**9, 16),
                feats["dn"]: rng.standard_normal(16).astype(np.float32),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    batch = {
        "bz0": feed[feats["bz0"]],
        "bz1": feed[feats["bz1"]],
        "sh": feed[feats["sh"]],
        "ih": feed[feats["ih"]],
        "dn": feed[feats["dn"]],
    }
    return frozen.SerializeToString(), batch, want


def test_import_real_frozen_feature_column_graph():
    data, batch, want = _build_frozen_graph()
    model, weights = import_tf_graphdef(data, name="real")

    # field names come from placeholders; rename batch keys accordingly
    by_field = {c.source.field for c in model.columns}
    feed = {}
    for k, v in batch.items():
        matches = [f for f in by_field if f == k or f.startswith(k)]
        assert matches, f"imported model lost feature {k}: {by_field}"
        feed[matches[0]] = v

    params = init_model_params(model)
    for t, w in weights.items():
        params["tables"][t] = w
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=params)
    out = eng.predict(feed, return_concat=True, return_pooled=True)

    # TF input_layer orders the concat alphabetically by feature-column
    # name (dense interleaved); our concat is [dense..., embeddings...].
    # Compare per COLUMN: every value must be bit-exact.
    tf_order = sorted(
        [("bz0", 4), ("bz1", 4), ("dn", 1), ("ih", 4), ("sh", 4)]
    )
    off = 0
    tf_slices = {}
    for name, width in tf_order:
        tf_slices[name] = want[:, off : off + width]
        off += width
    assert off == want.shape[1]

    np.testing.assert_array_equal(
        out["concat"][:, :1], tf_slices["dn"], err_msg="dn"
    )
    for col in model.embedding_columns:
        np.testing.assert_array_equal(
            out["pooled"][col.name], tf_slices[col.source.field],
            err_msg=col.name,
        )


def test_import_real_sparse_split_and_cross_graph():
    """The reference's dlrm.py builds sparse-string and crossed columns by
    hand (string_split -> hash -> safe_embedding_lookup_sparse; SparseCross
    hashed) rather than via input_layer.  Build those idioms in a real TF1
    graph, freeze, import, and match TF's output bit-exactly."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(1)
        # delimited sparse string column, mean combiner
        sp_in = tf1.placeholder(tf.string, [None], name="tags")
        sp = tf1.string_split(sp_in, sep=";")
        ids = tf.sparse.SparseTensor(
            sp.indices,
            tf.strings.to_hash_bucket_fast(sp.values, 128),
            sp.dense_shape,
        )
        table1 = tf1.get_variable(
            "emb_tags", shape=[128, 4],
            initializer=tf1.random_normal_initializer(seed=1),
        )
        pooled1 = tf.nn.safe_embedding_lookup_sparse(
            table1, ids, combiner="mean", default_id=None, name="tags_pool"
        )

        # hashed cross of two dense string features
        a_in = tf1.placeholder(tf.string, [None], name="ca")
        b_in = tf1.placeholder(tf.string, [None], name="cb")
        a2 = tf.reshape(a_in, [-1, 1])
        b2 = tf.reshape(b_in, [-1, 1])
        spa = tf.sparse.from_dense(a2)
        spb = tf.sparse.from_dense(b2)
        crossed = tf.raw_ops.SparseCross(
            indices=[spa.indices, spb.indices],
            values=[spa.values, spb.values],
            shapes=[spa.dense_shape, spb.dense_shape],
            dense_inputs=[],
            hashed_output=True, num_buckets=256, hash_key=0xDECAFCAFFE,
            out_type=tf.int64, internal_type=tf.string,
        )
        cross_sp = tf.sparse.SparseTensor(
            crossed.output_indices, crossed.output_values,
            crossed.output_shape,
        )
        table2 = tf1.get_variable(
            "emb_cross", shape=[256, 4],
            initializer=tf1.random_normal_initializer(seed=2),
        )
        pooled2 = tf.nn.safe_embedding_lookup_sparse(
            table2, cross_sp, combiner="mean", default_id=None,
            name="cross_pool",
        )
        out = tf.concat([pooled1, pooled2], axis=1, name="out")

        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed = {
                sp_in: np.asarray(
                    [";".join("t%d" % v
                              for v in rng.integers(0, 10**5,
                                                    rng.integers(0, 5)))
                     for _ in range(12)]
                ),
                a_in: np.asarray(["a%d" % v for v in rng.integers(0, 99, 12)]),
                b_in: np.asarray(["b%d" % v for v in rng.integers(0, 99, 12)]),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    model, weights = import_tf_graphdef(frozen.SerializeToString(),
                                        name="sparse_cross")
    kinds = {c.name: c for c in model.columns}
    assert any(
        c.source.kind.name == "STRING_LIST" for c in model.columns
    ), kinds
    assert any(
        c.source.kind.name == "CROSS" for c in model.columns
    ), kinds

    params = init_model_params(model)
    for t, w in weights.items():
        params["tables"][t] = w
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=params)
    batch = {
        "tags": feed[sp_in],
        "ca": feed[a_in],
        "cb": feed[b_in],
    }
    out2 = eng.predict(batch, return_pooled=True)
    sparse_col = next(c for c in model.columns
                      if c.source.kind.name == "STRING_LIST")
    cross_col = next(c for c in model.columns
                     if c.source.kind.name == "CROSS")
    np.testing.assert_array_equal(
        out2["pooled"][sparse_col.name], want[:, :4], err_msg="sparse"
    )
    np.testing.assert_array_equal(
        out2["pooled"][cross_col.name], want[:, 4:], err_msg="cross"
    )


def _build_vocab_weighted_tower_graph():
    """Frozen graph covering VERDICT r01 importer gaps: vocabulary-list
    columns (with OOV buckets / default_value / int keys), a weighted
    categorical column, and a frozen dense tower after the concat."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        feats = {}
        cols = []
        feats["vc"] = tf1.placeholder(tf.string, [None], name="vc")
        cols.append(fc.embedding_column(
            fc.categorical_column_with_vocabulary_list(
                "vc", ["apple", "banana", "cherry"], num_oov_buckets=2),
            dimension=4, combiner="mean"))
        feats["vd"] = tf1.placeholder(tf.string, [None], name="vd")
        cols.append(fc.embedding_column(
            fc.categorical_column_with_vocabulary_list(
                "vd", ["x", "y", "z"], default_value=1),
            dimension=4, combiner="sum"))
        feats["vi"] = tf1.placeholder(tf.int64, [None], name="vi")
        cols.append(fc.embedding_column(
            fc.categorical_column_with_vocabulary_list(
                "vi", [5, 17, 42], dtype=tf.int64, num_oov_buckets=1),
            dimension=4, combiner="mean"))
        feats["wc"] = tf1.placeholder(tf.string, [None], name="wc")
        feats["wt"] = tf1.placeholder(tf.float32, [None], name="wt")
        cols.append(fc.embedding_column(
            fc.weighted_categorical_column(
                fc.categorical_column_with_hash_bucket("wc", 50), "wt"),
            dimension=4, combiner="mean"))
        feats["dn"] = tf1.placeholder(tf.float32, [None], name="dn")
        cols.append(fc.numeric_column("dn"))

        reshaped = {k: tf.reshape(v, [-1, 1]) for k, v in feats.items()}
        concat = tf1.feature_column.input_layer(reshaped, cols)
        rng_w = np.random.default_rng(9)
        in_dim = 17           # 1 dense + 4 embeddings x 4
        w1 = tf1.get_variable(
            "l1/w", initializer=rng_w.standard_normal(
                (in_dim, 16)).astype(np.float32))
        b1 = tf1.get_variable(
            "l1/b", initializer=rng_w.standard_normal(16).astype(np.float32))
        w2 = tf1.get_variable(
            "l2/w", initializer=rng_w.standard_normal(
                (16, 1)).astype(np.float32))
        b2 = tf1.get_variable(
            "l2/b", initializer=rng_w.standard_normal(1).astype(np.float32))
        h = tf.nn.relu(tf.nn.bias_add(tf.matmul(concat, w1), b1))
        logits = tf.nn.bias_add(tf.matmul(h, w2), b2)
        out = tf.sigmoid(logits, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            sess.run(tf1.tables_initializer())
            rng = np.random.default_rng(5)
            feed = {
                feats["vc"]: np.asarray(
                    ["apple", "nope", "cherry", "banana", "zz", "apple",
                     "qq", "banana"]),
                feats["vd"]: np.asarray(
                    ["x", "huh", "z", "y", "x", "nope", "z", "y"]),
                feats["vi"]: np.asarray([5, 9, 42, 17, 5, 123, 42, 17]),
                feats["wc"]: np.asarray(
                    ["a%d" % v for v in rng.integers(0, 10**6, 8)]),
                feats["wt"]: rng.uniform(0.1, 3.0, 8).astype(np.float32),
                feats["dn"]: rng.standard_normal(8).astype(np.float32),
            }
            want_concat, want_out = sess.run([concat, out], feed)
            # keep table initializers in the frozen graph (the deployment
            # convention: a frozen graph with lookup tables must retain
            # its init ops or TF itself cannot run it) — the importer
            # reads vocab keys/values from the kept Import op
            init_op = tf1.tables_initializer()
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out", init_op.name.split(":")[0]])
    batch = {ph.name.split(":")[0].rsplit("/")[-1]: v
             for ph, v in feed.items()}
    return frozen.SerializeToString(), batch, want_concat, want_out


def test_import_vocab_weighted_and_tower_vs_real_tf():
    from recom_tpu.importers.tf_graph import import_params
    from recom_tpu.ir.spec import VocabLookup

    data, batch, want_concat, want_out = _build_vocab_weighted_tower_graph()
    model, weights = import_tf_graphdef(data, name="vw")

    # structural checks: vocab transforms + weighted column + tower
    by_field = {c.source.field: c for c in model.columns}
    vc = next(c for f, c in by_field.items() if f.startswith("vc"))
    vl = vc.transforms[0]
    assert isinstance(vl, VocabLookup)
    assert vl.vocab == ("apple", "banana", "cherry") and vl.num_oov == 2
    vd = next(c for f, c in by_field.items() if f.startswith("vd"))
    assert vd.transforms[0].num_oov == 0
    assert vd.transforms[0].default == 1
    vi = next(c for f, c in by_field.items() if f.startswith("vi"))
    assert vi.transforms[0].vocab == (5, 17, 42)
    wc = next(c for f, c in by_field.items() if f.startswith("wc"))
    assert wc.lookup.weight_field is not None
    assert model.tower.top_mlp == (16, 1)
    assert model.tower.final_activation == "sigmoid"
    assert getattr(model, "imported_tower_params", None) is not None

    # rename feed keys to imported field names ("wt" is the weight feed,
    # not a column field — it rides on wc.lookup.weight_field)
    feed = {}
    for k, v in batch.items():
        if k == "wt":
            continue
        matches = [f for f in by_field if f == k or f.rsplit("/")[-1] == k
                   or f.startswith(k)]
        assert matches, f"lost feature {k}"
        feed[matches[0]] = v
    feed[wc.lookup.weight_field] = batch["wt"]

    params = import_params(model, weights)
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=params)
    out = eng.predict(feed, return_concat=True)

    # per-column slices of TF's (alphabetical) input_layer concat must be
    # bit-exact; the tower output must match to float tolerance
    tf_order = sorted(
        [("dn", 1), ("vc", 4), ("vd", 4), ("vi", 4), ("wc", 4)]
    )
    off = 0
    tf_slices = {}
    for nm, width in tf_order:
        tf_slices[nm] = want_concat[:, off:off + width]
        off += width
    assert off == want_concat.shape[1]
    # ours: [dense..., embeddings in import order]
    ours = {"dn": out["concat"][:, :1]}
    o = 1
    for c in model.embedding_columns:
        w = model.tables[c.lookup.table].dim
        key = c.source.field.rsplit("/")[-1][:2]
        ours[key] = out["concat"][:, o:o + w]
        o += w
    for nm in ("dn", "vc", "vd", "vi", "wc"):
        np.testing.assert_array_equal(ours[nm], tf_slices[nm], err_msg=nm)
    np.testing.assert_allclose(
        out["output"], want_out, rtol=1e-5, atol=1e-6
    )


def test_identity_categorical_imports_strict_and_bitexact():
    """categorical_column_with_identity (ids used raw, no hash/bucketize/
    vocab) imports under STRICT mode — safe because the id value path is
    verified to reach the placeholder through value-preserving ops only —
    and serves bit-exact vs the TF session."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        a = tf1.placeholder(tf.int64, [None], name="a")
        b = tf1.placeholder(tf.int64, [None], name="b")
        cols = [
            fc.embedding_column(
                fc.categorical_column_with_identity("a", 100), 4),
            fc.embedding_column(
                fc.categorical_column_with_identity("b", 100), 4),
        ]
        out = tf1.feature_column.input_layer(
            {"a": tf.reshape(a, [-1, 1]), "b": tf.reshape(b, [-1, 1])},
            cols)
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(12)
            feed = {a: rng.integers(0, 100, 16), b: rng.integers(0, 100, 16)}
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="ident", strict=True
    )
    assert len(model.embedding_columns) == 2
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=import_params(model, weights))
    cols_by_field = {c.source.field: c for c in model.embedding_columns}
    out2 = eng.predict(
        {f: feed[ph] for f, ph in
         zip(sorted(cols_by_field), [a, b])},
        return_pooled=True,
    )["pooled"]
    # TF input_layer orders alphabetically: [a(4), b(4)]
    for i, f in enumerate(sorted(cols_by_field)):
        np.testing.assert_array_equal(
            out2[cols_by_field[f].name], want[:, 4 * i: 4 * i + 4],
            err_msg=f,
        )


def test_strict_mode_rejects_unrecognized_chain():
    """A chain with NON-const-operand compute (x*x) cannot compile to a
    host evaluator and must raise under strict."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    B = 8
    with g.as_default():
        x = tf1.placeholder(tf.int64, [None], name="x")
        ids = x * x                    # Mul with a non-const operand
        table = tf1.get_variable(
            "emb", [64, 4], initializer=tf1.random_normal_initializer(seed=1)
        )
        n = tf.shape(ids)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        sp = tf1.sparse.SparseTensor(
            indices=tf.stack([rows, tf.zeros_like(rows)], axis=1),
            values=ids,
            dense_shape=tf.cast(tf.stack([n, 1]), tf.int64),
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp, combiner="mean"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="d")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    data = frozen.SerializeToString()
    with pytest.raises(ValueError, match="unrecognized transform chain"):
        import_tf_graphdef(data, name="strict")
    model, _ = import_tf_graphdef(data, name="lax", strict=False)
    assert any("identity int ids" in w for w in model.import_warnings)


def test_variablev2_tables_restore_from_checkpoint(tmp_path):
    """VERDICT r01: an UNFROZEN TF1-style graph (VariableV2 tables) plus
    its checkpoint bundle must import real weights, not random init.
    Built manually with use_resource=False — the reference's deployment
    shape (its ExtractFCNodes keys on VariableV2, graph_info.cc:211-258);
    TF2's feature_column machinery would emit resource variables
    instead."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        ih = tf1.placeholder(tf.int64, [None], name="ih")
        sh = tf1.placeholder(tf.string, [None], name="sh")
        pooled = []
        for nm, vals, nb in (
            ("ih", tf.strings.to_hash_bucket_fast(
                tf.strings.as_string(ih), 32), 32),
            ("sh", tf.strings.to_hash_bucket_fast(sh, 64), 64),
        ):
            n = tf.cast(tf.shape(vals)[0], tf.int64)
            idx = tf.stack(
                [tf.range(n), tf.zeros([n], tf.int64)], axis=1)
            sp = tf.sparse.SparseTensor(idx, vals, tf.stack([n, 1]))
            table = tf1.get_variable(
                f"emb_{nm}", shape=[nb, 4], use_resource=False,
                initializer=tf1.random_normal_initializer(seed=3),
            )
            pooled.append(tf.nn.safe_embedding_lookup_sparse(
                table, sp, combiner="mean", default_id=None,
                name=f"{nm}_pool"))
        out = tf.concat(pooled, axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(1)
            feed = {ih: rng.integers(0, 10**9, 8),
                    sh: np.asarray(["s%d" % v
                                    for v in rng.integers(0, 10**6, 8)])}
            want = sess.run(out, feed)
            prefix = str(tmp_path / "ckpt")
            tf1.train.Saver().save(sess, prefix)
            graph_bytes = g.as_graph_def().SerializeToString()

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        graph_bytes, name="ck", checkpoint=prefix)
    assert weights, "checkpoint restore produced no table weights"
    assert not any("randomly initialized" in w
                   for w in model.import_warnings), model.import_warnings

    by_field = {c.source.field: c for c in model.columns}
    feed2 = {}
    for k, v in [("ih", feed[ih]), ("sh", feed[sh])]:
        m = [f for f in by_field if f == k or f.startswith(k)]
        feed2[m[0]] = v
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    out2 = eng.predict(feed2, return_concat=True)
    # column order may differ (TF alphabetical); widths are uniform 4 here
    got = {tuple(np.round(out2["concat"][:, i:i+4].ravel(), 6))
           for i in (0, 4)}
    wanted = {tuple(np.round(want[:, i:i+4].ravel(), 6)) for i in (0, 4)}
    assert got == wanted


def test_shared_embedding_columns_import_one_table():
    """TF shared_embedding_columns: two categorical columns sharing ONE
    embedding variable must import as two FeatureColumns referencing the
    same TableSpec (and match TF bit-exactly)."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        a = tf1.placeholder(tf.string, [None], name="sa")
        b = tf1.placeholder(tf.string, [None], name="sb")
        ca = fc.categorical_column_with_hash_bucket("sa", 50)
        cb = fc.categorical_column_with_hash_bucket("sb", 50)
        shared = fc.shared_embedding_columns([ca, cb], dimension=4,
                                             combiner="mean")
        out = tf1.feature_column.input_layer(
            {"sa": tf.reshape(a, [-1, 1]), "sb": tf.reshape(b, [-1, 1])},
            shared)
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(4)
            feed = {a: np.asarray(["a%d" % v
                                   for v in rng.integers(0, 10**5, 12)]),
                    b: np.asarray(["b%d" % v
                                   for v in rng.integers(0, 10**5, 12)])}
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="shared")
    emb = model.embedding_columns
    assert len(emb) == 2
    assert emb[0].lookup.table == emb[1].lookup.table, (
        "shared embedding must import as ONE table"
    )
    assert len(weights) == 1

    params = init_model_params(model)
    for t, w in weights.items():
        params["tables"][t] = w
    feed2 = {}
    for c in emb:
        f = c.source.field
        feed2[f] = feed[a] if "sa" in f else feed[b]
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=params)
    got = eng.predict(feed2, return_concat=True)["concat"]
    # TF concat order is alphabetical (sa, sb) = import order here
    np.testing.assert_array_equal(got, want)


def test_indicator_column_imports_as_identity_table():
    """tf.feature_column.indicator_column (multi-hot counts, no embedding
    variable) imports as an identity-table embedding with SUM combiner
    and matches TF bit-exactly, alongside a regular embedding column."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        a = tf1.placeholder(tf.string, [None], name="ind")
        x = tf1.placeholder(tf.string, [None], name="oth")
        cols = [
            fc.indicator_column(
                fc.categorical_column_with_hash_bucket("ind", 8)),
            fc.embedding_column(
                fc.categorical_column_with_hash_bucket("oth", 32),
                dimension=4),
        ]
        out = tf1.feature_column.input_layer(
            {"ind": tf.reshape(a, [-1, 1]), "oth": tf.reshape(x, [-1, 1])},
            cols)
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(6)
            feed = {a: np.asarray(["p%d" % v
                                   for v in rng.integers(0, 30, 10)]),
                    x: np.asarray(["u%d" % v
                                   for v in rng.integers(0, 10**5, 10)])}
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="indic")
    ind = next(c for c in model.embedding_columns
               if c.lookup.table.startswith("__indicator_eye"))
    assert model.tables[ind.lookup.table].vocab_size == 8
    assert np.array_equal(weights[ind.lookup.table], np.eye(8))

    feed2 = {}
    for c in model.embedding_columns:
        f = c.source.field
        feed2[f] = feed[a] if "ind" in f else feed[x]
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=import_params(model, weights))
    got = eng.predict(feed2, return_concat=True)["concat"]
    # TF concat: alphabetical (ind_indicator width 8, oth_embedding 4)
    np.testing.assert_array_equal(got[:, :8], want[:, :8], err_msg="ind")
    np.testing.assert_array_equal(got[:, 8:], want[:, 8:], err_msg="oth")


def test_indicator_identity_categorical_and_oov_zeroing():
    """indicator_column over categorical_column_with_identity (raw int
    ids, no transform op in the graph) imports via NumToId + a depth
    filter that reproduces TF one_hot's zero rows for out-of-range ids."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        a = tf1.placeholder(tf.int64, [None], name="idn")
        d = tf1.placeholder(tf.float32, [None], name="dns")
        # the raw one_hot idiom (identity categorical): OOB ids -> zeros
        oh = tf.one_hot(tf.reshape(a, [-1, 1]), 6)
        mh = tf.reduce_sum(oh, axis=1)
        out = tf.concat([mh, tf.reshape(d, [-1, 1])], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            feed = {a: np.asarray([0, 5, 6, 99, 2, -1]),
                    d: np.linspace(0, 1, 6).astype(np.float32)}
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="identind")
    col = model.embedding_columns[0]
    assert col.lookup.table == "__indicator_eye_6"
    assert any(type(t).__name__ == "FilterRange" for t in col.transforms)

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    dense_field = model.dense_columns[0].source.field
    got = eng.predict({col.source.field: feed[a], dense_field: feed[d]},
                      return_concat=True)["concat"]
    # ours: [dense, indicator]; TF: [indicator, dense]
    np.testing.assert_array_equal(got[:, 1:], want[:, :6], err_msg="ind")
    np.testing.assert_array_equal(got[:, :1], want[:, 6:], err_msg="dense")


def test_host_eval_fallback_serves_bit_exact_vs_real_tf():
    """An intentionally-odd frozen graph — Placeholder -> Mul(3.0) ->
    AddV2(1.5) -> Bucketize -> lookup — has pre-anchor compute no chain
    idiom models.  The reference leaves such segments on the CPU and still
    runs them (RETURN_IF_FALSE discipline, cuda_emitter.cc:141-154); our
    equivalent compiles the segment into a HostEvalChain, and the engine
    must reproduce the TF session bit-exactly (VERDICT r02 item 9)."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        x = tf1.placeholder(tf.float32, [None], name="x")
        y = tf.multiply(x, 3.0) + 1.5
        bz = tf.raw_ops.Bucketize(input=y, boundaries=[1.0, 5.0, 9.0])
        table = tf1.get_variable(
            "emb", [4, 6], initializer=tf1.random_normal_initializer(seed=1)
        )
        n = tf.shape(bz)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        sp = tf1.sparse.SparseTensor(
            indices=tf.stack([rows, tf.zeros_like(rows)], axis=1),
            values=tf.cast(bz, tf.int64),
            dense_shape=tf.cast(tf.stack([n, 1]), tf.int64),
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp, combiner="mean"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="d")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed_x = np.array([0.1, 0.4, 1.7, 3.0, 2.99, 0.33], np.float32)
            feed_d = np.arange(6, dtype=np.float32).reshape(6, 1)
            want = sess.run(out, {x: feed_x, d: feed_d})
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params
    from recom_tpu.ir.spec import HostEvalChain

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="hosteval", strict=True
    )
    (col,) = model.embedding_columns
    (he,) = [t for t in col.transforms if isinstance(t, HostEvalChain)]
    assert he.steps == (("mul", 3.0, "f32"), ("add", 1.5, "f32"))

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    feed = {col.source.field: feed_x,
            model.dense_columns[0].source.field: feed_d}
    got = np.asarray(eng.predict(feed, return_concat=True)["concat"])
    # ours: [dense, emb]; TF: [emb, dense]
    np.testing.assert_array_equal(got[:, 1:], want[:, :6], err_msg="emb")
    np.testing.assert_array_equal(got[:, :1], want[:, 6:], err_msg="dense")

def test_host_eval_integer_div_truncates_like_tf():
    """TF's integer Div truncates toward zero (Div(-7,2) = -3); numpy's
    // floors (-4).  The HostEvalChain evaluator must use trunc division
    or negative ids flip between valid and missing vs the TF session —
    e.g. Div(-1,2): trunc 0 (a real row) vs floor -1 (pruned)."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        x = tf1.placeholder(tf.int64, [None], name="xi")
        ids = tf.raw_ops.Div(x=x, y=tf.constant(2, tf.int64))
        table = tf1.get_variable(
            "emb", [8, 4], initializer=tf1.random_normal_initializer(seed=3)
        )
        n = tf.shape(ids)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        sp = tf1.sparse.SparseTensor(
            indices=tf.stack([rows, tf.zeros_like(rows)], axis=1),
            values=ids,
            dense_shape=tf.cast(tf.stack([n, 1]), tf.int64),
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp, combiner="mean"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="di")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed_x = np.array([-7, -1, 0, 5, 9, -3, 14, 2], np.int64)
            feed_d = np.arange(8, dtype=np.float32).reshape(8, 1)
            want = sess.run(out, {x: feed_x, d: feed_d})
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params
    from recom_tpu.ir.spec import HostEvalChain

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="divtrunc", strict=True
    )
    (col,) = model.embedding_columns
    (he,) = [t for t in col.transforms if isinstance(t, HostEvalChain)]
    assert he.steps[-1][0] == "div"

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    feed = {col.source.field: feed_x,
            model.dense_columns[0].source.field: feed_d}
    got = np.asarray(eng.predict(feed, return_concat=True)["concat"])
    np.testing.assert_array_equal(got[:, 1:], want[:, :4], err_msg="emb")
    np.testing.assert_array_equal(got[:, :1], want[:, 4:], err_msg="dense")


def test_import_width_k_numeric_column():
    """numeric_column(shape=(3,)) must import as a width-3 dense
    passthrough (TF's [None, 3] placeholder) — a bare width-1 import
    would silently drop 2 of the 3 dims under the strict contract."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        dv = tf1.placeholder(tf.float32, [None, 3], name="dv")
        ih = tf1.placeholder(tf.int64, [None], name="ih")
        cols = [
            fc.numeric_column("dv", shape=(3,)),
            fc.embedding_column(
                fc.categorical_column_with_hash_bucket(
                    "ih", 32, dtype=tf.int64
                ),
                dimension=4, combiner="mean",
            ),
        ]
        out = tf1.feature_column.input_layer(
            {"dv": dv, "ih": tf.reshape(ih, [-1, 1])}, cols
        )
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(9)
            feed = {
                dv: rng.standard_normal((12, 3)).astype(np.float32),
                ih: rng.integers(0, 10**9, 12),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="widek", strict=True
    )
    (dcol,) = model.dense_columns
    assert dcol.source.width == 3
    assert model.dense_width == 3

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(12,)),
                 params=import_params(model, weights))
    got = np.asarray(
        eng.predict(
            {dcol.source.field: feed[dv],
             model.embedding_columns[0].source.field: feed[ih]},
            return_concat=True,
        )["concat"]
    )
    # TF orders alphabetically: [dv(3), ih emb(4)]; ours: [dense, emb]
    np.testing.assert_array_equal(got[:, :3], want[:, :3], err_msg="dense")
    np.testing.assert_array_equal(got[:, 3:], want[:, 3:], err_msg="emb")


def test_import_sparse_softmax_weighted_column():
    """tf.sparse.softmax on the weight SparseTensor + weighted sum — the
    reference's SparseSoftmax + SequenceMask pattern
    (post_lookup_optimizer.cc:311-478) — imports as Combiner.SOFTMAX and
    serves bit-exact vs the TF session (one id per row; the ragged
    softmax MATH is ground-truthed against TF in
    test_softmax_combiner_matches_tf_sparse_softmax)."""
    from recom_tpu.ir.spec import Combiner

    tf1 = tf.compat.v1
    g = tf.Graph()
    B = 16
    rng = np.random.default_rng(4)
    id_vals = rng.integers(0, 24, B)
    score_vals = (rng.standard_normal(B) * 2).astype(np.float32)

    with g.as_default():
        ids_ph = tf1.placeholder(tf.int64, [None], name="idsv")
        sc_ph = tf1.placeholder(tf.float32, [None], name="scv")
        table = tf1.get_variable(
            "emb", [24, 4], initializer=tf1.random_normal_initializer(seed=8)
        )
        n = tf.shape(ids_ph)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        idx = tf.stack([rows, tf.zeros_like(rows)], axis=1)
        shp = tf.cast(tf.stack([n, 1]), tf.int64)
        sp_ids = tf1.sparse.SparseTensor(idx, ids_ph, shp)
        sp_w = tf1.sparse.SparseTensor(idx, sc_ph, shp)
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp_ids, sparse_weights=tf.sparse.softmax(sp_w),
            combiner="sum",
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="di")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed_d = np.arange(B, dtype=np.float32).reshape(B, 1)
            want = sess.run(
                out, {ids_ph: id_vals, sc_ph: score_vals, d: feed_d}
            )
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="smx", strict=True
    )
    (col,) = model.embedding_columns
    assert col.lookup.combiner == Combiner.SOFTMAX
    assert col.lookup.weight_field is not None

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(B,)),
                 params=import_params(model, weights))
    feed = {col.source.field: id_vals,
            col.lookup.weight_field: score_vals,
            model.dense_columns[0].source.field: feed_d}
    got = np.asarray(eng.predict(feed, return_concat=True)["concat"])
    # softmax over a single valid position is exactly 1.0 on both sides
    np.testing.assert_array_equal(got[:, 1:], want[:, :4], err_msg="emb")
    np.testing.assert_array_equal(got[:, :1], want[:, 4:], err_msg="dense")


def test_softmax_combiner_matches_tf_sparse_softmax():
    """Ragged softmax pooling vs TF ground truth: ids/scores as ragged
    lists on a hand-built ModelSpec vs tf.sparse.softmax +
    safe_embedding_lookup_sparse(combiner='sum').  Within ~1 ulp (numpy
    exp vs Eigen exp); the oracle/engine pair itself is bit-exact
    (tests/test_engine.py::test_weighted_lookup_bitexact_all_combiners)."""
    from recom_tpu.ir.spec import (
        Combiner, FeatureColumn, FeatureKind, FeatureSource, LookupSpec,
        ModelSpec, NumToId, TableSpec, TowerSpec,
    )

    B, L, V, D = 32, 6, 40, 8
    rng = np.random.default_rng(11)
    lens = rng.integers(1, L + 1, B)
    ids_list = [list(rng.integers(0, V, int(n))) for n in lens]
    w_list = [list((rng.standard_normal(int(n)) * 2).astype(np.float32))
              for n in lens]
    table_np = rng.standard_normal((V, D)).astype(np.float32)

    rows, cols, iv, wv = [], [], [], []
    for i, (idr, wr) in enumerate(zip(ids_list, w_list)):
        for j, (a, w) in enumerate(zip(idr, wr)):
            rows.append(i); cols.append(j); iv.append(a); wv.append(w)
    idx = np.stack([rows, cols], axis=1).astype(np.int64)
    sp_ids = tf.sparse.SparseTensor(idx, np.asarray(iv, np.int64), [B, L])
    sp_w = tf.sparse.SparseTensor(idx, np.asarray(wv, np.float32), [B, L])
    want = tf.nn.safe_embedding_lookup_sparse(
        tf.constant(table_np), sp_ids,
        sparse_weights=tf.sparse.softmax(sp_w), combiner="sum",
    ).numpy()

    model = ModelSpec(
        "smxgt", {"t": TableSpec("t", V, D)},
        [FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST), (NumToId(V),),
            LookupSpec("t", Combiner.SOFTMAX, weight_field="w"),
        )],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(model)
    params["tables"]["t"] = table_np
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(B,)),
                 params=params)
    got = np.asarray(
        eng.predict({"x": ids_list, "w": w_list}, return_pooled=True)
        ["pooled"]["c"]
    )
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=3e-7)


def test_import_delimited_int_list_identity():
    """Sparse int ids via the delimited wire format: split(';') ->
    StringToNumber(int64) -> raw-id lookup imports under strict as an
    INT_LIST identity chain and serves bit-exact vs the TF session."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s = tf1.placeholder(tf.string, [None], name="sl")
        sp = tf1.string_split(s, ";")
        ids = tf1.sparse.SparseTensor(
            sp.indices,
            tf.strings.to_number(sp.values, out_type=tf.int64),
            sp.dense_shape,
        )
        table = tf1.get_variable(
            "emb", [40, 4], initializer=tf1.random_normal_initializer(seed=6)
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, ids, combiner="mean"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="dd")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(3)
            rows = [
                ";".join(str(v) for v in rng.integers(0, 40,
                                                      rng.integers(1, 6)))
                for _ in range(12)
            ]
            feed_d = np.arange(12, dtype=np.float32).reshape(12, 1)
            want = sess.run(out, {s: np.asarray(rows), d: feed_d})
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params
    from recom_tpu.ir.spec import FeatureKind

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="dil", strict=True
    )
    (col,) = model.embedding_columns
    assert col.source.kind == FeatureKind.INT_LIST
    assert col.source.delimiter == ";"

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(12,)),
                 params=import_params(model, weights))
    got = np.asarray(
        eng.predict(
            {col.source.field: np.asarray(rows, dtype="S"),
             model.dense_columns[0].source.field: feed_d},
            return_concat=True,
        )["concat"]
    )
    np.testing.assert_array_equal(got[:, 1:], want[:, :4], err_msg="emb")
    np.testing.assert_array_equal(got[:, :1], want[:, 4:], err_msg="dense")


def test_import_ragged_softmax_sequence_pattern():
    """The COMPLETE reference sequence pattern from a frozen graph:
    delimited int ids + a second delimited float-score feed,
    tf.sparse.softmax over the scores, weighted sum — imports strict as
    INT_LIST + Combiner.SOFTMAX with the score string as weight_field,
    and serves within ~1 ulp of the TF session."""
    from recom_tpu.ir.spec import Combiner, FeatureKind

    tf1 = tf.compat.v1
    g = tf.Graph()
    B = 20
    rng = np.random.default_rng(21)
    lens = rng.integers(1, 7, B)
    id_rows = [list(rng.integers(0, 30, int(n))) for n in lens]
    w_rows = [
        [round(float(x), 3) for x in rng.standard_normal(int(n)) * 2]
        for n in lens
    ]
    id_strs = np.asarray([";".join(str(v) for v in r) for r in id_rows])
    w_strs = np.asarray([";".join(repr(v) for v in r) for r in w_rows])

    with g.as_default():
        si = tf1.placeholder(tf.string, [None], name="seq_ids")
        sw = tf1.placeholder(tf.string, [None], name="seq_scores")
        spi = tf1.string_split(si, ";")
        spw = tf1.string_split(sw, ";")
        ids = tf1.sparse.SparseTensor(
            spi.indices,
            tf.strings.to_number(spi.values, out_type=tf.int64),
            spi.dense_shape,
        )
        scores = tf1.sparse.SparseTensor(
            spw.indices,
            tf.strings.to_number(spw.values, out_type=tf.float32),
            spw.dense_shape,
        )
        table = tf1.get_variable(
            "emb", [30, 6], initializer=tf1.random_normal_initializer(seed=5)
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, ids, sparse_weights=tf.sparse.softmax(scores),
            combiner="sum",
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="dx")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed_d = np.arange(B, dtype=np.float32).reshape(B, 1)
            want = sess.run(out, {si: id_strs, sw: w_strs, d: feed_d})
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    from recom_tpu.importers.tf_graph import import_params

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="ragsmx", strict=True
    )
    (col,) = model.embedding_columns
    assert col.source.kind == FeatureKind.INT_LIST
    assert col.lookup.combiner == Combiner.SOFTMAX
    assert col.lookup.weight_field is not None

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(B,)),
                 params=import_params(model, weights))
    got = np.asarray(
        eng.predict(
            {col.source.field: np.asarray(id_strs, dtype="S"),
             col.lookup.weight_field: np.asarray(w_strs, dtype="S"),
             model.dense_columns[0].source.field: feed_d},
            return_concat=True,
        )["concat"]
    )
    np.testing.assert_allclose(
        got[:, 1:], want[:, :6], rtol=3e-6, atol=3e-7, err_msg="emb"
    )
    np.testing.assert_array_equal(got[:, :1], want[:, 6:], err_msg="dense")


def test_strict_refuses_unalignable_delimited_weights():
    """Regression (round-3 review findings 2+3): scalar int ids with a
    DELIMITED weight feed cannot align (and must not flip the id feed to
    INT_LIST because the weight plane's StringSplit is in the cone) —
    strict refuses instead of importing with weights dropped."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        xi = tf1.placeholder(tf.int64, [None], name="xid")
        sw = tf1.placeholder(tf.string, [None], name="xw")
        spw = tf1.string_split(sw, ";")
        scores = tf1.sparse.SparseTensor(
            spw.indices,
            tf.strings.to_number(spw.values, out_type=tf.float32),
            spw.dense_shape,
        )
        table = tf1.get_variable(
            "emb", [16, 4], initializer=tf1.random_normal_initializer(seed=7)
        )
        n = tf.shape(xi)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        sp_ids = tf1.sparse.SparseTensor(
            tf.stack([rows, tf.zeros_like(rows)], axis=1), xi,
            tf.cast(tf.stack([n, 1]), tf.int64),
        )
        # slice the score plane to one per row so TF accepts the shapes
        w1 = tf.sparse.slice(scores, [0, 0], [tf.shape(xi, tf.int64)[0], 1])
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp_ids, sparse_weights=w1, combiner="sum"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="dq")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    data = frozen.SerializeToString()
    with pytest.raises(ValueError):
        import_tf_graphdef(data, name="mis", strict=True)
    model, _ = import_tf_graphdef(data, name="mislax", strict=False)
    (col,) = model.embedding_columns
    # the id feed must stay a scalar-int feed, not become INT_LIST via
    # the weight plane's split
    from recom_tpu.ir.spec import FeatureKind
    assert col.source.kind == FeatureKind.DENSE_INT


def _hash_pool_slot(tf1, name, vocab=64, dim=4, seed=5):
    """string-hash categorical -> safe_embedding pooled [B, dim]."""
    s = tf1.placeholder(tf.string, [None], name=name)
    vals = tf.strings.to_hash_bucket_fast(s, vocab)
    n = tf.cast(tf.shape(vals)[0], tf.int64)
    idx = tf.stack([tf.range(n), tf.zeros([n], tf.int64)], axis=1)
    sp = tf.sparse.SparseTensor(idx, vals, tf.stack([n, 1]))
    table = tf1.get_variable(
        f"emb_{name}", [vocab, dim],
        initializer=tf1.random_normal_initializer(seed=seed),
    )
    pooled = tf.nn.safe_embedding_lookup_sparse(
        table, sp, combiner="mean", default_id=None
    )
    return s, pooled


def test_pooled_affine_imports_as_postpool():
    """Elementwise const arithmetic on the POOLED output (Mul/Add/Sub by a
    frozen scalar or per-dim vector) — previously dropped SILENTLY even
    under strict because op-presence residue admits Mul/Add — now imports
    as PostPool('affine') and reproduces the TF session to f32
    elementwise exactness."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s, pooled = _hash_pool_slot(tf1, "sa")
        bias = tf.constant([0.5, -1.25, 2.0, 0.0], tf.float32)
        col_a = pooled * 2.5 + bias          # Mul then AddV2
        s2, pooled2 = _hash_pool_slot(tf1, "sb", seed=9)
        col_b = 3.0 - pooled2                # Sub with the const on the left
        out = tf.concat([col_a, col_b], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(2)
            feed = {
                s: np.asarray(["a%d" % v for v in rng.integers(0, 10**6, 12)]),
                s2: np.asarray(["b%d" % v for v in rng.integers(0, 10**6, 12)]),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="aff", strict=True
    )
    cols = model.embedding_columns
    assert len(cols) == 2
    by_field = {c.source.field: c for c in cols}
    a, b = by_field["sa"], by_field["sb"]
    assert [p.op for p in a.post] == ["affine", "affine"]
    assert a.post[0].scale == (2.5,) and a.post[1].bias == (0.5, -1.25, 2.0, 0.0)
    assert [p.op for p in b.post] == ["affine"]
    assert b.post[0].scale == (-1.0,) and b.post[0].bias == (3.0,)

    from recom_tpu.importers.tf_graph import import_params

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=import_params(model, weights))
    got = eng.predict({"sa": feed[s], "sb": feed[s2]}, return_concat=True)
    np.testing.assert_allclose(got["concat"], want, rtol=0, atol=1e-6)


def test_strict_rejects_nonconst_compute_on_pooled_path():
    """Mul of the pooled output by ANOTHER TENSOR (not a frozen const, not
    a second pooled lookup) cannot be expressed; strict must raise instead
    of dropping it (the pooled-path analogue of the pre-anchor check)."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s, pooled = _hash_pool_slot(tf1, "sa")
        gate = tf1.placeholder(tf.float32, [None, 1], name="gate")
        scaled = pooled * gate               # non-const operand
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        out = tf.concat([scaled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    data = frozen.SerializeToString()
    with pytest.raises(ValueError, match="pooled-output path"):
        import_tf_graphdef(data, name="gate", strict=True)
    model, _ = import_tf_graphdef(data, name="gatelax", strict=False)
    assert any("pooled-output path" in w for w in model.import_warnings)


def test_strict_rejects_mul_slot_with_inner_compute():
    """Mul(pooled_A, Mul(pooled_B, 2.0)): mul_column's contract multiplies
    by B's RAW pooled output, so the inner x2 has no expression — the
    mul-slot import must refuse (strict raises via the multi-table guard)
    instead of silently dropping the scale."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        sa, pooled_a = _hash_pool_slot(tf1, "sa")
        sb, pooled_b = _hash_pool_slot(tf1, "sb", seed=9)
        prod = pooled_a * (pooled_b * 2.0)
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        out = tf.concat([prod, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    with pytest.raises(ValueError, match="tables converge"):
        import_tf_graphdef(frozen.SerializeToString(), name="imul",
                           strict=True)


def test_hosteval_int64_consts_stay_exact():
    """FloorMod by an int64 const above 2^53: the step const must survive
    import/serde as a Python int — a float() round-trip corrupts it and
    changes ids (engine vs the TF session that ran the same ops)."""
    BIG = (1 << 53) + 1
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        x = tf1.placeholder(tf.int64, [None], name="x")
        ids = tf.math.floormod(tf.math.floormod(x, np.int64(BIG)),
                               np.int64(64))
        table = tf1.get_variable(
            "emb", [64, 4], initializer=tf1.random_normal_initializer(seed=1)
        )
        n = tf.shape(ids)[0]
        rows = tf.cast(tf.range(n), tf.int64)
        sp = tf1.sparse.SparseTensor(
            tf.stack([rows, tf.zeros_like(rows)], axis=1), ids,
            tf.cast(tf.stack([n, 1]), tf.int64),
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, sp, combiner="sum"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            # BIG itself: TF gives BIG % BIG = 0; a const rounded to 2^53
            # would give 1 — ids differ, embeddings differ
            xs = np.asarray([BIG, BIG - 1, 5, (1 << 60) + 7], np.int64)
            dv = np.zeros((4, 1), np.float32)
            want = sess.run(out, {x: xs, d: dv})
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="bigmod", strict=True
    )
    (col,) = model.embedding_columns
    from recom_tpu.ir.spec import HostEvalChain

    (he,) = [t for t in col.transforms if isinstance(t, HostEvalChain)]
    consts = [c for _, c, _ in he.steps if c is not None]
    assert BIG in consts and all(isinstance(c, int) for c in consts)

    # serde round-trip must not launder the int either
    from recom_tpu.ir.serde import model_from_dict, model_to_dict

    m2 = model_from_dict(model_to_dict(model))
    (col2,) = m2.embedding_columns
    (he2,) = [t for t in col2.transforms if isinstance(t, HostEvalChain)]
    assert he2.steps == he.steps

    from recom_tpu.importers.tf_graph import import_params

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(4,)),
                 params=import_params(model, weights))
    got = eng.predict({"x": xs, "dn": dv}, return_concat=True)
    # engine concat orders the dense block first; TF's graph put it last
    np.testing.assert_array_equal(got["concat"][:, 1:], want[:, :4])
    np.testing.assert_array_equal(got["concat"][:, 0], want[:, 4])


@pytest.mark.parametrize("seed", range(4))
def test_import_fuzz_random_feature_column_graphs(seed):
    """IMPORT fuzzer: a random mix of real tf.feature_column idioms
    (bucketized / int+str hash / identity with default / vocabulary-list
    with OOV / weighted categorical / indicator / hashed cross) through
    input_layer, frozen, imported under STRICT, served — every column's
    pooled output must match the TF session bit-exactly.  The per-idiom
    tests above pin individual chains; this sweeps random COMPOSITIONS of
    them the way a production model mixes columns."""
    rng = np.random.default_rng(400 + seed)
    tf1 = tf.compat.v1
    g = tf.Graph()
    B = 16
    # (tf column NAME for concat ordering, fields->feeds dict, width,
    #  is_indicator)
    col_specs = []
    with g.as_default():
        fc = tf1.feature_column
        cols = []
        feats = {}

        def ph(name, dtype):
            feats[name] = tf1.placeholder(dtype, [None], name=name)
            return feats[name]

        n_cols = int(rng.integers(3, 7))
        for i in range(n_cols):
            kind = rng.choice(
                ["bz", "ih", "sh", "ident", "vocab", "ind", "wstr",
                 "cross", "shared"]
            )
            name = f"{kind}{i}"
            dim = int(rng.choice([2, 4]))
            comb = str(rng.choice(["mean", "sum", "sqrtn"]))
            if kind == "bz":
                ph(name, tf.float32)
                nb = int(rng.integers(2, 12))
                cat = fc.bucketized_column(
                    fc.numeric_column(name),
                    boundaries=[float(x) for x in range(0, 5 * nb, 5)],
                )
                feeds = {name: rng.uniform(-5, 5 * nb + 5, B)
                         .astype(np.float32)}
            elif kind == "ih":
                ph(name, tf.int64)
                cat = fc.categorical_column_with_hash_bucket(
                    name, int(rng.integers(8, 64)), dtype=tf.int64
                )
                feeds = {name: rng.integers(0, 10**9, B)}
            elif kind == "sh":
                ph(name, tf.string)
                cat = fc.categorical_column_with_hash_bucket(
                    name, int(rng.integers(8, 64))
                )
                feeds = {name: np.asarray(
                    ["s%d" % v for v in rng.integers(0, 10**6, B)]
                )}
            elif kind == "ident":
                ph(name, tf.int64)
                nb = int(rng.integers(8, 32))
                cat = fc.categorical_column_with_identity(
                    name, nb, default_value=int(rng.integers(0, nb))
                )
                feeds = {name: rng.integers(0, 2 * nb, B)}
            elif kind == "vocab":
                ph(name, tf.string)
                vocab = ["v%d" % j for j in range(int(rng.integers(3, 9)))]
                cat = fc.categorical_column_with_vocabulary_list(
                    name, vocab, num_oov_buckets=int(rng.integers(0, 3))
                )
                feeds = {name: np.asarray([
                    vocab[int(rng.integers(0, len(vocab)))]
                    if rng.random() < 0.7 else "oov%d" % rng.integers(9)
                    for _ in range(B)
                ])}
            elif kind == "ind":
                ph(name, tf.int64)
                nb = int(rng.integers(4, 16))
                cat = fc.categorical_column_with_identity(
                    name, nb, default_value=0
                )
                cols.append(fc.indicator_column(cat))
                feeds = {name: rng.integers(0, nb, B)}
                col_specs.append((cat.name + "_indicator", feeds, nb, True))
                continue
            elif kind == "wstr":
                ph(name, tf.string)
                wname = f"{name}_w"
                ph(wname, tf.float32)
                base = fc.categorical_column_with_hash_bucket(
                    name, int(rng.integers(8, 64))
                )
                cat = fc.weighted_categorical_column(base, wname)
                feeds = {
                    name: np.asarray(
                        ["w%d" % v for v in rng.integers(0, 10**5, B)]
                    ),
                    wname: rng.random(B).astype(np.float32) + 0.1,
                }
            elif kind == "shared":
                # two categorical columns sharing ONE embedding variable
                fa, fb = f"{name}a", f"{name}b"
                ph(fa, tf.string)
                ph(fb, tf.string)
                nb = int(rng.integers(8, 64))
                ca = fc.categorical_column_with_hash_bucket(fa, nb)
                cb = fc.categorical_column_with_hash_bucket(fb, nb)
                for sc in fc.shared_embedding_columns(
                    [ca, cb], dimension=dim, combiner=comb
                ):
                    cols.append(sc)
                fa_feed = np.asarray(
                    ["p%d" % v for v in rng.integers(0, 10**5, B)]
                )
                fb_feed = np.asarray(
                    ["q%d" % v for v in rng.integers(0, 10**5, B)]
                )
                col_specs.append(
                    (f"{fa}_shared_embedding", {fa: fa_feed}, dim, False)
                )
                col_specs.append(
                    (f"{fb}_shared_embedding", {fb: fb_feed}, dim, False)
                )
                continue
            else:   # cross of two string fields
                fa, fb = f"{name}a", f"{name}b"
                ph(fa, tf.string)
                ph(fb, tf.string)
                cat = fc.crossed_column(
                    [fa, fb], int(rng.integers(16, 128))
                )
                feeds = {
                    fa: np.asarray(
                        ["a%d" % v for v in rng.integers(0, 100, B)]
                    ),
                    fb: np.asarray(
                        ["b%d" % v for v in rng.integers(0, 100, B)]
                    ),
                }
            cols.append(fc.embedding_column(cat, dimension=dim,
                                            combiner=comb))
            col_specs.append((cat.name + "_embedding", feeds, dim, False))
        out = tf1.feature_column.input_layer(
            {k: tf.reshape(v, [-1, 1]) for k, v in feats.items()}, cols
        )
        out = tf.identity(out, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            sess.run(tf1.tables_initializer())
            feed_dict = {}
            for _, feeds, _, _ in col_specs:
                for k, v in feeds.items():
                    feed_dict[feats[k]] = v
            want = sess.run(out, feed_dict)
            # deployment convention: frozen graphs with lookup tables
            # retain their init ops (or TF itself cannot run them) — the
            # importer reads vocab keys/values from the kept Import op
            init_op = tf1.tables_initializer()
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(),
                ["out", init_op.name.split(":")[0]],
            )

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name=f"fz{seed}", strict=True
    )
    from recom_tpu.importers.tf_graph import import_params

    batch = {}
    emb_by_feed = {}
    for col in model.embedding_columns:
        if col.source.fields:           # hashed cross: keyed by raw fields
            emb_by_feed[frozenset(col.source.fields)] = col
        else:
            emb_by_feed[col.source.field] = col

    def spec_col(feeds):
        """Imported column for a spec's feed dict."""
        keys = [k for k in feeds if not k.endswith("_w")]
        if len(keys) == 2:              # cross
            for fk, c in emb_by_feed.items():
                if isinstance(fk, frozenset) and all(
                    any(f == k or f.startswith(k) for f in fk) for k in keys
                ):
                    return c
            raise AssertionError(f"lost cross column {keys}")
        (k,) = keys
        m = [f for f in emb_by_feed
             if isinstance(f, str) and (f == k or f.startswith(k))]
        assert m, f"imported model lost column {k}"
        return emb_by_feed[m[0]]

    for _, feeds, _, _ in col_specs:
        c = spec_col(feeds)
        for k, v in feeds.items():
            if k.endswith("_w"):
                batch[c.lookup.weight_field] = v
            else:
                fields = (
                    c.source.fields if c.source.fields else (c.source.field,)
                )
                m = [f for f in fields if f == k or f.startswith(k)]
                batch[m[0]] = v
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(B,)),
                 params=import_params(model, weights))
    got = eng.predict(batch, return_pooled=True)["pooled"]

    # input_layer concatenates columns sorted by feature-column NAME
    order = sorted(col_specs, key=lambda t: t[0])
    off = 0
    for tf_name, feeds, width, _ in order:
        c = spec_col(feeds)
        np.testing.assert_array_equal(
            got[c.name], want[:, off : off + width], err_msg=tf_name
        )
        off += width
    assert off == want.shape[1]


def test_transposed_tower_matmul_refused():
    """attr_bool read proto field 2 (bytes s) instead of 5 (bool b), so
    transpose_b=True was invisible and transposed MatMuls imported with
    untransposed weight semantics.  The tower must refuse now."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s, pooled = _hash_pool_slot(tf1, "sa")
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        x = tf.concat([pooled, d], axis=1)
        w = tf1.get_variable(
            "w", [3, 5], initializer=tf1.random_normal_initializer(seed=2)
        )
        out = tf.identity(tf.matmul(x, w, transpose_b=True), name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    model, _ = import_tf_graphdef(
        frozen.SerializeToString(), name="tb", strict=True
    )
    assert any("transposed MatMul" in w for w in model.import_warnings), (
        model.import_warnings
    )
    assert getattr(model, "imported_tower_params", None) is None
    assert model.tower.top_mlp == ()


def test_truncated_tower_refused():
    """A MatMul whose BiasAdd tail the walk cannot absorb (trailing
    Softmax outside the activation set) must refuse the tower instead of
    importing a truncated one with the tail silently dropped."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s, pooled = _hash_pool_slot(tf1, "sa")
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        x = tf.concat([pooled, d], axis=1)
        w = tf1.get_variable(
            "w", [5, 3], initializer=tf1.random_normal_initializer(seed=2)
        )
        b = tf1.get_variable(
            "b", [3], initializer=tf1.zeros_initializer()
        )
        out = tf.identity(
            tf.nn.softmax(tf.nn.bias_add(tf.matmul(x, w), b)), name="out"
        )
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    model, _ = import_tf_graphdef(
        frozen.SerializeToString(), name="tt", strict=True
    )
    assert any("truncated tower" in w for w in model.import_warnings), (
        model.import_warnings
    )
    assert model.tower.top_mlp == ()


def test_with_num_segments_combiner_and_order_matched():
    """SparseSegmentSumWithNumSegments must import as SUM (it fell
    through to the MEAN default before), and a two-placeholder dense
    slot must emit columns in CONCAT order so the tower permutation maps
    the right weight rows — both verified against the TF session."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    B = 8
    with g.as_default():
        s = tf1.placeholder(tf.string, [None], name="sa")
        vals = tf.strings.to_hash_bucket_fast(s, 32)
        nr = tf.cast(tf.shape(vals)[0], tf.int64)
        table = tf1.get_variable(
            "emb", [32, 4], initializer=tf1.random_normal_initializer(seed=4)
        )
        pooled = tf.sparse.segment_sum(
            tf.nn.embedding_lookup(table, vals),
            tf.range(nr), tf.range(nr), num_segments=nr,
        )
        # dense slot = inner concat of TWO feeds in non-alphabetical order
        db = tf1.placeholder(tf.float32, [None], name="zb")
        da = tf1.placeholder(tf.float32, [None], name="aa")
        dpair = tf.concat(
            [tf.reshape(db, [-1, 1]), tf.reshape(da, [-1, 1])], axis=1
        )
        dc = tf1.placeholder(tf.float32, [None], name="mc")
        x = tf.concat([pooled, dpair, tf.reshape(dc, [-1, 1])], axis=1)
        w = tf1.get_variable(
            "w", [7, 1], initializer=tf1.random_normal_initializer(seed=5)
        )
        out = tf.identity(tf.matmul(x, w), name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(4)
            feed = {
                s: np.asarray(["u%d" % v for v in rng.integers(0, 99, B)]),
                db: rng.standard_normal(B).astype(np.float32),
                da: rng.standard_normal(B).astype(np.float32),
                dc: rng.standard_normal(B).astype(np.float32),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="wns", strict=True
    )
    from recom_tpu.ir.spec import Combiner

    (col,) = model.embedding_columns
    assert col.lookup.combiner == Combiner.SUM
    from recom_tpu.importers.tf_graph import import_params

    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(B,)),
                 params=import_params(model, weights))
    got = eng.predict({"sa": feed[s], "zb": feed[db], "aa": feed[da],
                       "mc": feed[dc]})
    np.testing.assert_allclose(got["output"], want, rtol=1e-5, atol=1e-6)


def test_whitespace_split_refused_under_strict():
    """tf.strings.split with no sep (whitespace-run splitting) has no
    single-byte wire form; the old `or ';'` fallback silently split on
    ';' instead — strict must refuse."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        s = tf1.placeholder(tf.string, [None], name="sw")
        sp = tf.strings.split(s).to_sparse()    # whitespace split
        ids = tf.sparse.SparseTensor(
            sp.indices,
            tf.strings.to_hash_bucket_fast(sp.values, 32),
            sp.dense_shape,
        )
        table = tf1.get_variable(
            "emb", [32, 4], initializer=tf1.random_normal_initializer(seed=3)
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, ids, combiner="mean"
        )
        d = tf1.placeholder(tf.float32, [None, 1], name="dn")
        out = tf.concat([pooled, d], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )
    with pytest.raises(ValueError):
        import_tf_graphdef(frozen.SerializeToString(), name="ws",
                           strict=True)


def test_import_tf_saved_model_directory(tmp_path):
    """SavedModel DIRECTORY import (the TF-Serving deployment artifact —
    where the reference's pass actually runs): graph extracted TF-free
    from saved_model.pb via the protowire walker, VariableV2 tables
    restored from variables/variables, served bit-exact vs the TF
    session."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        ih = tf1.placeholder(tf.int64, [None], name="ih")
        sh = tf1.placeholder(tf.string, [None], name="sh")
        pooled = []
        for nm, vals, nb in (
            ("ih", tf.strings.to_hash_bucket_fast(
                tf.strings.as_string(ih), 32), 32),
            ("sh", tf.strings.to_hash_bucket_fast(sh, 64), 64),
        ):
            n = tf.cast(tf.shape(vals)[0], tf.int64)
            idx = tf.stack([tf.range(n), tf.zeros([n], tf.int64)], axis=1)
            sp = tf.sparse.SparseTensor(idx, vals, tf.stack([n, 1]))
            table = tf1.get_variable(
                f"emb_sm_{nm}", shape=[nb, 4], use_resource=False,
                initializer=tf1.random_normal_initializer(seed=5),
            )
            pooled.append(tf.nn.safe_embedding_lookup_sparse(
                table, sp, combiner="mean", default_id=None,
                name=f"{nm}_pool"))
        out = tf.concat(pooled, axis=1, name="out")
        sm_dir = str(tmp_path / "sm")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rng = np.random.default_rng(2)
            feed = {ih: rng.integers(0, 10**9, 8),
                    sh: np.asarray(["t%d" % v
                                    for v in rng.integers(0, 10**6, 8)])}
            want = sess.run(out, feed)
            b = tf1.saved_model.Builder(sm_dir)
            b.add_meta_graph_and_variables(sess, ["serve"])
            b.save()

    from recom_tpu.importers.tf_graph import (
        import_params, import_tf_saved_model,
    )

    model, weights = import_tf_saved_model(sm_dir)
    assert weights, "SavedModel variables produced no table weights"
    assert not any("randomly initialized" in w
                   for w in model.import_warnings), model.import_warnings

    by_field = {c.source.field: c for c in model.columns}
    feed2 = {}
    for k, v in [("ih", feed[ih]), ("sh", feed[sh])]:
        m = [f for f in by_field if f == k or f.startswith(k)]
        feed2[m[0]] = v
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    out2 = eng.predict(feed2, return_concat=True)
    got = {tuple(np.round(out2["concat"][:, i:i + 4].ravel(), 6))
           for i in (0, 4)}
    wanted = {tuple(np.round(want[:, i:i + 4].ravel(), 6)) for i in (0, 4)}
    assert got == wanted


def test_import_saved_model_resource_variables(tmp_path):
    """A REAL tf.feature_column input_layer SavedModel from modern TF uses
    RESOURCE variables (VarHandleOp + ResourceGather), not VariableV2 —
    the deployment artifact as actually produced today.  It must import
    (tables restored from variables/variables by node name) and serve
    matching the TF session."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        feats = {
            "price": tf1.placeholder(tf.float32, [None], name="price"),
            "user": tf1.placeholder(tf.string, [None], name="user"),
        }
        cols = [
            fc.embedding_column(fc.bucketized_column(
                fc.numeric_column("price"),
                boundaries=[0.0, 10.0, 20.0, 30.0]), dimension=4),
            fc.embedding_column(fc.categorical_column_with_hash_bucket(
                "user", 50), dimension=4, combiner="sum"),
        ]
        out = tf1.feature_column.input_layer(feats, cols)
        sm_dir = str(tmp_path / "sm_res")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            assert any(
                n.op == "ResourceGather" for n in g.as_graph_def().node
            ), "expected a resource-variable graph"
            rng = np.random.default_rng(3)
            feed = {
                feats["price"]: rng.uniform(-5, 40, 16).astype(np.float32),
                feats["user"]: np.asarray(
                    [f"u{v}" for v in rng.integers(0, 9999, 16)]
                ),
            }
            want = sess.run(out, feed)
            b = tf1.saved_model.Builder(sm_dir)
            b.add_meta_graph_and_variables(sess, ["serve"])
            b.save()

    from recom_tpu.importers.tf_graph import (
        import_params, import_tf_saved_model,
    )

    model, weights = import_tf_saved_model(sm_dir)
    assert len(weights) == 2, sorted(weights)
    assert not any("randomly initialized" in w
                   for w in model.import_warnings), model.import_warnings
    by_field = {c.source.field: c for c in model.columns}
    feed2 = {}
    for k, ph in (("price", feats["price"]), ("user", feats["user"])):
        f = [x for x in by_field if x == k or x.startswith(k)][0]
        feed2[f] = feed[ph]
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=import_params(model, weights))
    got = np.asarray(eng.predict(feed2, return_concat=True)["concat"])
    got_set = {tuple(got[:, i:i + 4].ravel().round(6)) for i in (0, 4)}
    want_set = {tuple(want[:, i:i + 4].ravel().round(6)) for i in (0, 4)}
    assert got_set == want_set


def test_import_saved_model_unfrozen_vocab_table(tmp_path):
    """Unfrozen SavedModel with a vocabulary-list column: the vocab lives
    in LookupTableImportV2's Const operands (wired via the main_op, not
    the forward path) and the embedding in a resource variable — both
    must import through the SavedModel directory entry point."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        feats = {
            "color": tf1.placeholder(tf.string, [None], name="color"),
            "user": tf1.placeholder(tf.string, [None], name="user"),
        }
        cols = [
            fc.embedding_column(
                fc.categorical_column_with_vocabulary_list(
                    "color", ["red", "green", "blue"], num_oov_buckets=2),
                dimension=4, combiner="mean"),
            fc.embedding_column(fc.categorical_column_with_hash_bucket(
                "user", 50), dimension=4),
        ]
        out = tf1.feature_column.input_layer(feats, cols)
        sm_dir = str(tmp_path / "sm_vocab")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            sess.run(tf1.tables_initializer())
            rng = np.random.default_rng(4)
            vals = np.asarray(
                ["red", "green", "blue", "purple", "red", "ochre"])
            users = np.asarray(
                [f"u{v}" for v in rng.integers(0, 9999, 6)])
            want = sess.run(out, {feats["color"]: vals,
                                  feats["user"]: users})
            b = tf1.saved_model.Builder(sm_dir)
            b.add_meta_graph_and_variables(
                sess, ["serve"], main_op=tf1.tables_initializer())
            b.save()

    from recom_tpu.importers.tf_graph import (
        import_params, import_tf_saved_model,
    )

    model, weights = import_tf_saved_model(sm_dir)
    by_field = {c.source.field: c for c in model.columns}
    feed = {}
    for k, v in (("color", vals), ("user", users)):
        f = [x for x in by_field if x == k or x.startswith(k)][0]
        feed[f] = v
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(8,)),
                 params=import_params(model, weights))
    got = np.asarray(eng.predict(feed, return_concat=True)["concat"])
    gset = {tuple(got[:, i:i + 4].ravel().round(5)) for i in (0, 4)}
    wset = {tuple(want[:, i:i + 4].ravel().round(5)) for i in (0, 4)}
    assert gset == wset


def test_import_saved_model_mixed_idioms_unfrozen(tmp_path):
    """Unfrozen resource-variable SavedModel carrying weighted + crossed +
    indicator + shared-embedding columns at once: every idiom must import
    through the directory entry point and serve matching the TF session
    reloaded from the SAME SavedModel."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        fc = tf1.feature_column
        feats = {
            "w_id": tf1.placeholder(tf.string, [None], name="w_id"),
            "w_sc": tf1.placeholder(tf.float32, [None], name="w_sc"),
            "k1": tf1.placeholder(tf.string, [None], name="k1"),
            "k2": tf1.placeholder(tf.string, [None], name="k2"),
            "ind": tf1.placeholder(tf.int64, [None], name="ind"),
            "sa": tf1.placeholder(tf.string, [None], name="sa"),
            "sb": tf1.placeholder(tf.string, [None], name="sb"),
        }
        wcat = fc.weighted_categorical_column(
            fc.categorical_column_with_hash_bucket("w_id", 40), "w_sc")
        cross = fc.crossed_column(["k1", "k2"], hash_bucket_size=64)
        indc = fc.indicator_column(
            fc.categorical_column_with_identity("ind", 6, default_value=0))
        shared = fc.shared_embedding_columns(
            [fc.categorical_column_with_hash_bucket("sa", 32),
             fc.categorical_column_with_hash_bucket("sb", 32)],
            dimension=4)
        cols = [
            fc.embedding_column(wcat, dimension=4, combiner="sum"),
            fc.embedding_column(cross, dimension=4),
            indc, *shared,
        ]
        tf1.feature_column.input_layer(feats, cols)
        sm_dir = str(tmp_path / "sm_mix")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            sess.run(tf1.tables_initializer())
            b = tf1.saved_model.Builder(sm_dir)
            b.add_meta_graph_and_variables(
                sess, ["serve"], main_op=tf1.tables_initializer())
            b.save()

    rng = np.random.default_rng(5)
    B = 12
    raw = {
        "w_id": np.asarray([f"i{v}" for v in rng.integers(0, 999, B)]),
        "w_sc": (rng.random(B) + 0.1).astype(np.float32),
        "k1": np.asarray([f"a{v}" for v in rng.integers(0, 99, B)]),
        "k2": np.asarray([f"b{v}" for v in rng.integers(0, 99, B)]),
        "ind": rng.integers(0, 6, B),
        "sa": np.asarray([f"s{v}" for v in rng.integers(0, 999, B)]),
        "sb": np.asarray([f"t{v}" for v in rng.integers(0, 999, B)]),
    }
    with tf1.Session(graph=tf.Graph()) as sess:
        tf1.saved_model.load(sess, ["serve"], sm_dir)
        gd = sess.graph
        feed = {gd.get_tensor_by_name(k + ":0"): v for k, v in raw.items()}
        outt = [n.name for n in gd.as_graph_def().node
                if n.op in ("ConcatV2", "Concat")][-1]
        want = sess.run(gd.get_tensor_by_name(outt + ":0"), feed)

    from recom_tpu.importers.tf_graph import (
        import_params, import_tf_saved_model,
    )

    model, weights = import_tf_saved_model(sm_dir)
    got = np.asarray(Engine(
        model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
        params=import_params(model, weights),
    ).predict(raw, return_concat=True)["concat"])
    assert got.shape == want.shape
    slices = [(0, 4), (4, 8), (8, 14), (14, 18), (18, 22)]
    gset = {tuple(got[:, a:b].ravel().round(4)) for a, b in slices}
    wset = {tuple(want[:, a:b].ravel().round(4)) for a, b in slices}
    assert gset == wset


@pytest.mark.skipif(
    not os.path.exists("/root/reference/examples/python/dlrm.py"),
    reason="reference tree not available",
)
def test_import_reference_dlrm_saved_model(tmp_path):
    """End-to-end parity proof on the REFERENCE'S OWN artifact: run the
    reference's examples/python/dlrm.py create_dlrm (scaled sizes, its
    exact column generators and simple_save export), import the resulting
    SavedModel directory, and match the input_layer concat against the TF
    session.  tf.layers was removed after the reference's TF 2.6 target,
    so the tower layer is shimmed — the feature-column half runs the
    reference code untouched."""
    import sys
    from types import SimpleNamespace

    sys.path.insert(0, "/root/reference/examples/python")
    try:
        import dlrm as ref_dlrm
    finally:
        sys.path.pop(0)
    tf1 = tf.compat.v1

    def _dense(x, units, activation=None, name=None):
        with tf1.variable_scope(name or "dense", reuse=tf1.AUTO_REUSE):
            w = tf1.get_variable("kernel", [int(x.shape[-1]), units],
                                 dtype=tf1.float32)
            b = tf1.get_variable("bias", [units], dtype=tf1.float32,
                                 initializer=tf1.zeros_initializer())
        y = tf1.nn.bias_add(tf1.matmul(x, w), b)
        return activation(y) if activation is not None else y

    class _TFWrap:
        def __init__(self, base):
            self._b = base
            self.layers = SimpleNamespace(dense=_dense)

        def __getattr__(self, k):
            return getattr(self._b, k)

    ref_dlrm.tf = _TFWrap(ref_dlrm.tf)
    ref_dlrm.large_embedding_table_rows = 100_000
    ref_dlrm.input_rows = 64
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with tf.Graph().as_default():
            ref_dlrm.create_dlrm(6, 2, 2, 2, 1, 4, [8], [16], "probe_E")
    finally:
        os.chdir(cwd)
    sm_dir = str(tmp_path / "probe_E")

    rng = np.random.default_rng(0)
    with tf1.Session(graph=tf1.Graph()) as sess:
        tf1.saved_model.loader.load(sess, ["serve"], sm_dir)
        gd = sess.graph.as_graph_def()
        concat = [n.name for n in gd.node
                  if n.op == "ConcatV2" and len(n.input) > 6][-1]
        raw = {}
        for n in gd.node:
            if n.op != "Placeholder" or n.name == "dense":
                continue
            ph = sess.graph.get_tensor_by_name(n.name + ":0")
            if ph.dtype == tf1.int32:
                raw[n.name] = rng.integers(0, 100, 64).astype(np.int32)
            elif ph.dtype == tf1.string:
                if "sparse" in n.name:
                    raw[n.name] = np.asarray([
                        ";".join(f"w{rng.integers(0, 10**6)}"
                                 for _ in range(int(rng.integers(1, 10))))
                        for _ in range(64)])
                else:
                    raw[n.name] = np.asarray(
                        [f"s{v}" for v in rng.integers(0, 10**6, 64)])
            else:
                raw[n.name] = rng.uniform(0, 100, 64).astype(np.float32)
        want = sess.run(
            sess.graph.get_tensor_by_name(concat + ":0"),
            {sess.graph.get_tensor_by_name(k + ":0"): v
             for k, v in raw.items()},
        )

    from recom_tpu.importers.tf_graph import (
        import_params, import_tf_saved_model,
    )

    model, weights = import_tf_saved_model(sm_dir)
    assert len(model.embedding_columns) == 13
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(64,)),
                 params=import_params(model, weights))
    got = np.asarray(eng.predict(dict(raw), return_concat=True)["concat"])
    assert got.shape == want.shape
    # column ORDER may differ (input_layer sorts alphabetically); rows
    # align, so compare each row's sorted values
    np.testing.assert_allclose(
        np.sort(got, axis=1), np.sort(want, axis=1), rtol=1e-4, atol=1e-5
    )


def test_import_string_sentinel_filter_vs_real_tf():
    """String-plane sentinel filter (the reference's
    Addons>GatherStrValueGenIndice: keep values != not_equal, regenerate
    indices — gather_str_value_gen_indice_ops.cc:31-58).  A real TF1 graph
    filters split pieces != "NA" via the NotEqual+Where+Gather idiom
    before hashing; the import must carry a FilterStrSentinel on the
    string plane (BEFORE HashBucket) and serve bit-exact vs the session."""
    from recom_tpu.ir.spec import FilterStrSentinel, HashBucket

    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(5)
        sp_in = tf1.placeholder(tf.string, [None], name="tags")
        sp = tf1.string_split(sp_in, sep=";")
        mask = tf.not_equal(sp.values, tf.constant("NA"))
        keep = tf.where(mask)                      # [n, 1] int64
        vals = tf.gather_nd(sp.values, keep)
        idxs = tf.gather_nd(sp.indices, keep)
        filtered = tf.sparse.SparseTensor(idxs, tf.strings.to_hash_bucket_fast(
            vals, 97), sp.dense_shape)
        table = tf1.get_variable(
            "emb_tags", shape=[97, 4],
            initializer=tf1.random_normal_initializer(seed=3),
        )
        pooled = tf.nn.safe_embedding_lookup_sparse(
            table, filtered, combiner="mean", default_id=None,
            name="tags_pool",
        )
        # a second, unfiltered hash column so the output concat has >1 input
        b_in = tf1.placeholder(tf.string, [None], name="cat")
        ids2 = tf.reshape(
            tf.strings.to_hash_bucket_fast(b_in, 31), [-1, 1]
        )
        table2 = tf1.get_variable(
            "emb_cat", shape=[31, 4],
            initializer=tf1.random_normal_initializer(seed=4),
        )
        pooled2 = tf.reduce_mean(tf.gather(table2, ids2), axis=1)
        out = tf.concat([pooled, pooled2], axis=1, name="out")

        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            rows = []
            for _ in range(12):
                pieces = ["t%d" % v for v in rng.integers(
                    0, 10**4, rng.integers(0, 5))]
                # plant the sentinel in ~half the rows, incl. sentinel-only
                if rng.random() < 0.5:
                    pieces.insert(
                        int(rng.integers(0, len(pieces) + 1)), "NA"
                    )
                rows.append(";".join(pieces))
            rows[0] = "NA"          # sentinel-only row -> empty -> zeros
            rows[1] = "NA;NA"
            feed = {
                sp_in: np.asarray(rows),
                b_in: np.asarray(
                    ["c%d" % v for v in rng.integers(0, 999, 12)]
                ),
            }
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"]
            )

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="str_sentinel"
    )
    tags_col = next(
        c for c in model.columns if c.source.kind.name == "STRING_LIST"
    )
    # the filter must sit on the string plane, BEFORE the hash (a trailing
    # FilterRange from safe_embedding's ids>=0 prune may follow — the
    # interval passes drop it as a no-op at compile)
    kinds = [type(t).__name__ for t in tags_col.transforms]
    assert kinds[:2] == ["FilterStrSentinel", "HashBucket"], kinds
    assert tags_col.transforms[0].sentinel == "NA"

    params = init_model_params(model)
    for t, w in weights.items():
        params["tables"][t] = w
    eng = Engine(
        model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
        params=params,
    )
    batch = {"tags": feed[sp_in], "cat": feed[b_in]}
    out2 = eng.predict(batch, return_pooled=True)
    cat_col = next(
        c for c in model.columns
        if c.source.kind.name == "STRING" and c is not tags_col
    )
    np.testing.assert_array_equal(
        out2["pooled"][tags_col.name], want[:, :4], err_msg="filtered tags"
    )
    np.testing.assert_array_equal(
        out2["pooled"][cat_col.name], want[:, 4:], err_msg="cat"
    )

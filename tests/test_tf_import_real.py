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

"""Post-lookup IR stage (PostPool): per-column compute on the pooled
output — the expressible analogue of the reference's post-lookup column
subgraphs (BatchColReduction cuda_emitter.cc:1180-1244; elementwise
rewrites post_lookup_optimizer.cc:480-608).

Contract: the POOLED outputs stay bit-exact vs the oracle; post outputs
(concat/model output) match the oracle to float tolerance (reduction
association may differ between numpy and XLA, as it did between the
reference's CUDA tree reductions and TF)."""

import numpy as np
import pytest

from recom_tpu import Engine, EngineConfig, PostPool
from recom_tpu.ir.spec import (
    Bucketize,
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    HashBucket,
    LookupSpec,
    ModelSpec,
    TableSpec,
    TowerSpec,
)
from recom_tpu.models import make_random_batch
from recom_tpu.oracle import OracleModel
from recom_tpu.utils.params import init_model_params


def make_post_model():
    tables = {
        "t_bz": TableSpec("t_bz", 11, 8),
        "t_h": TableSpec("t_h", 500, 8),
        "t_sp": TableSpec("t_sp", 300, 8),
        "t_keep": TableSpec("t_keep", 64, 4),
    }
    bz = Bucketize(list(range(0, 50, 5)))
    cols = [
        # pallas-eligible bucketize group member WITH a reduce
        FeatureColumn("rb", FeatureSource("rb", FeatureKind.DENSE_FLOAT),
                      (bz,), LookupSpec("t_bz", Combiner.MEAN),
                      post=(PostPool("reduce_sum"),)),
        # gather-path hash column with affine then reduce_mean
        FeatureColumn("rh", FeatureSource("rh", FeatureKind.STRING),
                      (HashBucket(500),), LookupSpec("t_h", Combiner.MEAN),
                      post=(PostPool("affine", scale=(2.0,), bias=(0.5,)),
                            PostPool("reduce_mean"))),
        # ragged column with per-dim affine (no width change)
        FeatureColumn("ra", FeatureSource("ra", FeatureKind.STRING_LIST,
                                          delimiter=";"),
                      (HashBucket(300),), LookupSpec("t_sp", Combiner.SUM),
                      post=(PostPool("affine",
                                     scale=tuple(float(i + 1)
                                                 for i in range(8))),)),
        # plain column in the same group as a post column
        FeatureColumn("keep", FeatureSource("keep", FeatureKind.STRING),
                      (HashBucket(64),), LookupSpec("t_keep", Combiner.MEAN)),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
    ]
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(8, 1),
                      final_activation=None)
    return ModelSpec("post", tables, cols, tower)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_post_lookup_matches_oracle(use_pallas):
    model = make_post_model()
    batch = make_random_batch(model, 33, seed=4)
    params = init_model_params(model)
    oracle = OracleModel(model, params=params)
    eng = Engine(
        model,
        EngineConfig(interpret=True, use_pallas=use_pallas,
                     batch_buckets=(64,)),
        params=params,
    )
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = oracle.forward(batch)

    # pooled (pre-post) stays bit-exact
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    # concat includes post outputs: widths 1 (reduce) + 1 + 8 + 4 + dense 1
    assert out["concat"].shape == ref["concat"].shape == (33, 15)
    np.testing.assert_allclose(
        out["concat"], ref["concat"], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        out["output"], ref["output"], rtol=1e-5, atol=1e-6
    )


def test_post_widths_and_serde_roundtrip():
    from recom_tpu.ir.serde import model_from_dict, model_to_dict
    from recom_tpu.ir.spec import column_out_width

    model = make_post_model()
    widths = {
        c.name: column_out_width(model, c)
        for c in model.embedding_columns
    }
    assert widths == {"rb": 1, "rh": 1, "ra": 8, "keep": 4}

    rt = model_from_dict(model_to_dict(model))
    assert [c.post for c in rt.columns] == [c.post for c in model.columns]
    assert rt.columns[0].source.int_range == model.columns[0].source.int_range


def test_post_rejected_for_dlrm_dot():
    tables = {"t": TableSpec("t", 10, 8)}
    cols = [
        FeatureColumn("a", FeatureSource("a", FeatureKind.DENSE_FLOAT),
                      (Bucketize([1.0]),), LookupSpec("t", Combiner.MEAN),
                      post=(PostPool("reduce_sum"),)),
        FeatureColumn("d", FeatureSource("d", FeatureKind.DENSE_FLOAT)),
    ]
    with pytest.raises(ValueError, match="dlrm_dot"):
        ModelSpec("bad", tables, cols,
                  TowerSpec(arch="dlrm_dot", bottom_mlp=(8,),
                            top_mlp=(4, 1)))


def test_import_sum_after_lookup_as_post_reduce():
    """A frozen TF graph whose column Sums over the embedding dim after
    the lookup imports as PostPool('reduce_sum') and matches TF."""
    import os

    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    from recom_tpu.importers.tf_graph import import_params, import_tf_graphdef

    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(2)
        a_in = tf1.placeholder(tf.string, [None], name="aa")
        b_in = tf1.placeholder(tf.string, [None], name="bb")
        pooled = []
        for nm, ph, nb in (("aa", a_in, 64), ("bb", b_in, 128)):
            vals = tf.strings.to_hash_bucket_fast(ph, nb)
            n = tf.cast(tf.shape(vals)[0], tf.int64)
            idx = tf.stack([tf.range(n), tf.zeros([n], tf.int64)], axis=1)
            sp = tf.sparse.SparseTensor(idx, vals, tf.stack([n, 1]))
            table = tf1.get_variable(
                f"emb_{nm}", shape=[nb, 4], use_resource=False,
                initializer=tf1.random_normal_initializer(seed=5))
            p = tf.nn.safe_embedding_lookup_sparse(
                table, sp, combiner="mean", default_id=None,
                name=f"{nm}_pool")
            pooled.append(p)
        # column aa: Sum over the embedding dim (BatchColReduction shape)
        red = tf.reshape(tf.reduce_sum(pooled[0], axis=1), [-1, 1])
        out = tf.concat([red, pooled[1]], axis=1, name="out")
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            feed = {a_in: np.asarray(["x%d" % v for v in range(10)]),
                    b_in: np.asarray(["y%d" % v for v in range(10)])}
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])

    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="ps")
    post_cols = [c for c in model.embedding_columns if c.post]
    assert len(post_cols) == 1
    assert post_cols[0].post[0].op == "reduce_sum"

    feed2 = {}
    for c in model.embedding_columns:
        f = c.source.field
        feed2[f] = feed[a_in] if "aa" in f else feed[b_in]
    eng = Engine(model, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=import_params(model, weights))
    got = eng.predict(feed2, return_concat=True)["concat"]
    # engine concat is [embeddings in import order]; same here (no dense)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

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


def make_softmax_mul_model():
    """Softmax + mul_column posts, incl. a HIDDEN operand column and a
    cross-GROUP operand (dim-8 ragged operand for a dim-8 dense column)."""
    tables = {
        "t_a": TableSpec("t_a", 200, 8),
        "t_b": TableSpec("t_b", 300, 8),
        "t_sp": TableSpec("t_sp", 150, 8),
        "t_sm": TableSpec("t_sm", 64, 4),
    }
    cols = [
        # visible product column: a * pooled(b_hidden)
        FeatureColumn("a", FeatureSource("a", FeatureKind.STRING),
                      (HashBucket(200),), LookupSpec("t_a", Combiner.MEAN),
                      post=(PostPool("mul_column", other="b_hidden"),)),
        # hidden operand: pools, occupies no concat slot
        FeatureColumn("b_hidden", FeatureSource("bh", FeatureKind.STRING),
                      (HashBucket(300),), LookupSpec("t_b", Combiner.SUM),
                      in_concat=False),
        # cross-group operand: ragged column multiplied by the dense "a"
        FeatureColumn("sp", FeatureSource("sp", FeatureKind.STRING_LIST,
                                          delimiter=";"),
                      (HashBucket(150),), LookupSpec("t_sp", Combiner.SUM),
                      post=(PostPool("mul_column", other="a"),)),
        # softmax over the embedding dim
        FeatureColumn("sm", FeatureSource("sm", FeatureKind.STRING),
                      (HashBucket(64),), LookupSpec("t_sm", Combiner.MEAN),
                      post=(PostPool("softmax"),)),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
    ]
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(8, 1),
                      final_activation=None)
    return ModelSpec("postsm", tables, cols, tower)


@pytest.mark.parametrize("wire", [True, False])
def test_softmax_and_mul_column_match_oracle(wire):
    model = make_softmax_mul_model()
    batch = make_random_batch(model, 29, seed=9)
    params = init_model_params(model)
    oracle = OracleModel(model, params=params)
    eng = Engine(
        model,
        EngineConfig(interpret=True, wire_pack=wire, batch_buckets=(32,)),
        params=params,
    )
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = oracle.forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    # concat: dense(1) + a(8) + sp(8) + sm(4); b_hidden contributes NO slot
    assert out["concat"].shape == ref["concat"].shape == (29, 21)
    np.testing.assert_allclose(
        out["concat"], ref["concat"], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        out["output"], ref["output"], rtol=1e-5, atol=1e-6
    )
    # mul_column semantics: slot 'a' equals rawpooled(a) * rawpooled(b)
    want = ref["pooled"]["a"] * ref["pooled"]["b_hidden"]
    np.testing.assert_allclose(
        out["concat"][:, 1:9], want, rtol=1e-6, atol=1e-6
    )
    # softmax rows sum to 1
    sm = out["concat"][:, 17:21]
    np.testing.assert_allclose(sm.sum(axis=1), 1.0, rtol=1e-5)


def test_mul_column_validation():
    tables = {"t": TableSpec("t", 10, 8), "t2": TableSpec("t2", 10, 4)}
    with pytest.raises(ValueError, match="not an embedding column"):
        ModelSpec("bad", tables, [
            FeatureColumn("a", FeatureSource("a", FeatureKind.STRING),
                          (HashBucket(10),), LookupSpec("t", Combiner.MEAN),
                          post=(PostPool("mul_column", other="nope"),)),
        ], TowerSpec(arch="mlp", top_mlp=(1,)))
    with pytest.raises(ValueError, match="chain is width"):
        ModelSpec("bad2", tables, [
            FeatureColumn("a", FeatureSource("a", FeatureKind.STRING),
                          (HashBucket(10),), LookupSpec("t", Combiner.MEAN),
                          post=(PostPool("mul_column", other="b"),)),
            FeatureColumn("b", FeatureSource("b", FeatureKind.STRING),
                          (HashBucket(10),), LookupSpec("t2", Combiner.MEAN)),
        ], TowerSpec(arch="mlp", top_mlp=(1,)))


def test_serde_roundtrip_softmax_mul_hidden():
    from recom_tpu.ir.serde import model_from_dict, model_to_dict

    model = make_softmax_mul_model()
    rt = model_from_dict(model_to_dict(model))
    assert [c.post for c in rt.columns] == [c.post for c in model.columns]
    assert [c.in_concat for c in rt.columns] == (
        [c.in_concat for c in model.columns]
    )


def test_import_softmax_after_lookup_as_post():
    """Frozen TF graph: softmax over the pooled embedding dim imports as
    PostPool('softmax') and matches the TF session output."""
    import os

    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    from recom_tpu.importers.tf_graph import import_params, import_tf_graphdef

    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(3)
        tbl = tf.constant(rng.standard_normal((32, 4)).astype(np.float32))
        ph = tf1.placeholder(tf.string, [None], name="s")
        ids = tf.strings.to_hash_bucket_fast(ph, 32)
        emb = tf.nn.embedding_lookup(tbl, ids)
        sm = tf.nn.softmax(emb)
        slots = [sm]
        phs = {"s": ph}
        for i in range(5):
            p = tf1.placeholder(tf.float32, [None], name=f"d{i}")
            phs[f"d{i}"] = p
            slots.append(tf.reshape(p, [-1, 1]))
        out = tf.identity(tf.concat(slots, axis=1), name="out")
        with tf1.Session(graph=g) as sess:
            feed = {phs["s"]: np.asarray([f"v{i}" for i in range(16)])}
            for i in range(5):
                feed[phs[f"d{i}"]] = rng.standard_normal(16).astype(np.float32)
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="sm", strict=True)
    (col,) = model.embedding_columns
    assert col.post and col.post[0].op == "softmax"
    params = import_params(model, weights)
    eng = Engine(model, EngineConfig(interpret=True), params=params)
    batch = {"s": feed[phs["s"]]}
    for i in range(5):
        batch[f"d{i}"] = feed[phs[f"d{i}"]]
    got = eng.predict(batch, return_concat=True)["concat"]
    # engine concat = [dense..., emb]; TF slot order = [emb, dense...]
    want_eng = np.concatenate([want[:, 4:], want[:, :4]], axis=1)
    np.testing.assert_allclose(got, want_eng, rtol=1e-6, atol=1e-6)


def test_matmul_post_matches_oracle_and_serde():
    """PostPool('matmul') — the push-MatMul-under-sparse rewrite
    (post_lookup_optimizer.cc:227-309) in the pooled domain: projection
    widths flow through the concat; engine matches the oracle."""
    from recom_tpu.ir.serde import model_from_dict, model_to_dict
    from recom_tpu.ir.spec import column_out_width

    rng = np.random.default_rng(12)
    w_85 = tuple(tuple(rng.uniform(-1, 1, 5)) for _ in range(8))
    w_43 = tuple(tuple(rng.uniform(-1, 1, 3)) for _ in range(4))
    tables = {"t8": TableSpec("t8", 100, 8), "t4": TableSpec("t4", 40, 4)}
    cols = [
        # plain projection 8 -> 5
        FeatureColumn("pa", FeatureSource("pa", FeatureKind.STRING),
                      (HashBucket(100),), LookupSpec("t8", Combiner.MEAN),
                      post=(PostPool("matmul", weight=w_85),)),
        # softmax then projection 4 -> 3 then reduce
        FeatureColumn("pb", FeatureSource("pb", FeatureKind.STRING),
                      (HashBucket(40),), LookupSpec("t4", Combiner.SUM),
                      post=(PostPool("softmax"),
                            PostPool("matmul", weight=w_43),
                            PostPool("reduce_sum"))),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
    ]
    model = ModelSpec("pm", tables, cols,
                      TowerSpec(arch="mlp", top_mlp=(8, 1)))
    assert column_out_width(model, model.columns[0]) == 5
    assert column_out_width(model, model.columns[1]) == 1

    rt = model_from_dict(model_to_dict(model))
    assert [c.post for c in rt.columns] == [c.post for c in model.columns]

    batch = make_random_batch(model, 21, seed=3)
    params = init_model_params(model)
    oracle = OracleModel(model, params=params)
    eng = Engine(model, EngineConfig(interpret=True, batch_buckets=(32,)),
                 params=params)
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = oracle.forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    # concat: dense(1) + pa(5) + pb(1)
    assert out["concat"].shape == ref["concat"].shape == (21, 7)
    np.testing.assert_allclose(
        out["concat"], ref["concat"], rtol=1e-6, atol=1e-6
    )

    # bad width fails loudly
    with pytest.raises(ValueError, match="width"):
        column_out_width(
            model,
            FeatureColumn("bad", FeatureSource("x", FeatureKind.STRING),
                          (HashBucket(10),), LookupSpec("t8", Combiner.MEAN),
                          post=(PostPool("matmul", weight=w_43),)),
        )


def test_import_matmul_after_lookup_as_post():
    """Frozen TF graph: pooled lookup @ const W imports as
    PostPool('matmul') and matches the TF session output."""
    import os

    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    from recom_tpu.importers.tf_graph import import_params, import_tf_graphdef

    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(8)
        tbl = tf.constant(rng.standard_normal((32, 4)).astype(np.float32))
        proj = tf.constant(rng.standard_normal((4, 6)).astype(np.float32))
        ph = tf1.placeholder(tf.string, [None], name="s")
        ids = tf.strings.to_hash_bucket_fast(ph, 32)
        emb = tf.nn.embedding_lookup(tbl, ids)
        mm = tf.matmul(emb, proj)
        slots = [mm]
        phs = {"s": ph}
        for i in range(5):
            p = tf1.placeholder(tf.float32, [None], name=f"d{i}")
            phs[f"d{i}"] = p
            slots.append(tf.reshape(p, [-1, 1]))
        out = tf.identity(tf.concat(slots, axis=1), name="out")
        with tf1.Session(graph=g) as sess:
            feed = {phs["s"]: np.asarray([f"q{i*3}" for i in range(16)])}
            for i in range(5):
                feed[phs[f"d{i}"]] = rng.standard_normal(16).astype(np.float32)
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="mmp", strict=True)
    (col,) = model.embedding_columns
    assert col.post and col.post[0].op == "matmul"
    assert len(col.post[0].weight) == 4
    assert len(col.post[0].weight[0]) == 6
    params = import_params(model, weights)
    eng = Engine(model, EngineConfig(interpret=True), params=params)
    batch = {"s": feed[phs["s"]]}
    for i in range(5):
        batch[f"d{i}"] = feed[phs[f"d{i}"]]
    got = eng.predict(batch, return_concat=True)["concat"]
    # engine concat = [dense..., emb]; TF slot order = [emb(6), dense...]
    want_eng = np.concatenate([want[:, 6:], want[:, :6]], axis=1)
    np.testing.assert_allclose(got, want_eng, rtol=1e-5, atol=1e-6)


def test_import_softmax_matmul_sum_chain_as_post():
    """Frozen TF graph: Softmax -> MatMul(W) -> Sum(axis 1) after the
    lookup imports as the peeled 3-op post chain and matches TF."""
    import os

    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    from recom_tpu.importers.tf_graph import import_params, import_tf_graphdef

    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(14)
        tbl = tf.constant(rng.standard_normal((24, 4)).astype(np.float32))
        proj = tf.constant(rng.standard_normal((4, 3)).astype(np.float32))
        ph = tf1.placeholder(tf.string, [None], name="s")
        ids = tf.strings.to_hash_bucket_fast(ph, 24)
        emb = tf.nn.embedding_lookup(tbl, ids)
        y = tf.reshape(
            tf.reduce_sum(tf.matmul(tf.nn.softmax(emb), proj), axis=1),
            [-1, 1],
        )
        slots = [y]
        phs = {"s": ph}
        for i in range(5):
            p = tf1.placeholder(tf.float32, [None], name=f"d{i}")
            phs[f"d{i}"] = p
            slots.append(tf.reshape(p, [-1, 1]))
        out = tf.identity(tf.concat(slots, axis=1), name="out")
        with tf1.Session(graph=g) as sess:
            feed = {phs["s"]: np.asarray([f"z{i*5}" for i in range(12)])}
            for i in range(5):
                feed[phs[f"d{i}"]] = rng.standard_normal(12).astype(np.float32)
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="chain", strict=True)
    (col,) = model.embedding_columns
    assert [p.op for p in col.post] == ["softmax", "matmul", "reduce_sum"]
    params = import_params(model, weights)
    eng = Engine(model, EngineConfig(interpret=True), params=params)
    batch = {"s": feed[phs["s"]]}
    for i in range(5):
        batch[f"d{i}"] = feed[phs[f"d{i}"]]
    got = eng.predict(batch, return_concat=True)["concat"]
    want_eng = np.concatenate([want[:, 1:], want[:, :1]], axis=1)
    np.testing.assert_allclose(got, want_eng, rtol=1e-5, atol=1e-6)


def test_import_mul_of_two_lookups_as_mul_column():
    """Frozen TF graph: one concat slot = Mul of two pooled lookups
    imports as a visible column with post=mul_column plus a HIDDEN
    operand column, matching the TF session bit-for-bit at the output."""
    import os

    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1

    from recom_tpu.importers.tf_graph import import_params, import_tf_graphdef

    g = tf.Graph()
    with g.as_default():
        rng = np.random.default_rng(5)
        ta = tf.constant(rng.standard_normal((64, 4)).astype(np.float32))
        tb = tf.constant(rng.standard_normal((48, 4)).astype(np.float32))
        pa = tf1.placeholder(tf.string, [None], name="fa")
        pb = tf1.placeholder(tf.string, [None], name="fb")
        ids_a = tf.strings.to_hash_bucket_fast(pa, 64)
        ids_b = tf.strings.to_hash_bucket_fast(pb, 48)
        # pooled lookups via sparse segment ops (one id per row)
        seg = tf.range(tf.shape(ids_a)[0])
        ea = tf.sparse.segment_sum(
            tf.nn.embedding_lookup(ta, ids_a), tf.range(tf.size(ids_a)), seg)
        eb = tf.sparse.segment_sum(
            tf.nn.embedding_lookup(tb, ids_b), tf.range(tf.size(ids_b)), seg)
        prod = ea * eb
        slots = [prod]
        phs = {"fa": pa, "fb": pb}
        for i in range(5):
            p = tf1.placeholder(tf.float32, [None], name=f"d{i}")
            phs[f"d{i}"] = p
            slots.append(tf.reshape(p, [-1, 1]))
        out = tf.identity(tf.concat(slots, axis=1), name="out")
        with tf1.Session(graph=g) as sess:
            feed = {
                phs["fa"]: np.asarray([f"a{i}" for i in range(16)]),
                phs["fb"]: np.asarray([f"b{i*7}" for i in range(16)]),
            }
            for i in range(5):
                feed[phs[f"d{i}"]] = rng.standard_normal(16).astype(np.float32)
            want = sess.run(out, feed)
            frozen = tf1.graph_util.convert_variables_to_constants(
                sess, g.as_graph_def(), ["out"])
    model, weights = import_tf_graphdef(
        frozen.SerializeToString(), name="mul", strict=True)
    embs = model.embedding_columns
    assert len(embs) == 2
    hidden = [c for c in embs if not c.in_concat]
    visible = [c for c in embs if c.in_concat]
    assert len(hidden) == 1 and len(visible) == 1
    assert visible[0].post[0].op == "mul_column"
    assert visible[0].post[0].other == hidden[0].name
    params = import_params(model, weights)
    eng = Engine(model, EngineConfig(interpret=True), params=params)
    batch = {"fa": feed[phs["fa"]], "fb": feed[phs["fb"]]}
    for i in range(5):
        batch[f"d{i}"] = feed[phs[f"d{i}"]]
    got = eng.predict(batch, return_concat=True)["concat"]
    want_eng = np.concatenate([want[:, 4:], want[:, :4]], axis=1)
    np.testing.assert_allclose(got, want_eng, rtol=1e-6, atol=1e-6)

"""Oracle semantics validated against REAL TensorFlow (the environment has
TF CPU installed).  These are the strongest bit-exactness checks in the
suite: every TF-compat claim — FarmHash bucketing, int-key hashing,
Bucketize boundaries, safe_embedding_lookup_sparse pooling with empty rows
and weights, crossed_column — is compared against the genuine article, not
against our own reimplementation.
"""

import os

import numpy as np
import pytest

# oneDNN rewrites elementwise ops with different rounding (TF logs say so
# explicitly); the bit-exactness contract targets stock TF numerics
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
tf = pytest.importorskip("tensorflow")

from recom_tpu.oracle.hashing import cross_hash, hash_bucket_fast
from recom_tpu.oracle.reference import OracleModel
from recom_tpu.ir.spec import (
    Bucketize,
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    HashBucket,
    LookupSpec,
    ModelSpec,
    NumToId,
    TableSpec,
    TowerSpec,
)


def test_string_hash_bucket_matches_tf():
    rng = np.random.default_rng(0)
    vals = ["u%d" % v for v in rng.integers(0, 10**7, 200)] + ["", "a", "~"]
    for nb in (2, 100, 10**6):
        want = tf.strings.to_hash_bucket_fast(vals, nb).numpy()
        got = hash_bucket_fast(vals, nb)
        np.testing.assert_array_equal(got, want)


def test_int_hash_bucket_matches_tf_feature_column():
    ints = np.array([0, 1, -1, 7, 12345, -987654321, 2**40], np.int64)
    fc = tf.feature_column
    col = fc.categorical_column_with_hash_bucket(
        "x", hash_bucket_size=1000, dtype=tf.int64
    )
    dense = tf.compat.v1.feature_column.input_layer(
        {"x": tf.constant(ints.reshape(-1, 1))}, [fc.indicator_column(col)]
    ).numpy()
    # TF treats -1 as MISSING (ignore_value): its indicator row is all zero
    assert dense[2].sum() == 0
    present = [i for i, v in enumerate(ints) if v != -1]
    want = np.argmax(dense[present], axis=1)
    got = hash_bucket_fast([int(ints[i]) for i in present], 1000)
    np.testing.assert_array_equal(got, want)

    # engine-side: a -1 dense-int input pools to zeros, like TF
    from recom_tpu import Engine, EngineConfig

    m = ModelSpec(
        "ign", {"t": TableSpec("t", 1000, 4)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.DENSE_INT),
                       (HashBucket(1000),), LookupSpec("t", Combiner.MEAN))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(8,)))
    out = eng.predict({"x": np.array([5, -1, 7], np.int64)},
                      return_pooled=True)
    np.testing.assert_array_equal(out["pooled"]["c"][1], np.zeros(4))
    ref = OracleModel(m).forward({"x": np.array([5, -1, 7], np.int64)})
    np.testing.assert_array_equal(out["pooled"]["c"], ref["pooled"]["c"])


def test_bucketize_matches_tf():
    bounds = [0.0, 10.0, 10.5, 100.0]
    x = np.array(
        [-5.0, 0.0, 9.99, 10.0, 10.25, 10.5, 99.0, 100.0, 1e9], np.float32
    )
    want = tf.raw_ops.Bucketize(input=x, boundaries=bounds).numpy()
    from recom_tpu.oracle.reference import SparseFeature, apply_transform

    sp = SparseFeature(
        x.astype(np.float64), np.arange(len(x)), None, len(x)
    )
    got = apply_transform(Bucketize(bounds), sp).values
    np.testing.assert_array_equal(np.asarray(got, np.int32), want)


@pytest.mark.parametrize("combiner", ["mean", "sum", "sqrtn"])
def test_safe_embedding_lookup_sparse_pooling_bitexact(combiner):
    """Pooled embeddings (incl. EMPTY rows and weighted variants) must be
    bit-for-bit identical to tf.nn.safe_embedding_lookup_sparse."""
    rng = np.random.default_rng(1)
    V, d, B = 50, 8, 16
    table = rng.standard_normal((V, d)).astype(np.float32)
    rows = [list(rng.integers(0, V, rng.integers(0, 6))) for _ in range(B)]
    rows[3] = []
    weights = [list(rng.random(len(r)).astype(np.float32)) for r in rows]

    # --- TF ground truth
    idx = [[i, j] for i, r in enumerate(rows) for j in range(len(r))]
    vals = [v for r in rows for v in r]
    wvals = [w for ws in weights for w in ws]
    sp = tf.sparse.SparseTensor(idx or np.zeros((0, 2), np.int64),
                                np.asarray(vals, np.int64), [B, 8])
    spw = tf.sparse.SparseTensor(idx or np.zeros((0, 2), np.int64),
                                 np.asarray(wvals, np.float32), [B, 8])
    want = tf.nn.safe_embedding_lookup_sparse(
        tf.constant(table), sp, sparse_weights=spw, combiner=combiner,
        default_id=None,
    ).numpy()

    # --- our oracle
    comb = {"mean": Combiner.MEAN, "sum": Combiner.SUM,
            "sqrtn": Combiner.SQRTN}[combiner]
    m = ModelSpec(
        "gt", {"t": TableSpec("t", V, d)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                       (NumToId(V),),
                       LookupSpec("t", comb, weight_field="w"))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(m)
    params["tables"]["t"] = table
    oracle = OracleModel(m, params=params)
    got = oracle.forward({"x": rows, "w": weights})["pooled"]["c"]
    if combiner == "sqrtn":
        # TF's weighted sqrtn squares weights with Eigen pow(w, 2), which
        # is itself ~1 ulp off exact w*w — the divisor (not our math)
        # differs; mean/sum are bit-exact, sqrtn matches to 1 ulp.
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=2e-7)
    else:
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("comb", ["mean", "sqrt_n"])
def test_unweighted_segment_kernels_bitexact(comb):
    """tf.sparse.segment_mean / segment_sqrt_n multiply by the f32
    reciprocal of the denominator; our unweighted path mirrors that and
    must be bit-exact."""
    rng = np.random.default_rng(5)
    V, d, B = 40, 8, 10
    table = rng.standard_normal((V, d)).astype(np.float32)
    rows = [list(rng.integers(0, V, rng.integers(1, 7))) for _ in range(B)]
    ids = np.asarray([v for r in rows for v in r], np.int64)
    segs = np.asarray([i for i, r in enumerate(rows) for _ in r], np.int64)
    fn = tf.sparse.segment_mean if comb == "mean" else tf.sparse.segment_sqrt_n
    want = fn(tf.constant(table), tf.constant(ids), tf.constant(segs)).numpy()

    from recom_tpu.utils.params import init_model_params

    c = Combiner.MEAN if comb == "mean" else Combiner.SQRTN
    m = ModelSpec(
        "uw", {"t": TableSpec("t", V, d)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                       (NumToId(V),), LookupSpec("t", c))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    params = init_model_params(m)
    params["tables"]["t"] = table
    got = OracleModel(m, params=params).forward({"x": rows})["pooled"]["c"]
    np.testing.assert_array_equal(got, want)

    from recom_tpu import Engine, EngineConfig

    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=params)
    got2 = eng.predict({"x": rows}, return_pooled=True)["pooled"]["c"]
    np.testing.assert_array_equal(got2, want)


def test_crossed_column_matches_tf():
    fc = tf.feature_column
    cc = fc.crossed_column(["a", "b"], hash_bucket_size=1000)
    feats = {
        "a": tf.constant([["u1"], ["u2"], ["q"]]),
        "b": tf.constant([["x"], ["y"], ["zz"]]),
    }
    dense = tf.compat.v1.feature_column.input_layer(
        feats, [fc.indicator_column(cc)]
    ).numpy()
    want = np.argmax(dense, axis=1)
    got = [
        cross_hash(("u1", "x"), 1000),
        cross_hash(("u2", "y"), 1000),
        cross_hash(("q", "zz"), 1000),
    ]
    np.testing.assert_array_equal(got, want)


def test_engine_pooled_matches_tf_end_to_end():
    """Engine (device path) pooled outputs == tf.nn.safe_embedding_lookup_
    sparse on the same table — closing the loop oracle <-> engine <-> TF."""
    from recom_tpu import Engine, EngineConfig

    rng = np.random.default_rng(3)
    V, d, B = 64, 4, 12
    table = rng.standard_normal((V, d)).astype(np.float32)
    rows = [list(rng.integers(0, V, rng.integers(0, 5))) for _ in range(B)]
    rows[0] = []

    idx = [[i, j] for i, r in enumerate(rows) for j in range(len(r))]
    vals = [v for r in rows for v in r]
    sp = tf.sparse.SparseTensor(idx, np.asarray(vals, np.int64), [B, 8])
    want = tf.nn.safe_embedding_lookup_sparse(
        tf.constant(table), sp, combiner="mean", default_id=None
    ).numpy()

    m = ModelSpec(
        "gte", {"t": TableSpec("t", V, d)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                       (NumToId(V),), LookupSpec("t", Combiner.MEAN))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    from recom_tpu.utils.params import init_model_params

    params = init_model_params(m)
    params["tables"]["t"] = table
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(16,)),
                 params=params)
    got = eng.predict({"x": rows}, return_pooled=True)["pooled"]["c"]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(3))
def test_random_model_output_matches_tf_baseline(seed):
    """Random TF-expressible models: the Engine's final output must match
    the REAL TF graph (tools/tf_baseline) on the same weights to fp
    tolerance (tower matmul orderings differ; lookups themselves are
    bit-exact per the other tests)."""
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.tools.tf_baseline import build_tf_baseline
    from recom_tpu.utils.params import init_model_params

    rng = np.random.default_rng(200 + seed)
    m = make_dlrm_model(
        int(rng.integers(2, 8)), int(rng.integers(1, 4)),
        int(rng.integers(1, 4)), int(rng.integers(1, 3)), 0,
        int(rng.integers(1, 5)), [8], [16, 8, 1],
        name=f"tfz{seed}", large_rows=4096,
    )
    params = init_model_params(m)
    batch = make_random_batch(m, 32, seed=seed)

    fn, make_feed = build_tf_baseline(m, params)
    want = fn(make_feed(batch)).numpy()

    eng = Engine(m, EngineConfig(use_pallas=bool(seed % 2), interpret=True,
                                 batch_buckets=(32,)), params=params)
    got = eng.predict(batch)["output"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weighted_and_softmax_model_matches_tf_baseline():
    """Weighted + softmax-scored + identity-id columns through the REAL TF
    baseline graph: tf_baseline feeds the aligned ragged score list as
    sparse_weights (tf.sparse.softmax for Combiner.SOFTMAX — the
    reference's SparseSoftmax + SequenceMask pattern,
    post_lookup_optimizer.cc:311-478), so the engine's full forward must
    match TF, not a uniform-score approximation."""
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.tools.tf_baseline import build_tf_baseline
    from recom_tpu.utils.params import init_model_params

    m = ModelSpec(
        "tfw",
        {
            "t1": TableSpec("t1", 50, 8),
            "t2": TableSpec("t2", 64, 8),
            "t3": TableSpec("t3", 40, 8),
        },
        [
            FeatureColumn(
                "c_sm",
                FeatureSource("s_sm", FeatureKind.STRING_LIST, delimiter=","),
                (HashBucket(50),),
                LookupSpec("t1", Combiner.SOFTMAX, weight_field="w_sm"),
            ),
            FeatureColumn(
                "c_wmean",
                FeatureSource("s_wm", FeatureKind.STRING_LIST, delimiter=","),
                (HashBucket(64),),
                LookupSpec("t2", Combiner.MEAN, weight_field="w_wm"),
            ),
            FeatureColumn(
                "c_int",
                FeatureSource("xi", FeatureKind.INT_LIST),
                (NumToId(40),),
                LookupSpec("t3", Combiner.SUM),
            ),
        ],
        TowerSpec(arch="mlp", top_mlp=(16, 1)),
    )
    params = init_model_params(m)
    # num_range=40 keeps identity ids inside NumToId's valid range (the TF
    # identity column does not clamp; out-of-range is the caller's breach)
    batch = make_random_batch(m, 24, seed=7, num_range=40)

    fn, make_feed = build_tf_baseline(m, params)
    want = fn(make_feed(batch)).numpy()

    eng = Engine(m, EngineConfig(use_pallas=False, interpret=True,
                                 batch_buckets=(24,)), params=params)
    got = eng.predict(batch)["output"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weighted_scalar_columns_match_tf_baseline():
    """Weighted SINGLE-VALUE columns (spec-legal; the fuzzer generates
    them): the TF baseline previously ignored weight_field on scalar
    sources entirely — a silent w-times divergence in the 'ground truth'.
    Now it routes them through the sparse formulation."""
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.tools.tf_baseline import build_tf_baseline
    from recom_tpu.utils.params import init_model_params

    m = ModelSpec(
        "wsc",
        {"t1": TableSpec("t1", 32, 4), "t2": TableSpec("t2", 64, 4),
         "t3": TableSpec("t3", 11, 4)},
        [
            FeatureColumn("ci", FeatureSource("xi", FeatureKind.DENSE_INT),
                          (HashBucket(32),),
                          LookupSpec("t1", Combiner.SUM, weight_field="wi")),
            FeatureColumn("cs", FeatureSource("xs", FeatureKind.STRING),
                          (HashBucket(64),),
                          LookupSpec("t2", Combiner.MEAN, weight_field="ws")),
            FeatureColumn("cb", FeatureSource("xb", FeatureKind.DENSE_FLOAT),
                          (Bucketize(list(range(0, 50, 5))),),
                          LookupSpec("t3", Combiner.SQRTN,
                                     weight_field="wb")),
        ],
        TowerSpec(arch="mlp", top_mlp=(8, 1)),
    )
    params = init_model_params(m)
    batch = make_random_batch(m, 20, seed=5, num_range=50)
    # exercise the DENSE_INT missing rule alongside the weights
    batch["xi"] = np.asarray(batch["xi"], np.int64)
    batch["xi"][3] = -1

    fn, make_feed = build_tf_baseline(m, params)
    want = fn(make_feed(batch)).numpy()

    eng = Engine(m, EngineConfig(use_pallas=False, interpret=True,
                                 batch_buckets=(20,)), params=params)
    got = eng.predict(batch)["output"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_identity_default_and_posts_match_tf_baseline():
    """NumToId(default_id=...) out-of-range mapping and PostPool chains
    (affine / reduce / mul_column) must be computed by the TF baseline,
    not silently skipped."""
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.ir.spec import PostPool
    from recom_tpu.models import make_random_batch
    from recom_tpu.tools.tf_baseline import build_tf_baseline
    from recom_tpu.utils.params import init_model_params

    m = ModelSpec(
        "idp",
        {"t": TableSpec("t", 12, 4), "t2": TableSpec("t2", 12, 4)},
        [
            FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                          (NumToId(12, default_id=0),),
                          LookupSpec("t", Combiner.SUM),
                          post=(PostPool("affine", scale=(2.0,),
                                         bias=(0.5, 0.0, -1.0, 3.0)),
                                PostPool("mul_column", other="h"))),
            FeatureColumn("h", FeatureSource("y", FeatureKind.INT_LIST),
                          (NumToId(12, default_id=3),),
                          LookupSpec("t2", Combiner.MEAN),
                          in_concat=False),
        ],
        TowerSpec(arch="mlp", top_mlp=(8, 1)),
    )
    params = init_model_params(m)
    # ids beyond num_ids exercise the default mapping in both systems
    batch = make_random_batch(m, 16, seed=9, num_range=30)

    fn, make_feed = build_tf_baseline(m, params)
    want = fn(make_feed(batch)).numpy()

    eng = Engine(m, EngineConfig(use_pallas=False, interpret=True,
                                 batch_buckets=(16,)), params=params)
    got = eng.predict(batch)["output"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bucketize_f32_boundary_matches_tf():
    """TF stores Bucketize boundaries as f32 (proto list(float)); a
    boundary like 0.7 buckets by its f32 rounding.  The spec now rounds
    at construction, so oracle == engine == TF around the edge."""
    from recom_tpu.oracle.reference import SparseFeature, apply_transform

    bz = Bucketize([0.3, 0.7, 1.1])
    b32 = np.float32(0.7)
    probes = np.asarray([
        0.7, float(b32), float(np.nextafter(b32, np.float32(-1))),
        float(np.nextafter(b32, np.float32(2))), 0.3, 1.1, -5.0, 99.0,
    ], np.float32)
    want = tf.raw_ops.Bucketize(
        input=tf.constant(probes),
        boundaries=[0.3, 0.7, 1.1],      # TF rounds these to f32 itself
    ).numpy()
    sp = SparseFeature(
        row_ids=np.arange(len(probes)),
        values=probes.astype(np.float64),
        weights=None, batch=len(probes),
    )
    got = apply_transform(bz, sp).values
    np.testing.assert_array_equal(got, want)

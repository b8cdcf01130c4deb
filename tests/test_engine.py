import numpy as np
import pytest

from recom_tpu import Engine, EngineConfig
from recom_tpu.ir.spec import (
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    LookupSpec,
    ModelSpec,
    NumToId,
    TableSpec,
    TowerSpec,
)
from recom_tpu.models import make_random_batch
from recom_tpu.models.criteo import make_criteo_dlrm
from recom_tpu.models.synthetic import make_dlrm_model, make_microbenchmark_model
from recom_tpu.oracle import OracleModel

CFG = EngineConfig(use_pallas=False)


def make_mini_e():
    """Scaled model with every reference column type (bucketize, int-hash,
    str-hash, ragged sparse-str, large ragged) + dense + MLP tower."""
    return make_dlrm_model(
        6, 2, 2, 2, 1, 4, [8], [16], name="mini", large_rows=20_000
    )


def assert_pooled_bitexact(model, batch, config=CFG):
    eng = Engine(model, config)
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = OracleModel(model).forward(batch)
    for col, r in ref["pooled"].items():
        np.testing.assert_array_equal(
            out["pooled"][col], r, err_msg=f"column {col} not bit-exact"
        )
    return eng, out, ref


def test_micro_model_bitexact_and_tower():
    m = make_microbenchmark_model(6)
    b = make_random_batch(m, 40, seed=1)
    eng, out, ref = assert_pooled_bitexact(m, b)
    # identity tower: concat itself must be bit-exact
    np.testing.assert_array_equal(out["concat"], ref["concat"])


def test_mini_model_e_all_column_types():
    m = make_mini_e()
    b = make_random_batch(m, 70, seed=2)
    eng, out, ref = assert_pooled_bitexact(m, b)
    np.testing.assert_allclose(
        out["output"], ref["output"], rtol=1e-4, atol=1e-5
    )


def test_weighted_lookup_bitexact_all_combiners():
    tables = {"t": TableSpec("t", 50, 8)}
    rng = np.random.default_rng(0)
    batch = {
        "x": [list(rng.integers(0, 50, size=int(n)))
              for n in rng.integers(1, 9, 64)]
    }
    batch["w"] = [list(rng.random(len(r)).astype(np.float32))
                  for r in batch["x"]]
    for comb in Combiner:
        cols = [
            FeatureColumn(
                "c", FeatureSource("x", FeatureKind.INT_LIST),
                (NumToId(50),), LookupSpec("t", comb, weight_field="w"),
            )
        ]
        m = ModelSpec(
            "w", dict(tables), cols,
            TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
        )
        assert_pooled_bitexact(m, batch)


def test_dlrm_dot_tower():
    m = make_criteo_dlrm(embedding_dim=8, bottom_mlp=(16, 8),
                         top_mlp=(32, 1), vocabs=(100,) * 5)
    b = make_random_batch(m, 32, seed=3)
    eng, out, ref = assert_pooled_bitexact(m, b)
    np.testing.assert_allclose(
        out["output"], ref["output"], rtol=1e-4, atol=1e-5
    )


def test_batch_bucketing_bounds_compiles():
    m = make_microbenchmark_model(3)
    eng = Engine(m, CFG)
    # batches 10, 20, 30 all land in the 32-bucket: ONE compile
    for bs in (10, 20, 30):
        eng.predict(make_random_batch(m, bs, seed=bs))
    assert eng.stats["compiles"] == 1
    # 33 -> 64-bucket: second compile
    eng.predict(make_random_batch(m, 33, seed=0))
    assert eng.stats["compiles"] == 2
    # results at a non-bucket batch size still match oracle
    b = make_random_batch(m, 17, seed=9)
    out = eng.predict(b, return_concat=True)
    ref = OracleModel(m).forward(b)
    assert out["concat"].shape[0] == 17
    np.testing.assert_array_equal(out["concat"], ref["concat"])


def test_rowlen_bucketing():
    tables = {"t": TableSpec("t", 50, 4)}
    cols = [
        FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                      (NumToId(50),), LookupSpec("t", Combiner.SUM))
    ]
    m = ModelSpec("rl", tables, cols,
                  TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    eng = Engine(m, CFG)
    # rowlen 3 -> bucket 4; rowlen 7 -> bucket 8 (new compile)
    eng.predict({"x": [[1, 2, 3], [4]]})
    assert eng.stats["compiles"] == 1
    eng.predict({"x": [[1, 2, 3], [4, 5]]})
    assert eng.stats["compiles"] == 1  # still bucket 4
    eng.predict({"x": [list(range(7))]})
    assert eng.stats["compiles"] == 2
    # overflow beyond the ladder raises by default
    with pytest.raises(ValueError):
        eng.predict({"x": [list(range(200))]})


def test_empty_and_single_rows():
    tables = {"t": TableSpec("t", 10, 4)}
    cols = [
        FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                      (NumToId(10),), LookupSpec("t", Combiner.MEAN))
    ]
    m = ModelSpec("e", tables, cols,
                  TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    b = {"x": [[], [5], [], [1, 1, 1]]}
    eng, out, ref = assert_pooled_bitexact(m, b)
    np.testing.assert_array_equal(out["pooled"]["c"][0], np.zeros(4))
    np.testing.assert_array_equal(out["pooled"]["c"][2], np.zeros(4))


def test_pass_report_present():
    m = make_microbenchmark_model(4)
    eng = Engine(m, CFG)
    names = [s["pass"] for s in eng.pass_report.stages]
    assert names == [
        "prune_useless", "simplify_pre_lookup", "canonicalize_lookup",
        "dedup_subcolumns",
    ]


def test_engine_warmup_precompiles_buckets():
    from recom_tpu.models.synthetic import make_dlrm_model

    m = make_dlrm_model(4, 1, 1, 1, 0, 2, [4], [8, 1], name="warm")
    # device_hash=False: the empty-array warmup can only know the
    # host-hash signature (string WIDTH buckets are data-dependent —
    # see the representative-batches test below for the default config)
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(16, 32),
                                 rowlen_buckets=(16,), device_hash=False))
    n = eng.warmup()
    assert n == 2
    b = make_random_batch(m, 16, seed=0)
    before = eng.stats["compiles"]
    eng.predict(b)
    # single rowlen bucket + batch 16 were both warmed: no new compile
    assert eng.stats["compiles"] == before


def test_engine_warmup_with_batches_covers_device_hash_signatures():
    """Under the default (device_hash) config the serving signature
    carries data-dependent string width buckets: warmup(batches=...) with
    representative traffic must cover them so live requests compile
    nothing new."""
    from recom_tpu.models.synthetic import make_dlrm_model

    m = make_dlrm_model(4, 1, 1, 1, 0, 2, [4], [8, 1], name="warm2")
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(16, 32),
                                 rowlen_buckets=(16,)))
    warm = [make_random_batch(m, 16, seed=100)]
    eng.warmup(batches=warm)
    b = make_random_batch(m, 16, seed=0)   # same width distribution
    before = eng.stats["compiles"]
    eng.predict(b)
    assert eng.stats["compiles"] == before


def test_pointwise_suffix_after_bucketize_runs_on_device():
    """[Bucketize, filter/select/mod/hash] chains compile to a device-side
    LUT (no host path) and stay bit-exact vs the oracle."""
    import numpy as np

    from recom_tpu.ir.spec import (
        Bucketize,
        Combiner,
        FeatureColumn,
        FeatureKind,
        FeatureSource,
        FilterRange,
        HashBucket,
        LookupSpec,
        Mod,
        ModelSpec,
        SelectRange,
        TableSpec,
        TowerSpec,
    )
    from recom_tpu.ir.intervals import IntervalSet
    from recom_tpu.oracle import OracleModel

    bz = Bucketize(list(range(0, 100, 10)))  # ids in [0, 10]
    cols = [
        FeatureColumn("plain", FeatureSource("x0", FeatureKind.DENSE_FLOAT),
                      (bz,), LookupSpec("t", Combiner.MEAN)),
        FeatureColumn("filt", FeatureSource("x1", FeatureKind.DENSE_FLOAT),
                      (bz, FilterRange(IntervalSet.closed(2, 7))),
                      LookupSpec("t", Combiner.MEAN)),
        FeatureColumn("sel", FeatureSource("x2", FeatureKind.DENSE_FLOAT),
                      (bz, SelectRange(IntervalSet.closed(0, 4), 9)),
                      LookupSpec("t", Combiner.SUM)),
        FeatureColumn("mod", FeatureSource("x3", FeatureKind.DENSE_FLOAT),
                      (bz, Mod(7)), LookupSpec("t", Combiner.MEAN)),
        FeatureColumn("hash", FeatureSource("x4", FeatureKind.DENSE_FLOAT),
                      (bz, HashBucket(11)), LookupSpec("t", Combiner.SUM)),
    ]
    m = ModelSpec(
        "lutdev", {"t": TableSpec("t", 16, 4)}, cols,
        TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(),
                  final_activation=None),
    )
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32,)))
    for g in eng.compiled.groups:
        assert g.n_bucketize == len(g.members), "expected all-device group"
        assert g.lut_matrix is not None

    rng = np.random.default_rng(0)
    batch = {f"x{i}": rng.uniform(-20, 120, 32) for i in range(5)}
    out = eng.predict(batch, return_pooled=True)
    ref = OracleModel(m).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


def test_criteo_tsv_reader_end_to_end(tmp_path):
    import numpy as np

    from recom_tpu.models.criteo import make_criteo_dlrm, read_criteo_tsv

    rng = np.random.default_rng(0)
    lines = []
    for _ in range(70):
        label = str(rng.integers(0, 2))
        dense = [
            str(rng.integers(0, 100)) if rng.random() > 0.2 else ""
            for _ in range(13)
        ]
        cats = [
            format(int(rng.integers(0, 2**32)), "x")
            if rng.random() > 0.2 else ""
            for _ in range(26)
        ]
        lines.append("\t".join([label] + dense + cats))
    p = tmp_path / "criteo.tsv"
    p.write_text("\n".join(lines) + "\n")

    m = make_criteo_dlrm(embedding_dim=8, bottom_mlp=(16, 8),
                         top_mlp=(32, 1), vocabs=(100,) * 26)
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32, 64)))
    ref_o = OracleModel(m)
    total = 0
    for batch, labels in read_criteo_tsv(str(p), 32):
        out = eng.predict(batch, return_pooled=True)
        ref = ref_o.forward(batch)
        for c, r in ref["pooled"].items():
            np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
        total += len(labels)
    assert total == 70


def test_truncate_overflow_rows_and_batch():
    """allow_truncate_overflow=True must TRUNCATE (documented behavior)
    on both overflow axes instead of crashing: ragged rows longer than the
    last rowlen bucket keep their first L entries; batches beyond the last
    batch bucket serve the first Bp examples."""
    tables = {"t": TableSpec("t", 50, 4)}
    cols = [
        FeatureColumn("c", FeatureSource("x", FeatureKind.INT_LIST),
                      (NumToId(50),), LookupSpec("t", Combiner.SUM))
    ]
    m = ModelSpec("trunc", tables, cols,
                  TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    cfg = EngineConfig(use_pallas=False, batch_buckets=(4,),
                       rowlen_buckets=(4,), allow_truncate_overflow=True)
    eng = Engine(m, cfg)

    # row overflow: 6 entries -> first 4 kept (oracle on the truncated rows)
    b = {"x": [[1, 2, 3, 4, 5, 6], [7]]}
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward({"x": [[1, 2, 3, 4], [7]]})
    np.testing.assert_array_equal(out["pooled"]["c"], ref["pooled"]["c"])

    # batch overflow: 6 rows -> first 4 served
    b2 = {"x": [[i] for i in range(6)]}
    out2 = eng.predict(b2, return_pooled=True)
    assert out2["output"].shape[0] == 4
    ref2 = OracleModel(m).forward({"x": [[i] for i in range(4)]})
    np.testing.assert_array_equal(out2["pooled"]["c"], ref2["pooled"]["c"])


def test_benchmark_warmup_zero_and_numeric_table_names():
    m = make_microbenchmark_model(3)
    eng = Engine(m, CFG)
    b = make_random_batch(m, 16, seed=1)
    stats = eng.benchmark(b, iters=2, warmup=0)   # must not NameError
    assert stats["latency_ms"] > 0

    # checkpoint round-trip with ALL-NUMERIC table names (orbax digit-key
    # normalization must not turn the tables dict into a list)
    tables = {"0": TableSpec("0", 10, 4), "7": TableSpec("7", 12, 4)}
    cols = [
        FeatureColumn("a", FeatureSource("x", FeatureKind.INT_LIST),
                      (NumToId(10),), LookupSpec("0", Combiner.SUM)),
        FeatureColumn("b", FeatureSource("y", FeatureKind.INT_LIST),
                      (NumToId(12),), LookupSpec("7", Combiner.MEAN)),
    ]
    mn = ModelSpec("numtab", tables, cols,
                   TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    from recom_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    eng_n = Engine(mn, CFG)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        save_checkpoint(td, eng_n)
        m2, params2 = load_checkpoint(td)
        assert isinstance(params2["tables"], dict)
        assert set(params2["tables"]) == {"0", "7"}
        eng2 = Engine(m2, CFG, params=params2)
        bb = {"x": [[1], [2]], "y": [[3], [4]]}
        np.testing.assert_array_equal(
            eng_n.predict(bb)["output"], eng2.predict(bb)["output"]
        )


def test_width_k_dense_passthrough():
    """numeric_column(shape=(k,)) analogue: a width-3 dense source feeds
    3 consecutive tower-input slots; oracle/engine/serde/random-batch all
    agree, and width > 1 is rejected on non-dense columns."""
    from recom_tpu.ir import serde
    from recom_tpu.ir.spec import HashBucket
    from recom_tpu.models import make_random_batch as mrb

    tables = {"t": TableSpec("t", 16, 4)}
    model = ModelSpec("widek", tables, [
        FeatureColumn("v", FeatureSource("v", FeatureKind.DENSE_FLOAT,
                                         width=3)),
        FeatureColumn("s", FeatureSource("s", FeatureKind.DENSE_FLOAT)),
        FeatureColumn("h", FeatureSource("h", FeatureKind.STRING),
                      (HashBucket(16),), LookupSpec("t", Combiner.MEAN)),
    ], TowerSpec(arch="mlp", top_mlp=(8, 1)))
    assert model.dense_width == 4
    assert model.output_dim == 4 + 4

    m2 = serde.model_from_dict(serde.model_to_dict(model))
    assert m2.dense_columns[0].source.width == 3

    batch = mrb(model, 8, seed=3)
    assert batch["v"].shape == (8, 3)
    eng = Engine(model, CFG)
    out = eng.predict(batch, return_concat=True)
    ref = OracleModel(model).forward(batch)
    np.testing.assert_array_equal(np.asarray(out["concat"]), ref["concat"])

    with pytest.raises(ValueError, match="width"):
        ModelSpec("bad", tables, [
            FeatureColumn("h", FeatureSource("h", FeatureKind.STRING,
                                             width=2),
                          (HashBucket(16),), LookupSpec("t", Combiner.MEAN)),
        ], TowerSpec(arch="mlp", top_mlp=(1,)))


def test_softmax_on_bucketize_column_bitexact():
    """Regression (round-3 review finding 1): Combiner.SOFTMAX on a
    DENSE_FLOAT Bucketize column must take the host chain — the device-
    bucketize path has no weights plane for the host softmax to write,
    which broke bit-exactness and crashed bz-only groups."""
    from recom_tpu.ir.spec import Bucketize, HashBucket

    tables = {"t": TableSpec("t", 12, 4), "u": TableSpec("u", 16, 4)}
    for cols in (
        [FeatureColumn("b", FeatureSource("f", FeatureKind.DENSE_FLOAT),
                       (Bucketize([0.0, 1.5, 3.0]),),
                       LookupSpec("t", Combiner.SOFTMAX))],
        [FeatureColumn("b", FeatureSource("f", FeatureKind.DENSE_FLOAT),
                       (Bucketize([0.0, 1.5, 3.0]),),
                       LookupSpec("t", Combiner.SOFTMAX)),
         FeatureColumn("h", FeatureSource("h", FeatureKind.STRING),
                       (HashBucket(16),), LookupSpec("u", Combiner.MEAN))],
    ):
        m = ModelSpec("sbz", dict(tables), list(cols),
                      TowerSpec(arch="mlp", top_mlp=(),
                                final_activation=None))
        assert_pooled_bitexact(m, make_random_batch(m, 16, seed=2))

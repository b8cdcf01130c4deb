"""Serving clamp contract + review-fix regressions.

canonicalize_lookup's warn path admits chains whose id range can exceed
the table; serving semantics are: ids >= vocab clamp to the MEMBER's last
row (never a sibling's rows in the stacked table), ids < 0 are missing.
The wire (narrow-dtype) and structured encodings must agree bit-for-bit.
"""

import numpy as np
import pytest

from recom_tpu import Engine, EngineConfig
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
from recom_tpu.oracle import OracleModel
from recom_tpu.utils.params import init_model_params


def _tower():
    return TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(4, 1),
                     final_activation=None)


def test_overrange_hash_clamps_to_member_not_sibling():
    """HashBucket(1000) over a vocab-100 table (admitted with a warning):
    ids >= 100 must clamp to row 99 of THAT member — identically on the
    wire (int8) and structured paths.  Before the fix the wire path
    wrapped 735 -> int8 -33 (missing) while ids like 627 wrapped to +115
    (a sibling's row)."""
    tables = {"a": TableSpec("a", 100, 4), "b": TableSpec("b", 100, 4)}
    cols = [
        FeatureColumn("a", FeatureSource("a", FeatureKind.DENSE_INT),
                      (HashBucket(1000),), LookupSpec("a", Combiner.MEAN)),
        FeatureColumn("b", FeatureSource("b", FeatureKind.DENSE_INT),
                      (HashBucket(50),), LookupSpec("b", Combiner.MEAN)),
    ]
    model = ModelSpec("clamp", tables, cols, _tower())
    params = init_model_params(model)
    batch = {"a": np.arange(64, dtype=np.int64) * 7 + 1,
             "b": np.arange(64, dtype=np.int64)}

    wire = Engine(model, EngineConfig(interpret=True, batch_buckets=(64,)),
                  params=params).predict(batch, return_pooled=True)
    structured = Engine(
        model, EngineConfig(interpret=True, wire_pack=False,
                            batch_buckets=(64,)),
        params=params,
    ).predict(batch, return_pooled=True)
    for k in wire["pooled"]:
        np.testing.assert_array_equal(
            wire["pooled"][k], structured["pooled"][k], err_msg=k
        )

    # semantic check vs a clamped oracle model: HashBucket(1000) ids
    # clamped into [0, 99] == hash then NumToId-style cap
    from recom_tpu.oracle.reference import SparseFeature, apply_transform
    from recom_tpu.oracle.reference import pool_lookup, materialize_source

    sp = materialize_source(cols[0], batch, None)
    sp = apply_transform(HashBucket(1000), sp)
    sp.values = np.minimum(np.asarray(sp.values, np.int64), 99)
    want = pool_lookup(sp, params["tables"]["a"], Combiner.MEAN)
    np.testing.assert_array_equal(wire["pooled"]["a"], want)


def test_weighted_bucketize_column_matches_oracle():
    """A weighted bucketize column (forced-ragged) must run on BOTH
    encodings and match the oracle; before the fix the wire path silently
    dropped the weights and the structured path failed to trace."""
    tables = {"t": TableSpec("t", 11, 4)}
    cols = [
        FeatureColumn(
            "wb", FeatureSource("wb", FeatureKind.DENSE_FLOAT),
            (Bucketize(list(range(0, 50, 5))),),
            LookupSpec("t", Combiner.MEAN, weight_field="w"),
        ),
    ]
    model = ModelSpec("wbz", tables, cols, _tower())
    params = init_model_params(model)
    rng = np.random.default_rng(3)
    batch = {"wb": rng.uniform(-5, 55, 32).astype(np.float32),
             "w": rng.uniform(0.2, 2.0, 32).astype(np.float32)}
    ref = OracleModel(model, params=params).forward(batch)
    for wire_pack in (True, False):
        out = Engine(
            model,
            EngineConfig(interpret=True, wire_pack=wire_pack,
                         batch_buckets=(32,)),
            params=params,
        ).predict(batch, return_pooled=True)
        np.testing.assert_array_equal(
            out["pooled"]["wb"], ref["pooled"]["wb"],
            err_msg=f"wire_pack={wire_pack}",
        )


def test_multibyte_delimiter_matches_oracle():
    """Multi-character delimiters must take the generic split path (the
    native fast splitter scans a single byte); before the fix '||' split
    on '|' and hashed the empty pieces."""
    tables = {"t": TableSpec("t", 300, 4)}
    cols = [
        FeatureColumn(
            "tags", FeatureSource("tags", FeatureKind.STRING_LIST,
                                  delimiter="||"),
            (HashBucket(300),), LookupSpec("t", Combiner.SUM),
        ),
    ]
    model = ModelSpec("md", tables, cols, _tower())
    params = init_model_params(model)
    batch = {"tags": np.asarray(
        ["a||b||c", "xyz", "", "q||r", "lone||", "||lead"], dtype="S"
    )}
    ref = OracleModel(model, params=params).forward(batch)
    for wire_pack in (True, False):
        out = Engine(
            model,
            EngineConfig(interpret=True, wire_pack=wire_pack,
                         batch_buckets=(8,)),
            params=params,
        ).predict(batch, return_pooled=True)
        np.testing.assert_array_equal(
            out["pooled"]["tags"], ref["pooled"]["tags"],
            err_msg=f"wire_pack={wire_pack}",
        )


def test_overrange_bucketize_lut_clamps():
    """A bucketize chain with more boundaries than table rows clamps on
    device (via the compiled LUT) to the member's last row."""
    tables = {"t": TableSpec("t", 5, 4), "u": TableSpec("u", 5, 4)}
    cols = [
        FeatureColumn("bz", FeatureSource("bz", FeatureKind.DENSE_FLOAT),
                      (Bucketize([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),),
                      LookupSpec("t", Combiner.MEAN)),
        FeatureColumn("u", FeatureSource("u", FeatureKind.DENSE_INT),
                      (NumToId(5, default_id=0),),
                      LookupSpec("u", Combiner.MEAN)),
    ]
    model = ModelSpec("bzc", tables, cols, _tower())
    params = init_model_params(model)
    batch = {"bz": np.asarray([-1.0, 0.5, 3.5, 9.9], np.float32),
             "u": np.asarray([0, 1, 2, 3], np.int64)}
    # expected: ids [0, 1, 4(clamped from 4), 4(clamped from 7)]
    want_rows = params["tables"]["t"][[0, 1, 4, 4]]
    for wire_pack in (True, False):
        out = Engine(
            model,
            EngineConfig(interpret=True, wire_pack=wire_pack,
                         batch_buckets=(4,)),
            params=params,
        ).predict(batch, return_pooled=True)
        np.testing.assert_array_equal(
            out["pooled"]["bz"], want_rows.astype(np.float32),
            err_msg=f"wire_pack={wire_pack}",
        )


def test_bucketize_flag2_inf_nan_edges():
    """The branchless (flag-2) bucketize must match float64 searchsorted
    on +inf / -inf / NaN / exact-boundary inputs (review regression: +inf
    used to return k+1 and read lut[k+1] out of bounds)."""
    from recom_tpu.native import ops as native_ops
    from recom_tpu.native.build import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    bounds64 = np.arange(1.0, 9.0)                  # uniform -> flag 2
    b32 = native_ops.ceil32(bounds64)
    kmax = 16
    bounds32 = np.full((1, kmax), np.inf, np.float32)
    bounds32[0, :8] = b32
    counts = np.asarray([8], np.int32)
    inv_ds = np.asarray([(8 - 1) / (b32[-1] - b32[0])], np.float32)
    x = np.asarray(
        [np.inf, -np.inf, np.nan, 0.5, 1.0, 8.0, 4.4, 7.999999],
        np.float32,
    )
    want = np.searchsorted(bounds64, x.astype(np.float64), side="right")
    for flag in (0, 1, 2):
        out = np.zeros((1, 8), np.int8)
        native_ops.bucketize_multi(
            [x], bounds32, counts, inv_ds,
            np.asarray([flag], np.uint8), None, None, out, 8,
        )
        np.testing.assert_array_equal(
            out[0].astype(np.int64), want, err_msg=f"flag={flag}"
        )


def test_device_bucketize_boundaries_match_oracle_f64():
    """ADVICE r02 regression: device bucketize boundaries must be ceil32
    (exact f64 upper_bound), not a round-to-nearest f32 cast.  Boundary
    0.7 rounds DOWN in f32; an input equal to the rounded value must
    bucket as the oracle's f64 comparison says (bucket 0), on BOTH the
    host wire path (host_bucketize=True, default) and the device path
    (host_bucketize=False), keeping the two encodings bit-identical."""
    bounds = [0.7, 1.3, 2.2, 3.1]       # all round down in f32
    tables = {"t": TableSpec("t", len(bounds) + 1, 4, init_seed=3)}
    cols = [
        FeatureColumn(
            "x", FeatureSource("x", FeatureKind.DENSE_FLOAT),
            (Bucketize(bounds),), LookupSpec("t", Combiner.MEAN),
        )
    ]
    model = ModelSpec("bz32", tables, cols, _tower())
    params = init_model_params(model)
    # inputs sitting exactly ON the f32 roundings of each boundary plus
    # surrounding probes
    probes = np.asarray(bounds, np.float32)
    x = np.concatenate([
        probes,
        np.nextafter(probes, np.float32(-np.inf)),
        np.nextafter(probes, np.float32(np.inf)),
        np.asarray([0.0, 5.0], np.float32),
    ]).astype(np.float32)
    batch = {"x": x}
    oracle = OracleModel(model, params=params)
    want = oracle.pooled_outputs(batch)["x"]
    for cfg in (
        EngineConfig(interpret=True),                        # wire + host bz
        EngineConfig(interpret=True, host_bucketize=False),  # device bz
        EngineConfig(interpret=True, host_bucketize=False, wire_pack=False),
    ):
        eng = Engine(model, cfg, params=params)
        got = eng.predict(batch, return_pooled=True)["pooled"]["x"]
        np.testing.assert_array_equal(got, want)

"""Randomized model fuzz: arbitrary column/transform/combiner compositions
must stay bit-exact between the Engine and the NumPy oracle.

The reference has no tests at all (SURVEY.md §4); this is the adversarial
sweep its graceful-degradation design never had.  Every seed builds a
random ModelSpec (mixed sources, transform chains, combiners, weighted
lookups, shared tables) and a random batch, then checks every pooled
column bitwise.
"""

import numpy as np
import pytest

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
    Mod,
    ModelSpec,
    NumToId,
    SelectRange,
    TableSpec,
    TowerSpec,
)
from recom_tpu.oracle import OracleModel


def random_model(rng: np.random.Generator, n_cols: int):
    tables = {}
    cols = []
    for i in range(n_cols):
        dim = int(rng.choice([4, 8]))
        kind = rng.choice(
            ["bucketize", "bucketize_suffix", "int_hash", "str_hash",
             "int_list", "weighted", "vocab", "weighted_str",
             "delim_split"]
        )
        # span several vocab-pad regimes (the 128-pad / tile-divisibility
        # bugs only appear past 512: e.g. 2209 -> pad 2304, not % 512)
        vocab = int(rng.choice([rng.integers(8, 200), rng.integers(500, 3000)]))
        tname = f"t{i}"
        tables[tname] = TableSpec(tname, vocab, dim, init_seed=i)
        comb = Combiner(list(Combiner)[int(rng.integers(0, len(Combiner)))])
        if kind == "bucketize":
            # f32-dedup: Bucketize rounds boundaries to f32 (TF stores
            # them as proto floats) and requires them strictly increasing
            bounds = sorted(set(
                np.float32(b) for b in
                rng.uniform(-50, 50, int(rng.integers(1, vocab)))
            ))
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.DENSE_FLOAT),
                (Bucketize(list(bounds)),), LookupSpec(tname, comb),
            )
        elif kind == "bucketize_suffix":
            k = int(rng.integers(1, min(vocab - 1, 20)))
            bounds = sorted(set(np.float32(b) for b in rng.uniform(-50, 50, k)))
            suffix = []
            if rng.random() < 0.5:
                lo = int(rng.integers(0, k))
                suffix.append(
                    FilterRange(
                        IntervalSet.closed(lo, int(rng.integers(lo, k + 1)))
                    )
                )
            if rng.random() < 0.5:
                lo = int(rng.integers(0, k))
                suffix.append(
                    SelectRange(
                        IntervalSet.closed(lo, int(rng.integers(lo, k + 1))),
                        int(rng.integers(0, vocab)),
                    )
                )
            if rng.random() < 0.5:
                suffix.append(Mod(int(rng.integers(1, vocab))))
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.DENSE_FLOAT),
                tuple([Bucketize(list(bounds))] + suffix),
                LookupSpec(tname, comb),
            )
        elif kind == "int_hash":
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.DENSE_INT),
                (HashBucket(vocab),), LookupSpec(tname, comb),
            )
        elif kind == "str_hash":
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.STRING),
                (HashBucket(vocab),), LookupSpec(tname, comb),
            )
        elif kind == "int_list":
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.INT_LIST),
                (NumToId(vocab),), LookupSpec(tname, comb),
            )
        elif kind == "weighted":  # weighted int list
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.INT_LIST),
                (NumToId(vocab),),
                LookupSpec(tname, comb, weight_field=f"w{i}"),
            )
        elif kind == "vocab":
            from recom_tpu.ir.spec import VocabLookup

            n_words = int(rng.integers(2, min(vocab, 12)))
            words = [f"w{j}" for j in range(n_words)]
            num_oov = int(rng.integers(0, vocab - n_words + 1))
            # vary the OOV default too: -1 (missing) or a real row
            default = (
                int(rng.integers(0, n_words))
                if num_oov == 0 and rng.random() < 0.5 else -1
            )
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.STRING),
                (VocabLookup(words, num_oov=num_oov, default=default),),
                LookupSpec(tname, comb),
            )
        elif kind == "weighted_str":  # weighted single-value string
            col = FeatureColumn(
                f"c{i}", FeatureSource(f"f{i}", FeatureKind.STRING),
                (HashBucket(vocab),),
                LookupSpec(tname, comb, weight_field=f"w{i}"),
            )
        else:  # delimited split (sometimes multi-byte delimiter)
            delim = ";" if rng.random() < 0.7 else "||"
            col = FeatureColumn(
                f"c{i}",
                FeatureSource(f"f{i}", FeatureKind.STRING_LIST,
                              delimiter=delim),
                (HashBucket(vocab),), LookupSpec(tname, comb),
            )
        # post-lookup per-column compute on a quarter of the columns
        if rng.random() < 0.25:
            from recom_tpu.ir.spec import PostPool

            post = []
            if rng.random() < 0.5:
                post.append(PostPool(
                    "affine",
                    scale=tuple(rng.uniform(0.5, 2.0, dim).astype(float)),
                    bias=(float(rng.uniform(-1, 1)),),
                ))
            if rng.random() < 0.3:
                post.append(PostPool("softmax"))
            if rng.random() < 0.3:
                # mul by an earlier same-dim embedding column's raw pooled
                cands = [
                    c.name for c in cols
                    if c.lookup is not None
                    and tables[c.lookup.table].dim == dim
                ]
                if cands:
                    post.append(PostPool(
                        "mul_column",
                        other=cands[int(rng.integers(len(cands)))],
                    ))
            if rng.random() < 0.3:
                # frozen per-column projection (the push-MatMul-under-
                # sparse rewrite in the pooled domain)
                k = int(rng.integers(1, dim + 1))
                post.append(PostPool(
                    "matmul",
                    weight=tuple(
                        tuple(rng.uniform(-1, 1, k).astype(float))
                        for _ in range(dim)
                    ),
                ))
            if rng.random() < 0.5:
                post.append(PostPool(
                    "reduce_sum" if rng.random() < 0.5 else "reduce_mean"
                ))
            if post:
                import dataclasses

                col = dataclasses.replace(col, post=tuple(post))
        cols.append(col)
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(8, 1),
                      final_activation="sigmoid")
    return ModelSpec("fuzz", tables, cols, tower)


def random_batch(rng: np.random.Generator, model: ModelSpec, batch: int):
    out = {}
    for col in model.columns:
        f = col.source.field
        if col.source.kind == FeatureKind.DENSE_FLOAT:
            out[f] = rng.uniform(-80, 80, batch)
        elif col.source.kind == FeatureKind.DENSE_INT:
            vals = rng.integers(-(10**9), 10**9, batch)
            vals[rng.random(batch) < 0.1] = -1   # TF ignore_value missing
            out[f] = vals
        elif col.source.kind == FeatureKind.STRING:
            if col.transforms and type(col.transforms[0]).__name__ == "VocabLookup":
                vl = col.transforms[0]
                pool = list(vl.vocab) + ["oovA", "oovB", "zzz"]
                out[f] = np.asarray(
                    [pool[int(rng.integers(0, len(pool)))]
                     for _ in range(batch)]
                )
            else:
                out[f] = np.asarray(
                    ["s%d" % v for v in rng.integers(0, 10**6, batch)]
                )
            if col.lookup.weight_field:
                out[col.lookup.weight_field] = rng.uniform(
                    0.1, 2.0, batch
                ).astype(np.float32)
        elif col.source.kind == FeatureKind.STRING_LIST:
            d = col.source.delimiter
            out[f] = np.asarray(
                [
                    d.join("t%d" % v
                           for v in rng.integers(0, 10**5,
                                                 int(rng.integers(0, 6))))
                    for _ in range(batch)
                ],
                dtype="S",
            )
        elif col.source.kind == FeatureKind.INT_LIST:
            vocab = model.tables[col.lookup.table].vocab_size
            rows = [
                list(rng.integers(0, vocab, int(rng.integers(0, 6))))
                for _ in range(batch)
            ]
            out[f] = rows
            if col.lookup.weight_field:
                out[col.lookup.weight_field] = [
                    list(rng.random(len(r)).astype(np.float32)) for r in rows
                ]
    return out


@pytest.mark.parametrize("seed", range(8))
def test_random_models_bitexact(seed):
    rng = np.random.default_rng(1000 + seed)
    model = random_model(rng, n_cols=int(rng.integers(3, 9)))
    batch = random_batch(rng, model, batch=int(rng.integers(5, 40)))
    eng = Engine(
        model,
        EngineConfig(
            use_pallas=bool(seed % 2), interpret=True, batch_buckets=(64,)
        ),
    )
    out = eng.predict(batch, return_pooled=True, return_concat=True)
    ref = OracleModel(model).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    if any(c.post for c in model.columns):
        # post-lookup reductions: association may differ from numpy
        np.testing.assert_allclose(
            out["concat"], ref["concat"], rtol=1e-6, atol=1e-6
        )
    else:
        np.testing.assert_array_equal(out["concat"], ref["concat"])

    # serde round-trip across EVERY fuzz composition: the JSON form must
    # rebuild a spec that hashes and serves identically (hand-picked
    # round-trip tests cannot cover random transform/post mixes)
    from recom_tpu.ir.serde import model_from_json, model_to_json

    m2 = model_from_json(model_to_json(model))
    assert m2.spec_hash() == model.spec_hash()
    out2 = Engine(
        m2,
        EngineConfig(
            use_pallas=bool(seed % 2), interpret=True, batch_buckets=(64,)
        ),
    ).predict(batch, return_pooled=True)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out2["pooled"][c], r, err_msg=c)

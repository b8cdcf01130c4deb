"""Synthetic model generators mirroring the reference's benchmarks.

* :func:`make_microbenchmark_model` — N numeric->bucketize->embedding(dim 8,
  mean) columns (reference examples/python/microbenchmark.py:52-66).
* :func:`make_model_e` / :func:`make_model_f` — the AE models: 880/1000
  bucketize + 50/90 int-hash + 50/100 str-hash + 15/7 sparse-str + 5/3
  large-sparse columns, 32 dense features, bottom [32], top MLPs
  (reference examples/python/dlrm.py:140-207).
* :func:`make_random_batch` — graph-driven random inputs analogous to the
  reference benchmark's ConstructGraphInputs (recom_examples.patch:3363-3450).
"""

from __future__ import annotations

import string
from typing import Dict, List, Optional

import numpy as np

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

_ALPHABET = np.array(list(string.ascii_letters + string.digits))


def make_microbenchmark_model(
    num_columns: int,
    table_rows: int = 100,
    dim: int = 8,
    random_boundary: bool = False,
    seed: int = 0,
) -> ModelSpec:
    """N x (numeric -> bucketize -> embedding[mean]) + identity top."""
    rng = np.random.Generator(np.random.PCG64(seed))
    tables = {}
    columns = []
    for i in range(num_columns):
        if random_boundary:
            step = int(rng.integers(5, 11))
            rows = table_rows + int(rng.integers(-50, 51))
        else:
            step, rows = 5, table_rows
        boundaries = list(range(0, rows * step, step))
        tname = f"emb_f{i}"
        tables[tname] = TableSpec(tname, len(boundaries) + 1, dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                name=f"f{i}",
                source=FeatureSource(f"f{i}", FeatureKind.DENSE_FLOAT),
                transforms=(Bucketize(boundaries),),
                lookup=LookupSpec(tname, Combiner.MEAN),
            )
        )
    # embedding-only "model": tower is a no-op identity over the concat
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(), final_activation=None)
    return ModelSpec(f"micro{num_columns}", tables, columns, tower)


def make_dlrm_model(
    bucketize_num: int,
    hash_int_num: int,
    hash_str_num: int,
    sparse_str_num: int,
    large_sparse_num: int,
    dense_num: int,
    bot_units,
    top_units,
    name: str,
    small_rows: int = 100,
    mid_rows: int = 10_000,
    large_rows: int = 1 << 23,
    dim: int = 8,
    large_dim: int = 32,
    seed: int = 0,
) -> ModelSpec:
    tables: Dict[str, TableSpec] = {}
    columns: List[FeatureColumn] = []

    boundaries = list(range(0, small_rows * 5, 5))
    for i in range(bucketize_num):
        t = f"emb_bucketize{i}"
        tables[t] = TableSpec(t, len(boundaries) + 1, dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"bucketize{i}",
                FeatureSource(f"bucketize{i}", FeatureKind.DENSE_FLOAT),
                (Bucketize(boundaries),),
                LookupSpec(t, Combiner.MEAN),
            )
        )
    for i in range(hash_int_num):
        t = f"emb_hash_int{i}"
        tables[t] = TableSpec(t, small_rows, dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"categ_hashbucket_int{i}",
                FeatureSource(f"categ_hashbucket_int{i}", FeatureKind.DENSE_INT),
                (HashBucket(small_rows),),
                LookupSpec(t, Combiner.MEAN),
            )
        )
    for i in range(hash_str_num):
        t = f"emb_hash_str{i}"
        tables[t] = TableSpec(t, mid_rows, dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"categ_hashbucket{i}",
                FeatureSource(f"categ_hashbucket{i}", FeatureKind.STRING),
                (HashBucket(mid_rows),),
                LookupSpec(t, Combiner.MEAN),
            )
        )
    for i in range(sparse_str_num):
        t = f"emb_sparse{i}"
        tables[t] = TableSpec(t, mid_rows, dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"categ_hashbucket_sparse{i}",
                FeatureSource(
                    f"categ_hashbucket_sparse{i}", FeatureKind.STRING_LIST,
                    delimiter=";",
                ),
                (HashBucket(mid_rows),),
                LookupSpec(t, Combiner.SUM),
            )
        )
    for i in range(large_sparse_num):
        t = f"emb_large_sparse{i}"
        tables[t] = TableSpec(t, large_rows, large_dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"categ_large_hashbucket_sparse{i}",
                FeatureSource(
                    f"categ_large_hashbucket_sparse{i}",
                    FeatureKind.STRING_LIST, delimiter=";",
                ),
                (HashBucket(large_rows),),
                LookupSpec(t, Combiner.SUM),
            )
        )
    for i in range(dense_num):
        columns.append(
            FeatureColumn(
                f"dense{i}", FeatureSource(f"dense{i}", FeatureKind.DENSE_FLOAT)
            )
        )
    tower = TowerSpec(
        arch="mlp",
        bottom_mlp=tuple(bot_units),
        top_mlp=tuple(top_units) + (1,),
        final_activation="sigmoid",
        init_seed=seed,
    )
    return ModelSpec(name, tables, columns, tower)


def make_model_e(seed: int = 0, scale: float = 1.0) -> ModelSpec:
    """Reference AE Model E (1000 embedding columns).  ``scale`` < 1 shrinks
    every column-type count proportionally for tests."""
    s = lambda n: max(1, int(round(n * scale)))
    return make_dlrm_model(
        s(880), s(50), s(50), s(15), s(5), 32, [32], [1024, 1024, 128],
        name="E" if scale == 1.0 else f"E@{scale}", seed=seed,
    )


def make_model_f(seed: int = 0, scale: float = 1.0) -> ModelSpec:
    s = lambda n: max(1, int(round(n * scale)))
    return make_dlrm_model(
        s(1000), s(90), s(100), s(7), s(3), 32, [32], [2048, 1024, 1024, 512],
        name="F" if scale == 1.0 else f"F@{scale}", seed=seed,
    )


# ---------------------------------------------------------------------------
# Random input generation (spec-driven, like the reference's graph-driven
# ConstructGraphInputs)
# ---------------------------------------------------------------------------


def _rand_strings(rng, n: int, length: int = 8) -> List[str]:
    idx = rng.integers(0, len(_ALPHABET), size=(n, length))
    return ["".join(_ALPHABET[row]) for row in idx]


def make_random_batch(
    model: ModelSpec,
    batch: int,
    seed: int = 0,
    max_list_len: int = 10,
    num_range: int = 10_000,
) -> Dict:
    """Random raw inputs for every feature field of ``model``.

    Numeric features draw from [-1, num_range) like the reference
    microbenchmark (microbenchmark.py:67); list features have 1..max_list_len
    items (dlrm.py:49-53)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out: Dict = {}
    for col in model.columns:
        field, kind = col.source.field, col.source.kind
        if field in out:
            continue
        if kind == FeatureKind.DENSE_FLOAT:
            if col.transforms:
                out[field] = rng.integers(-1, num_range, size=batch).astype(
                    np.float32
                )
            elif col.source.width > 1:
                out[field] = rng.integers(
                    0, 100, size=(batch, col.source.width)
                ).astype(np.float32)
            else:
                out[field] = rng.integers(0, 100, size=batch).astype(np.float32)
        elif kind == FeatureKind.DENSE_INT:
            out[field] = rng.integers(0, 100, size=batch).astype(np.int64)
        elif kind == FeatureKind.STRING:
            out[field] = np.asarray(_rand_strings(rng, batch), dtype="S")
        elif kind == FeatureKind.STRING_LIST:
            lens = rng.integers(1, max_list_len + 1, size=batch)
            if col.source.delimiter is not None:
                # delimited wire format (reference dlrm.py:49-53)
                out[field] = np.asarray(
                    [
                        col.source.delimiter.join(_rand_strings(rng, int(n)))
                        for n in lens
                    ],
                    dtype="S",
                )
            else:
                out[field] = [_rand_strings(rng, int(n)) for n in lens]
        elif kind == FeatureKind.INT_LIST:
            lens = rng.integers(1, max_list_len + 1, size=batch)
            out[field] = [
                list(rng.integers(0, num_range, size=int(n))) for n in lens
            ]
        elif kind == FeatureKind.FLOAT_LIST:
            continue  # generated alongside its id list below
        if col.lookup is not None and col.lookup.weight_field:
            wf = col.lookup.weight_field
            if wf not in out:
                if not col.source.is_ragged:
                    # weighted SINGLE-VALUE column: one scalar weight per
                    # example, flat [B] (the form oracle._scalar_weights
                    # accepts)
                    out[wf] = rng.random(batch).astype(np.float32)
                    continue

                def _n_items(row):
                    # delimiter-joined wire rows carry k items, not
                    # len(joined_bytes) characters
                    if isinstance(row, (bytes, np.bytes_)):
                        row = row.decode()
                    if isinstance(row, str):
                        d = col.source.delimiter
                        return row.count(d) + 1 if row else 0
                    return len(row)

                out[wf] = [
                    list(rng.random(_n_items(row)).astype(np.float32))
                    for row in out[field]
                ]
    return out

"""Criteo-style DLRM: 26 categorical + 13 dense, dot-interaction tower.

BASELINE.json config 2.  Categorical features are integer ids hashed into
per-feature vocab buckets (the standard Criteo preprocessing); dense features
feed a bottom MLP whose output joins the 26 embedding vectors in a pairwise
dot-product interaction, then a top MLP (DLRM, Naumov et al. 2019).
"""

from __future__ import annotations

from typing import Sequence

from recom_tpu.ir.spec import (
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

# Capped per-feature vocab sizes (Criteo Kaggle cardinalities, capped at 1M)
CRITEO_VOCABS = (
    1_000_000, 39_060, 17_295, 7_424, 20_265, 3, 7_122, 1_543, 63,
    1_000_000, 1_000_000, 1_000_000, 10, 2_209, 10_667, 155, 4,
    976, 14, 1_000_000, 1_000_000, 1_000_000, 290_792, 10_997, 91, 35,
)


def make_criteo_dlrm(
    embedding_dim: int = 64,
    bottom_mlp: Sequence[int] = (512, 256, 64),
    top_mlp: Sequence[int] = (512, 256, 1),
    vocabs: Sequence[int] = CRITEO_VOCABS,
    seed: int = 0,
) -> ModelSpec:
    assert bottom_mlp[-1] == embedding_dim, "DLRM: bottom MLP must end at dim"
    tables = {}
    columns = []
    for i, vocab in enumerate(vocabs):
        t = f"emb_c{i}"
        tables[t] = TableSpec(t, int(vocab), embedding_dim, init_seed=seed)
        columns.append(
            FeatureColumn(
                f"cat{i}",
                FeatureSource(f"cat{i}", FeatureKind.DENSE_INT),
                (HashBucket(int(vocab)),),
                LookupSpec(t, Combiner.SUM),
            )
        )
    for i in range(13):
        columns.append(
            FeatureColumn(
                f"int{i}", FeatureSource(f"int{i}", FeatureKind.DENSE_FLOAT)
            )
        )
    tower = TowerSpec(
        arch="dlrm_dot",
        bottom_mlp=tuple(bottom_mlp),
        top_mlp=tuple(top_mlp),
        final_activation="sigmoid",
        init_seed=seed,
    )
    return ModelSpec("criteo_dlrm", tables, columns, tower)

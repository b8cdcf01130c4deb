"""Real TF-CPU baseline for a ModelSpec — the system the reference
compares against (README.md:29-31 reports 6.61x over TF-CPU).

Builds the same model as a TensorFlow graph out of the standard ops the
reference's feature columns lower to (Bucketize, StringToHashBucketFast,
StringSplit, safe_embedding_lookup_sparse, ConcatV2, dense matmuls) and
wraps it in tf.function — i.e., the unoptimized thousands-of-small-ops
execution RECom was built to fix, as a genuine measurable baseline rather
than a NumPy stand-in.

Covered column shapes (everything in models E/F/micro/criteo):
  DENSE_FLOAT + [Bucketize]           -> Bucketize + embedding lookup
  DENSE_INT   + [HashBucket]          -> as_string + to_hash_bucket_fast
  STRING      + [HashBucket]          -> to_hash_bucket_fast
  STRING_LIST (delimited) + [HashBucket] -> StringSplit + hash + sparse pool
  INT_LIST + [NumToId]                -> identity sparse ids + sparse pool
  dense passthrough columns           -> tower input
Weighted lookups (LookupSpec.weight_field) feed the aligned ragged score
list as sparse_weights; Combiner.SOFTMAX applies tf.sparse.softmax to the
scores first (the reference's SparseSoftmax + SequenceMask pattern,
post_lookup_optimizer.cc:311-478).
Unsupported transforms raise (the bench falls back to the oracle baseline).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from recom_tpu.ir.spec import (
    Bucketize,
    Combiner,
    FeatureKind,
    HashBucket,
    ModelSpec,
    NumToId,
)

_COMB = {Combiner.SUM: "sum", Combiner.MEAN: "mean", Combiner.SQRTN: "sqrtn"}


def build_tf_baseline(model: ModelSpec, np_params: Dict):
    """Returns (fn, make_feed): ``fn`` is a tf.function mapping a feed dict
    of tf tensors to the model output; ``make_feed`` converts a raw numpy
    batch into that feed."""
    import tensorflow as tf

    tables = {
        name: tf.constant(np.asarray(arr, np.float32))
        for name, arr in np_params["tables"].items()
    }
    tower_params = {
        key: [
            (tf.constant(l["w"]), tf.constant(l["b"])) for l in layers
        ]
        for key, layers in np_params["tower"].items()
    }

    dense_fields = [c.source.field for c in model.dense_columns]
    # hidden (in_concat=False) columns feed other columns' posts, not the
    # concat; the baseline models E/F/criteo carry no post chains
    emb_cols = [c for c in model.embedding_columns if c.in_concat]

    def column_embedding(col, feed):
        kind = col.source.kind
        t = tables[col.lookup.table]
        comb = _COMB.get(col.lookup.combiner)
        if kind == FeatureKind.DENSE_FLOAT:
            (bz,) = col.transforms
            assert isinstance(bz, Bucketize), "tf baseline: Bucketize only"
            ids = tf.raw_ops.Bucketize(
                input=feed[col.source.field],
                boundaries=[float(b) for b in bz.boundaries],
            )
            ids = tf.cast(ids, tf.int64)
            return tf.nn.embedding_lookup(t, ids)
        if kind in (FeatureKind.DENSE_INT, FeatureKind.STRING):
            (hb,) = col.transforms
            assert isinstance(hb, HashBucket)
            x = feed[col.source.field]
            if kind == FeatureKind.DENSE_INT:
                missing = tf.equal(x, -1)       # TF ignore_value semantics
                ids = tf.strings.to_hash_bucket_fast(
                    tf.strings.as_string(x), hb.num_buckets
                )
                emb = tf.nn.embedding_lookup(t, ids)
                return tf.where(missing[:, None], tf.zeros_like(emb), emb)
            ids = tf.strings.to_hash_bucket_fast(x, hb.num_buckets)
            return tf.nn.embedding_lookup(t, ids)
        if kind in (FeatureKind.STRING_LIST, FeatureKind.INT_LIST):
            if kind == FeatureKind.STRING_LIST:
                (hb,) = col.transforms
                assert isinstance(hb, HashBucket)
                x = feed[col.source.field]
                sp = (
                    x.to_sparse()   # pre-split ragged rows
                    if isinstance(x, tf.RaggedTensor)
                    else tf.strings.split(
                        x, sep=col.source.delimiter
                    ).to_sparse()
                )
                ids = tf.sparse.SparseTensor(
                    sp.indices,
                    tf.strings.to_hash_bucket_fast(sp.values, hb.num_buckets),
                    sp.dense_shape,
                )
            else:
                # identity ids (categorical_column_with_identity)
                (nti,) = col.transforms
                assert isinstance(nti, NumToId)
                ids = feed[col.source.field].to_sparse()
            return sparse_pool(col, ids, t, comb, feed)
        raise NotImplementedError(f"tf baseline: column kind {kind}")

    def sparse_pool(col, ids, t, comb, feed):
        """safe_embedding_lookup_sparse with the model's weighting scheme.
        The weight feed is the aligned ragged score list — both the split's
        sparse indices and the ragged flat values are row-major, so they
        line up position-for-position."""
        wf = col.lookup.weight_field
        weights = None
        if wf is not None:
            wr = feed[wf]
            weights = tf.sparse.SparseTensor(
                ids.indices,
                tf.cast(wr.flat_values, tf.float32),
                ids.dense_shape,
            )
        if col.lookup.combiner == Combiner.SOFTMAX:
            # the reference's SparseSoftmax + SequenceMask pattern: rowwise
            # softmax of the scores over the valid positions, then a
            # weighted sum.  No score feed -> uniform scores (softmax ->
            # 1/n), matching the engine's ones default.
            if weights is None:
                weights = tf.sparse.SparseTensor(
                    ids.indices,
                    tf.ones_like(tf.cast(ids.values, tf.float32)),
                    ids.dense_shape,
                )
            return tf.nn.safe_embedding_lookup_sparse(
                t, ids, sparse_weights=tf.sparse.softmax(weights),
                combiner="sum", default_id=None,
            )
        return tf.nn.safe_embedding_lookup_sparse(
            t, ids, sparse_weights=weights, combiner=comb, default_id=None
        )

    def mlp(layers, x, act, final_act):
        for i, (w, b) in enumerate(layers):
            x = tf.matmul(x, w) + b
            last = i == len(layers) - 1
            if not last and act == "relu":
                x = tf.nn.relu(x)
            elif last and final_act == "sigmoid":
                x = tf.sigmoid(x)
            elif last and final_act == "relu":
                x = tf.nn.relu(x)
        return x

    tower = model.tower

    def forward(feed):
        embs = [column_embedding(c, feed) for c in emb_cols]
        dense = (
            tf.concat(
                [
                    tf.reshape(feed[c.source.field],
                               [-1, c.source.width])
                    for c in model.dense_columns
                ],
                axis=1,
            )
            if dense_fields
            else tf.zeros([tf.shape(embs[0])[0], 0])
        )
        if tower.arch == "mlp":
            front = dense
            if tower.bottom_mlp and dense_fields:
                front = mlp(tower_params["bottom"], dense,
                            tower.activation, tower.activation)
            x = tf.concat([front] + embs, axis=1)
            return mlp(tower_params["top"], x, tower.activation,
                       tower.final_activation)
        if tower.arch == "dlrm_dot":
            bottom = mlp(tower_params["bottom"], dense,
                         tower.activation, tower.activation)
            vecs = tf.stack([bottom] + embs, axis=1)
            gram = tf.matmul(vecs, vecs, transpose_b=True)
            n = len(embs) + 1
            iu = np.triu_indices(n, k=1)
            flat = tf.reshape(gram, [-1, n * n])
            inter = tf.gather(flat, iu[0] * n + iu[1], axis=1)
            x = tf.concat([bottom, inter], axis=1)
            return mlp(tower_params["top"], x, tower.activation,
                       tower.final_activation)
        raise NotImplementedError(tower.arch)

    fn = tf.function(forward)

    def make_feed(batch: Dict):
        import tensorflow as tf

        def _item_counts(rows, delimiter):
            """Per-row item counts of an id feed, or None when they cannot
            be derived (whitespace-split wire strings)."""
            counts = []
            for r in rows:
                if isinstance(r, (bytes, np.bytes_)):
                    r = r.decode()
                if isinstance(r, str):
                    if delimiter is None:
                        return None
                    counts.append(r.count(delimiter) + 1 if r else 0)
                else:
                    counts.append(len(r))
            return counts

        feed = {}
        for col in model.columns:
            f = col.source.field
            wf = col.lookup.weight_field if col.lookup else None
            if wf is not None and wf not in feed and wf in batch:
                # aligned ragged score list (FLOAT_LIST weight plane).
                # Validate PER-ROW lengths against the id feed — sparse_pool
                # pairs ids.indices with the flattened scores, so equal
                # totals with mismatched rows would silently misassign
                # scores across rows (the oracle's materialize_source
                # raises on this; the ground-truth baseline must too).
                wl = [len(r) for r in batch[wf]]
                il = _item_counts(batch.get(f, []), col.source.delimiter)
                if il is not None and il != wl:
                    bad = next(
                        i for i, (a, b) in enumerate(zip(il, wl)) if a != b
                    )
                    raise ValueError(
                        f"weight field {wf!r} row {bad} has {wl[bad]} "
                        f"scores for {il[bad]} ids in {f!r}"
                    )
                feed[wf] = tf.ragged.constant(
                    [list(map(float, r)) for r in batch[wf]],
                    dtype=tf.float32, row_splits_dtype=tf.int64,
                )
            if f in feed or f not in batch:
                continue
            kind = col.source.kind
            if kind == FeatureKind.DENSE_FLOAT:
                feed[f] = tf.constant(
                    np.asarray(batch[f], np.float32)
                )
            elif kind == FeatureKind.DENSE_INT:
                feed[f] = tf.constant(np.asarray(batch[f], np.int64))
            elif kind == FeatureKind.INT_LIST:
                feed[f] = tf.ragged.constant(
                    [list(map(int, r)) for r in batch[f]],
                    dtype=tf.int64, row_splits_dtype=tf.int64,
                )
            elif kind in (FeatureKind.STRING, FeatureKind.STRING_LIST):
                rows = batch[f]
                if kind == FeatureKind.STRING_LIST and (
                    len(rows) and isinstance(rows[0], (list, np.ndarray))
                ):
                    # pre-split ragged rows (no delimiter wire format)
                    feed[f] = tf.ragged.constant(
                        [
                            [
                                s.decode() if isinstance(s, bytes) else str(s)
                                for s in r
                            ]
                            for r in rows
                        ],
                        dtype=tf.string, row_splits_dtype=tf.int64,
                    )
                    continue
                arr = np.asarray(rows)
                if arr.dtype.kind == "S":
                    arr = arr.astype("U")
                feed[f] = tf.constant(arr)
            else:
                raise NotImplementedError(f"tf baseline feed: {kind}")
        return feed

    return fn, make_feed

"""NumPy oracle: TF-exact execution of a ModelSpec.

The behavioral contract the whole framework is tested against: *optimized
output must equal unoptimized output on the same inputs* (SURVEY.md section 4
— the reference enforces this only implicitly via graceful degradation; we
make it an executable oracle).

Semantics reproduced from TF (what the reference's rewrites preserve):
  * StringToHashBucketFast  = Fingerprint64 % buckets   (hashing.py)
  * Bucketize               = upper_bound(boundaries, x)
  * safe_embedding_lookup_sparse: ids < 0 pruned, empty rows -> zeros
    (the SparseFillEmptyRows + Select idiom's observable behavior,
    reference lookup_optimizer.cc:108-134)
  * SparseSegmentSum/Mean pooling in index order, float32 accumulation

Pooling accumulates strictly left-to-right per row in float32 (any row
length), matching both TF's sequential CPU kernels and the engine's
lax.scan accumulation — this is what makes bit-exact comparison meaningful.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from recom_tpu.ir.spec import (
    Bucketize,
    Cast,
    Combiner,
    CrossHash,
    FeatureColumn,
    FeatureKind,
    FilterRange,
    FilterStrSentinel,
    HashBucket,
    HostEvalChain,
    IdentityTransform,
    Mod,
    ModelSpec,
    NumToId,
    SelectRange,
    Transform,
    VocabLookup,
)
from recom_tpu.oracle.hashing import cross_hash, farmhash64, hash_bucket_fast
from recom_tpu.utils.params import init_model_params


class SparseFeature:
    """Ragged column as (values, row_ids[, weights]); row_ids ascending."""

    __slots__ = ("values", "row_ids", "weights", "batch")

    def __init__(self, values, row_ids, weights, batch):
        self.values = values            # np int64/float64 array OR list[str]
        self.row_ids = np.asarray(row_ids, dtype=np.int64)
        self.weights = weights          # np.float32 array or None
        self.batch = batch


def _ragged_to_sparse(rows: Sequence, batch: int, is_string: bool) -> Tuple:
    values: List = []
    row_ids: List[int] = []
    for b, row in enumerate(rows):
        for v in row:
            values.append(v)
            row_ids.append(b)
    if is_string:
        return values, np.asarray(row_ids, dtype=np.int64)
    return (
        np.asarray(values, dtype=np.float64 if values and isinstance(values[0], float) else np.int64),
        np.asarray(row_ids, dtype=np.int64),
    )


def _field_rows(batch: Dict, field: str):
    """Per-example value lists for a raw field of any wire format."""
    data = batch[field]
    rows = []
    for v in data:
        if isinstance(v, (list, tuple, np.ndarray)) and not isinstance(
            v, (str, bytes, np.str_, np.bytes_)
        ):
            rows.append(list(v))
        else:
            rows.append([v])
    return rows


def _scalar_weights(
    batch: Dict, weight_field: Optional[str], col: FeatureColumn, b: int
) -> Optional[np.ndarray]:
    """Weights for single-value-per-example columns (TF's
    weighted_categorical_column over a dense/scalar feature): one float
    per example, accepted flat [B] or as [B] singleton lists."""
    if weight_field is None:
        return None
    wrows = batch[weight_field]
    if len(wrows) != b:
        raise ValueError(
            f"weight field {weight_field!r}: {len(wrows)} rows vs {b} "
            f"value rows in {col.source.field!r}"
        )
    flat = []
    for i, x in enumerate(wrows):
        if isinstance(x, (list, tuple, np.ndarray)):
            if len(x) != 1:
                raise ValueError(
                    f"weight field {weight_field!r} row {i} has {len(x)} "
                    f"weights for 1 value in {col.source.field!r}"
                )
            x = x[0]
        flat.append(float(x))
    return np.asarray(flat, dtype=np.float32)


def materialize_source(col: FeatureColumn, batch: Dict, weight_field: Optional[str]) -> SparseFeature:
    kind = col.source.kind
    if kind == FeatureKind.CROSS:
        # per-example cross product of the key fields' value tuples
        # (tf.feature_column.crossed_column; list keys cross combinatorially)
        import itertools

        per_field = [_field_rows(batch, f) for f in col.source.fields]
        b = len(per_field[0])
        values: List = []
        row_ids: List[int] = []
        for i in range(b):
            for tup in itertools.product(*(rows[i] for rows in per_field)):
                values.append(tup)
                row_ids.append(i)
        return SparseFeature(values, np.asarray(row_ids, np.int64), None, b)
    data = batch[col.source.field]
    if kind in (FeatureKind.DENSE_FLOAT, FeatureKind.DENSE_INT):
        arr = np.asarray(data)
        b = arr.shape[0]
        values = arr.astype(np.float64 if kind == FeatureKind.DENSE_FLOAT else np.int64)
        row_ids = np.arange(b, dtype=np.int64)
        weights = _scalar_weights(batch, weight_field, col, b)
        if kind == FeatureKind.DENSE_INT and not (
            col.transforms and isinstance(col.transforms[0], HostEvalChain)
        ):
            # TF feature_column ignore_value semantics: -1 in a dense int
            # categorical input means MISSING (the row becomes empty ->
            # pooled zeros), validated vs TF 2.21 input_layer.  NOT when a
            # HostEvalChain leads the chain: there the raw value is
            # pre-id arithmetic input (e.g. Placeholder -> Div -> lookup),
            # and missing/valid is decided by the chain's OUTPUT (the
            # imported FilterRange / the ids<0 prune), matching the TF
            # session that computed on the raw -1.
            keep = values != -1
            values, row_ids = values[keep], row_ids[keep]
            if weights is not None:
                weights = weights[keep]
        return SparseFeature(values, row_ids, weights, b)
    if kind == FeatureKind.STRING:
        b = len(data)
        vals = list(data)
        if vals and not isinstance(
            vals[0], (str, bytes, np.str_, np.bytes_)
        ):
            raise TypeError(
                f"field {col.source.field!r} is declared STRING (one value "
                f"per example) but got {type(vals[0]).__name__}; use "
                "STRING_LIST for ragged values"
            )
        weights = _scalar_weights(batch, weight_field, col, b)
        return SparseFeature(vals, np.arange(b, dtype=np.int64), weights, b)
    if kind in (FeatureKind.INT_LIST, FeatureKind.STRING_LIST):
        if col.source.delimiter is not None and len(data) and not isinstance(
            data[0], (list, tuple, np.ndarray)
        ):
            # delimited wire format: one joined string per example
            delim = col.source.delimiter
            rows = []
            for s in data:
                if isinstance(s, (bytes, np.bytes_)):
                    s = s.decode()
                rows.append(s.split(delim) if s else [])
            data = rows
        b = len(data)
        values, row_ids = _ragged_to_sparse(
            data, b, kind == FeatureKind.STRING_LIST
        )
        weights = None
        if weight_field is not None:
            wrows = batch[weight_field]
            if (
                col.source.delimiter is not None
                and len(wrows)
                and isinstance(
                    wrows[0], (str, bytes, np.str_, np.bytes_)
                )
            ):
                # delimited weight wire format: the weight feed rides the
                # SAME one-joined-string-per-example convention (and the
                # same delimiter) as the id feed — the importer's
                # split -> StringToNumber(float) weight-plane idiom
                delim = col.source.delimiter
                parsed: List = []
                for s in wrows:
                    if isinstance(s, (bytes, np.bytes_)):
                        s = s.decode()
                    parsed.append(
                        parse_f32_pieces(s.split(delim)) if s else []
                    )
                wrows = parsed
            # validate PER-ROW lengths, not just the flattened total —
            # [[a,b],[]] vs weights [[0.5],[0.7]] both flatten to length 2
            # but would silently misassign 0.7 across rows
            if len(wrows) != b:
                raise ValueError(
                    f"weight field {weight_field!r}: {len(wrows)} rows vs "
                    f"{b} value rows in {col.source.field!r}"
                )
            vrow_counts = np.bincount(row_ids, minlength=b)
            for i, row in enumerate(wrows):
                if len(row) != vrow_counts[i]:
                    raise ValueError(
                        f"weight field {weight_field!r} row {i} has "
                        f"{len(row)} weights for {int(vrow_counts[i])} "
                        f"values in {col.source.field!r}"
                    )
            w = [float(x) for row in wrows for x in row]
            weights = np.asarray(w, dtype=np.float32)
        return SparseFeature(values, row_ids, weights, b)
    raise ValueError(f"cannot materialize source kind {kind}")


@functools.lru_cache(maxsize=4096)
def _vocab_table(vocab: tuple) -> dict:
    """value -> index map, cached per vocab tuple (serving calls the same
    transform every batch; rebuilding a large vocab dict per request is
    pure overhead)."""
    return {k: i for i, k in enumerate(vocab)}


def apply_transform(t: Transform, sp: SparseFeature) -> SparseFeature:
    if isinstance(t, HashBucket):
        sp.values = hash_bucket_fast(sp.values, t.num_buckets)
        return sp
    if isinstance(t, Bucketize):
        x = np.asarray(sp.values, dtype=np.float64)
        sp.values = np.searchsorted(
            np.asarray(t.boundaries, dtype=np.float64), x, side="right"
        ).astype(np.int64)
        return sp
    if isinstance(t, NumToId):
        v = np.asarray(sp.values).astype(np.int64)
        if t.default_id is not None:
            v = np.where((v < 0) | (v >= t.num_ids), np.int64(t.default_id), v)
        sp.values = v
        return sp
    if isinstance(t, VocabLookup):
        table = _vocab_table(t.vocab)
        n = len(t.vocab)
        out = np.empty(len(sp.values), dtype=np.int64)
        for i, v in enumerate(sp.values):
            key = v if not isinstance(v, (bytes, np.bytes_)) else v.decode()
            if isinstance(key, (np.integer,)):
                key = int(key)
            idx = table.get(key)
            if idx is None:
                if t.num_oov > 0:
                    s = key if isinstance(key, str) else str(int(key))
                    idx = n + farmhash64(s) % t.num_oov
                else:
                    idx = t.default
            out[i] = idx
        sp.values = out
        return sp
    if isinstance(t, CrossHash):
        sp.values = np.asarray(
            [cross_hash(tup, t.num_buckets, t.hash_key) for tup in sp.values],
            dtype=np.int64,
        )
        return sp
    if isinstance(t, Mod):
        sp.values = np.asarray(sp.values, dtype=np.int64) % t.n
        return sp
    if isinstance(t, FilterRange):
        v = np.asarray(sp.values, dtype=np.int64)
        mask = t.keep.membership_mask(v)
        sp.values = v[mask]
        sp.row_ids = sp.row_ids[mask]
        if sp.weights is not None:
            sp.weights = sp.weights[mask]
        return sp
    if isinstance(t, SelectRange):
        v = np.asarray(sp.values, dtype=np.int64)
        mask = t.keep.membership_mask(v)
        sp.values = np.where(mask, v, np.int64(t.substitute))
        return sp
    if isinstance(t, FilterStrSentinel):
        # keep values != sentinel on the STRING plane (the reference's
        # Addons>GatherStrValueGenIndice, gather_str_value_gen_indice_
        # ops.cc:31-58); bytes and str entries compare by decoded text
        want = t.sentinel
        mask = np.asarray([
            (v.decode() if isinstance(v, (bytes, np.bytes_)) else str(v))
            != want
            for v in sp.values
        ], dtype=bool)
        sp.values = [v for v, m in zip(sp.values, mask) if m]
        sp.row_ids = sp.row_ids[mask]
        if sp.weights is not None:
            sp.weights = sp.weights[mask]
        return sp
    if isinstance(t, HostEvalChain):
        sp.values = _host_eval_steps(sp.values, t.steps)
        return sp
    if isinstance(t, (Cast, IdentityTransform)):
        return sp
    raise ValueError(f"unknown transform {t}")


_EVAL_DTYPES = {"f32": np.float32, "f64": np.float64,
                "i32": np.int32, "i64": np.int64}


def _trunc_div(a, b):
    """TF's integer Div truncates toward zero (C semantics; verified vs
    TF 2.21: Div(-7,2) = -3) — numpy's // floors.  Pure integer math so
    int64 beyond f64 precision stays exact."""
    q = np.floor_divide(a, b)
    r = a - q * b
    return q + ((r != 0) & ((a < 0) != (b < 0)))


def _host_eval_steps(values, steps):
    """Evaluate HostEvalChain steps; each step computes in ITS dtype (the
    TF op's T attr) so float rounding matches the TF session exactly."""
    x = np.asarray(values)
    for op, c, dt in steps:
        dtype = _EVAL_DTYPES[dt]
        x = x.astype(dtype)
        k = dtype(c) if c is not None else None
        if op == "add":
            x = x + k
        elif op == "sub":
            x = x - k
        elif op == "rsub":
            x = k - x
        elif op == "mul":
            x = x * k
        elif op == "div":
            x = x / k if x.dtype.kind == "f" else _trunc_div(x, k)
        elif op == "rdiv":
            x = k / x if x.dtype.kind == "f" else _trunc_div(k, x)
        elif op == "floordiv":
            x = np.floor_divide(x, k)
        elif op == "mod":                   # TF FloorMod = python %
            x = np.mod(x, k)
        elif op == "minimum":
            x = np.minimum(x, k)
        elif op == "maximum":
            x = np.maximum(x, k)
        elif op == "floor":
            x = np.floor(x)
        elif op == "ceil":
            x = np.ceil(x)
        elif op == "round":                 # TF Round = half-to-even
            x = np.round(x)
        elif op == "cast":
            pass                            # the astype above IS the cast
        else:
            raise ValueError(f"unknown host-eval op {op!r}")
    return x


_libc_strtof = None


def parse_f32_pieces(pieces) -> np.ndarray:
    """Parse decimal strings to float32 with TF StringToNumber semantics
    (single rounding, as by strtof).  numpy/python parse via float64 and
    re-round — wrong ONLY when the f64 value lands exactly on an f32
    midpoint (a crossing without a tie is impossible: the midpoint is
    f64-representable and would itself be the nearest f64).  So:
    vectorized f64 parse, then re-parse just the exact-tie stragglers
    with libc strtof."""
    d = np.asarray(pieces, dtype=np.float64)
    f = d.astype(np.float32)
    fd = f.astype(np.float64)
    inexact = d != fd
    if inexact.any():
        toward = np.where(
            d > fd,
            np.nextafter(f, np.float32(np.inf)),
            np.nextafter(f, np.float32(-np.inf)),
        ).astype(np.float64)
        tie = inexact & (np.abs(d - fd) == np.abs(toward - d))
        if tie.any():
            global _libc_strtof
            if _libc_strtof is None:
                import ctypes

                lib = ctypes.CDLL(None)
                lib.strtof.restype = ctypes.c_float
                lib.strtof.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
                _libc_strtof = lib.strtof
            idx = np.nonzero(tie)[0]
            for i in idx:
                s = pieces[i]
                if isinstance(s, (bytes, np.bytes_)):
                    b = bytes(s)
                else:
                    b = str(s).encode()
                f[i] = np.float32(_libc_strtof(b, None))
    return f


def softmax_scores(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Rowwise masked softmax over the last axis; valid = ids >= 0.

    THE one implementation shared by the oracle and the host-prep staging
    paths (Combiner.SOFTMAX transforms the staged weights on host; the
    device then pools with the plain SUM path).  The row-sum is an
    explicit left-to-right loop so the bucket-padded engine layout
    [Bp, L_rung] and the oracle's exact-length layout [B, L_max] agree
    BITWISE: trailing pad positions contribute exp=0.0, and x + 0.0f is
    exact, so extra padding never perturbs the sum.  Empty rows -> all
    zeros (the masked-softmax convention of the reference's SequenceMask
    pattern, post_lookup_optimizer.cc:311-478)."""
    valid = ids >= 0
    w = np.where(valid, np.asarray(w, np.float32), np.float32(-np.inf))
    m = np.max(w, axis=-1, keepdims=True)          # -inf on empty rows
    m = np.where(np.isfinite(m), m, np.float32(0.0)).astype(np.float32)
    e = np.where(
        valid, np.exp((w - m).astype(np.float32)), np.float32(0.0)
    ).astype(np.float32)
    s = np.zeros(e.shape[:-1], np.float32)
    for l in range(e.shape[-1]):
        s = s + e[..., l]
    s_safe = np.where(s > 0, s, np.float32(1.0))
    return np.where(
        valid & (s > 0)[..., None], e / s_safe[..., None], np.float32(0.0)
    ).astype(np.float32)


def pool_lookup(
    sp: SparseFeature, table: np.ndarray, combiner: Combiner
) -> np.ndarray:
    """safe_embedding_lookup_sparse: prune ids<0, pool per row in index
    order with float32 accumulation, empty rows -> zeros."""
    ids = np.asarray(sp.values, dtype=np.int64)
    row_ids = sp.row_ids
    weights = sp.weights
    valid = ids >= 0
    if not valid.all():
        ids = ids[valid]
        row_ids = row_ids[valid]
        if weights is not None:
            weights = weights[valid]
    if ids.size and (ids.max() >= table.shape[0]):
        raise IndexError(
            f"id {int(ids.max())} out of range for table with "
            f"{table.shape[0]} rows"
        )
    b, d = sp.batch, table.shape[1]
    out = np.zeros((b, d), dtype=np.float32)
    if ids.size == 0:
        return out
    emb = table[ids]  # [nnz, d] float32
    w = weights if weights is not None else np.ones(ids.shape[0], dtype=np.float32)

    counts = np.bincount(row_ids, minlength=b)
    nonempty = counts > 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(row_ids.shape[0]) - starts[row_ids]

    if combiner == Combiner.SOFTMAX:
        # softmax the scores per row over the valid positions (through
        # the SAME padded-layout function the engine's host prep uses),
        # then pool as a plain weighted SUM
        lmax = int(counts.max())
        ids_p = np.full((b, lmax), -1, dtype=np.int64)
        w_p = np.zeros((b, lmax), dtype=np.float32)
        ids_p[row_ids, pos] = ids
        w_p[row_ids, pos] = w
        w = softmax_scores(ids_p, w_p)[row_ids, pos]

    weighted = emb * w[:, None]

    # Strictly left-to-right per-row float32 accumulation (the order TF's CPU
    # SparseSegmentSum/embedding_lookup_sparse kernels use).  Vectorized by
    # accumulating over in-row position l: all rows' l-th entries at once.
    acc = np.zeros((b, d), dtype=np.float32)
    wsum = np.zeros(b, dtype=np.float32)
    w2sum = np.zeros(b, dtype=np.float32)
    for l in range(int(counts.max())):
        sel = pos == l
        rows = row_ids[sel]
        acc[rows] = acc[rows] + weighted[sel]
        wsum[rows] = wsum[rows] + w[sel]
        w2sum[rows] = w2sum[rows] + w[sel] * w[sel]
    out[nonempty] = acc[nonempty]

    # TF rounding convention (validated vs installed TF 2.21): the
    # UNWEIGHTED SparseSegmentMean/SqrtN kernels compute sum * (1/denom)
    # — reciprocal rounded to f32, then a correctly-rounded multiply —
    # while the weighted embedding_lookup_sparse path divides.
    if combiner == Combiner.MEAN:
        if weights is None:
            out[nonempty] = out[nonempty] * (
                np.float32(1.0) / wsum[nonempty, None]
            )
        else:
            out[nonempty] = out[nonempty] / wsum[nonempty, None]
    elif combiner == Combiner.SQRTN:
        if weights is None:
            out[nonempty] = out[nonempty] * (
                np.float32(1.0) / np.sqrt(w2sum[nonempty, None])
            )
        else:
            out[nonempty] = out[nonempty] / np.sqrt(w2sum[nonempty, None])
    return out


def _act(name: str, x: np.ndarray) -> np.ndarray:
    if name == "relu":
        return np.maximum(x, 0.0)
    if name == "sigmoid":
        # numerically stable split form (avoids exp overflow for large |x|)
        pos = x >= 0
        z = np.exp(np.where(pos, -x, x))
        return np.where(pos, 1.0 / (1.0 + z), z / (1.0 + z))
    if name is None or name == "none":
        return x
    raise ValueError(f"unknown activation {name}")


def run_mlp(layers, x: np.ndarray, activation: str, final_activation) -> np.ndarray:
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        last = i == len(layers) - 1
        x = _act(final_activation if last else activation, x) if (
            not last or final_activation
        ) else x
    return x.astype(np.float32)


class OracleModel:
    """Eager NumPy execution of a ModelSpec — slow but semantically exact."""

    def __init__(self, model: ModelSpec, params: Optional[Dict] = None):
        self.model = model
        self.params = params if params is not None else init_model_params(model)

    def column_ids(self, col: FeatureColumn, batch: Dict) -> SparseFeature:
        wf = col.lookup.weight_field if col.lookup else None
        sp = materialize_source(col, batch, wf)
        for t in col.transforms:
            sp = apply_transform(t, sp)
        return sp

    def pooled_outputs(self, batch: Dict) -> Dict[str, np.ndarray]:
        """RAW pooled lookups (pre-post) — the bit-exact contract surface."""
        out = {}
        for col in self.model.embedding_columns:
            sp = self.column_ids(col, batch)
            table = self.params["tables"][col.lookup.table]
            out[col.name] = pool_lookup(sp, table, col.lookup.combiner)
        return out

    @staticmethod
    def apply_post(pooled: np.ndarray, post, pooled_map=None) -> np.ndarray:
        """Post-lookup per-column chain on pooled [B, d] (PostPool).
        Reduction order may differ from XLA's by float association — the
        bit-exact contract covers the POOLED outputs; post outputs are
        compared to float tolerance.  ``pooled_map``: {column name: raw
        pooled [B, d]} for mul_column operands (operand = the other
        column's RAW pooled output, pre-post — no chain cycles)."""
        x = pooled
        for p in post:
            if p.op == "reduce_sum":
                x = x.sum(axis=1, keepdims=True)
            elif p.op == "reduce_mean":
                x = x.mean(axis=1, keepdims=True)
            elif p.op == "softmax":
                # stable softmax over the embedding dim (the reference's
                # SparseSoftmax pattern, post_lookup_optimizer.cc:311-478,
                # in the pooled domain)
                m = x.max(axis=1, keepdims=True)
                e = np.exp(x - m)
                x = e / e.sum(axis=1, keepdims=True)
            elif p.op == "mul_column":
                x = x * np.asarray(pooled_map[p.other], np.float32)
            elif p.op == "matmul":
                x = np.asarray(x, np.float32) @ np.asarray(
                    p.weight, np.float32
                )
            else:
                if p.scale is not None:
                    x = x * np.asarray(p.scale, np.float32)
                if p.bias is not None:
                    x = x + np.asarray(p.bias, np.float32)
        return np.asarray(x, np.float32)

    def dense_matrix(self, batch: Dict) -> np.ndarray:
        cols = self.model.dense_columns
        if not cols:
            some = next(iter(batch.values()))
            b = len(some)
            return np.zeros((b, 0), dtype=np.float32)
        blocks = []
        for c in cols:
            a = np.asarray(batch[c.source.field], dtype=np.float32)
            if a.ndim == 1:
                a = a[:, None]
            if a.shape[1] != c.source.width:
                raise ValueError(
                    f"dense column {c.name!r}: feed width {a.shape[1]} != "
                    f"declared width {c.source.width}"
                )
            blocks.append(a)
        return np.concatenate(blocks, axis=1)

    def forward(self, batch: Dict) -> Dict[str, np.ndarray]:
        pooled = self.pooled_outputs(batch)
        dense = self.dense_matrix(batch)
        tower = self.model.tower

        emb_list = [
            self.apply_post(pooled[c.name], c.post, pooled_map=pooled)
            for c in self.model.embedding_columns
            if c.in_concat
        ]
        if tower.arch == "mlp":
            front = dense
            if tower.bottom_mlp and dense.shape[1]:
                front = run_mlp(
                    self.params["tower"]["bottom"], dense, tower.activation,
                    tower.activation,
                )
            concat = np.concatenate([front] + emb_list, axis=1) if emb_list else front
            tower_in = concat
        elif tower.arch == "dlrm_dot":
            bottom = run_mlp(
                self.params["tower"]["bottom"], dense, tower.activation,
                tower.activation,
            )
            vecs = [bottom] + emb_list            # [n_vec] of [B, d]
            v = np.stack(vecs, axis=1)            # [B, n_vec, d]
            gram = np.einsum("bnd,bmd->bnm", v, v)
            iu = np.triu_indices(len(vecs), k=1)
            inter = gram[:, iu[0], iu[1]]         # [B, n_pairs]
            concat = np.concatenate([dense] + emb_list, axis=1)
            tower_in = np.concatenate([bottom, inter], axis=1).astype(np.float32)
        else:
            raise ValueError(tower.arch)

        logits = run_mlp(
            self.params["tower"]["top"], tower_in, tower.activation,
            tower.final_activation,
        )
        return {
            "pooled": pooled,
            "dense": dense,
            "concat": concat,
            "tower_input": tower_in,
            "output": logits,
        }


def oracle_forward(model: ModelSpec, batch: Dict, params: Optional[Dict] = None):
    return OracleModel(model, params).forward(batch)

"""The column IR: typed feature-column pipelines.

The reference mines these pipelines out of a frozen TF GraphDef with pattern
matching (reference graph_optimizers/graph_info.cc:209-365 ExtractFCNodes).
We own the IR instead: a model is a list of :class:`FeatureColumn`, each a
``source -> [transforms] -> lookup -> concat slot`` pipeline, plus embedding
:class:`TableSpec` s and a dense :class:`TowerSpec`.  An importer can
re-create the reference's extraction on top of this IR later; nothing in the
compiler depends on TF.

Every transform carries the *abstract kind* used by the pre-lookup
interval-set algebra (reference pre_lookup_optimizer.h:38-48 OpMeta — Gather /
Select / Map / Keep):

  * ``map``    — establishes a value range (HashBucket, Bucketize, Vocab...)
  * ``gather`` — drops out-of-set elements, compacting the sparse tensor
  * ``select`` — substitutes out-of-set elements with a constant
  * ``keep``   — shape/dtype-only (Cast, Identity)
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import json
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from recom_tpu.ir.intervals import IntervalSet


class FeatureKind(enum.Enum):
    """Raw feature wire formats accepted at the engine boundary."""

    DENSE_FLOAT = "dense_float"    # one float per example
    DENSE_INT = "dense_int"        # one int per example
    STRING = "string"              # one string per example
    INT_LIST = "int_list"          # variable-length int list per example
    STRING_LIST = "string_list"    # variable-length string list per example
    FLOAT_LIST = "float_list"      # variable-length float list (weights)
    CROSS = "cross"                # per-example cross product of the values
                                   # of FeatureSource.fields (feature cross)


_LIST_KINDS = (FeatureKind.INT_LIST, FeatureKind.STRING_LIST, FeatureKind.FLOAT_LIST)
_STRING_KINDS = (FeatureKind.STRING, FeatureKind.STRING_LIST)


@dataclasses.dataclass(frozen=True)
class FeatureSource:
    field: str
    kind: FeatureKind
    # For STRING_LIST sources: when set, the raw wire format is ONE
    # delimiter-joined string per example (the reference's
    # tf.strings.split(';') idiom, dlrm.py:49-53) and the native host path
    # splits+hashes it in C++ without touching Python.  List-of-lists input
    # is accepted either way.
    delimiter: Optional[str] = None
    # For CROSS sources: the raw feature fields whose per-example value
    # tuples are crossed (tf.feature_column.crossed_column keys)
    fields: Optional[Tuple[str, ...]] = None
    # For integer sources: declared inclusive value bounds.  Purely an
    # optimization hint: it seeds the pre-lookup interval analysis
    # (passes.initial_range) so filters/selects can be proven redundant
    # BEFORE any Map transform — the reference derives the same
    # information from upstream ops' symbolic content (PreLookupOptimizer
    # match over the established range, pre_lookup_optimizer.cc:413-478).
    # Values outside the declared range are the caller's contract breach.
    int_range: Optional[Tuple[int, int]] = None
    # For DENSE_FLOAT passthrough columns (no transforms, no lookup): the
    # per-example vector width — TF numeric_column(shape=(k,)).  The feed
    # is [B, k] (or [B] when 1) and the column occupies k consecutive
    # tower-input slots.  Width > 1 on any other column kind is rejected
    # by ModelSpec validation.
    width: int = 1

    def __post_init__(self):
        if self.kind == FeatureKind.CROSS and not self.fields:
            raise ValueError("CROSS source requires fields")
        if self.fields is not None:
            object.__setattr__(self, "fields", tuple(self.fields))
        if self.width < 1:
            raise ValueError(f"source {self.field!r}: width must be >= 1")

    @property
    def is_ragged(self) -> bool:
        # a cross of k fields yields a variable number of tuples per example
        # whenever any key is a list feature; treat all crosses as ragged
        return self.kind in _LIST_KINDS or self.kind == FeatureKind.CROSS

    @property
    def is_string(self) -> bool:
        return self.kind in _STRING_KINDS


class Combiner(enum.Enum):
    SUM = "sum"
    MEAN = "mean"
    SQRTN = "sqrtn"
    # Softmax-weighted pooling: the weight feed (scores) is softmaxed per
    # row over the VALID positions, then row = sum(softmax(w)_i * emb_i).
    # This is the reference's sequence-domain SparseSoftmax + SequenceMask
    # + MatMul pattern (post_lookup_optimizer.cc:311-478) as a first-class
    # combiner: the [B, C, L] canonical layout makes the mask implicit,
    # the softmax runs on HOST over the staged weights (shared with the
    # oracle — bit-exact), and the device pools with the plain SUM path
    # (no device transcendentals).  TF expression: tf.sparse.softmax on
    # the weight SparseTensor + embedding_lookup_sparse(combiner="sum").
    SOFTMAX = "softmax"


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Transform:
    """Base class; subclasses are pure per-element functions."""

    @property
    def kind(self) -> str:
        raise NotImplementedError

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        """Integer range of outputs given integer range of inputs.  Only
        meaningful once values are integer ids; float/string stages return
        the universe."""
        return IntervalSet.all()

    def cache_key(self) -> str:
        return f"{type(self).__name__}:{dataclasses.asdict(self)}"


@dataclasses.dataclass(frozen=True)
class HashBucket(Transform):
    """TF ``StringToHashBucketFast`` semantics: FarmHash Fingerprint64 of the
    UTF-8 bytes, mod ``num_buckets``.  Integer inputs are hashed via their
    decimal-string representation (tf.feature_column categorical hash-bucket
    behavior).  Host-side (strings never reach the device)."""

    num_buckets: int

    @property
    def kind(self) -> str:
        return "map"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return IntervalSet.closed(0, self.num_buckets - 1)


@dataclasses.dataclass(frozen=True)
class Bucketize(Transform):
    """TF ``Bucketize``: output = #boundaries <= x  (upper_bound).  Runs on
    device, vectorized over the whole bucketized-column group.

    Boundaries are rounded to FLOAT32 at construction: TF's Bucketize op
    stores them as proto ``list(float)`` (f32) and its kernel compares
    against ``std::vector<float>``, so a non-f32-representable boundary
    like 0.7 buckets by its f32 rounding in TF — keeping the spec in f64
    would make the oracle diverge from TF for feed values between the two.
    Imported graphs already carry f32 attr values; this makes hand-written
    specs mean the same thing."""

    boundaries: Tuple[float, ...]

    def __init__(self, boundaries: Sequence[float]):
        object.__setattr__(
            self,
            "boundaries",
            tuple(float(np.float32(b)) for b in boundaries),
        )
        if list(self.boundaries) != sorted(set(self.boundaries)):
            raise ValueError("bucketize boundaries must be strictly increasing")

    @property
    def kind(self) -> str:
        return "map"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return IntervalSet.closed(0, len(self.boundaries))


@dataclasses.dataclass(frozen=True)
class NumToId(Transform):
    """Interpret an integer feature directly as an id (TF
    ``categorical_column_with_identity``).  ``num_ids`` bounds the valid
    range; out-of-range behavior is governed by downstream Select/Filter
    transforms (or ``default_id``)."""

    num_ids: int
    default_id: Optional[int] = None

    def __post_init__(self):
        # TF's identity column requires default_value in [0, num_buckets);
        # admitting an out-of-range default would also make out_range's
        # [0, num_ids) claim unsound and let simplify_pre_lookup drop a
        # downstream Select that still had work to do
        if self.default_id is not None and not (
            0 <= self.default_id < self.num_ids
        ):
            raise ValueError(
                f"NumToId: default_id {self.default_id} outside "
                f"[0, {self.num_ids})"
            )

    @property
    def kind(self) -> str:
        return "map" if self.default_id is not None else "keep"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        if self.default_id is not None:
            return IntervalSet.closed(0, self.num_ids - 1)
        return in_range


@dataclasses.dataclass(frozen=True)
class VocabLookup(Transform):
    """TF ``categorical_column_with_vocabulary_list``: map raw values to
    their vocab index; OOV values hash into ``num_oov`` extra buckets when
    ``num_oov > 0``, else map to ``default`` (-1 means "drop downstream").
    Host-side for string vocabs."""

    vocab: Tuple[Union[str, int], ...]
    num_oov: int = 0
    default: int = -1

    def __init__(self, vocab, num_oov: int = 0, default: int = -1):
        object.__setattr__(self, "vocab", tuple(vocab))
        object.__setattr__(self, "num_oov", int(num_oov))
        object.__setattr__(self, "default", int(default))

    @property
    def kind(self) -> str:
        return "map"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        n = len(self.vocab)
        rng = IntervalSet.closed(0, n + max(self.num_oov, 0) - 1)
        if self.num_oov == 0:
            rng = rng.union(IntervalSet.point(self.default))
        return rng

    def cache_key(self) -> str:
        # repr keeps the entry TYPE in the key: an int vocab (1, 2) and a
        # string vocab ("1", "2") have different semantics (the oracle's
        # dict lookup misses across types) and must not share a memo slot
        h = hashlib.md5(
            json.dumps([repr(v) for v in self.vocab]).encode()
        ).hexdigest()
        return f"VocabLookup:{h}:{self.num_oov}:{self.default}"


@dataclasses.dataclass(frozen=True)
class CrossHash(Transform):
    """Hashed feature cross (tf.feature_column.crossed_column semantics):
    each crossed tuple's members are Fingerprint64-hashed (ints via decimal
    string, like hash_bucket), combined left-to-right with TF's
    FingerprintCat64 starting from ``hash_key`` (TF default 0xDECAFCAFFE),
    then taken modulo ``num_buckets`` as an unsigned 64-bit value.

    Applies to values produced by a CROSS source (tuples)."""

    num_buckets: int
    hash_key: int = 0xDECAFCAFFE

    @property
    def kind(self) -> str:
        return "map"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return IntervalSet.closed(0, self.num_buckets - 1)


@dataclasses.dataclass(frozen=True)
class Mod(Transform):
    """Floored modulo (result in [0, n) for n > 0), applied to integer ids."""

    n: int

    @property
    def kind(self) -> str:
        return "map"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return IntervalSet.closed(0, self.n - 1)


@dataclasses.dataclass(frozen=True)
class FilterRange(Transform):
    """Drop (compact away) elements outside ``keep`` — the reference's
    abstract Gather (Where + GatherV2 idiom; runtime analogue
    Addons>GatherValueGenIndice)."""

    keep: IntervalSet

    @property
    def kind(self) -> str:
        return "gather"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return in_range.intersect(self.keep)


@dataclasses.dataclass(frozen=True)
class SelectRange(Transform):
    """Replace elements outside ``keep`` with ``substitute`` — the
    reference's abstract Select (runtime analogue Addons>SelectValue)."""

    keep: IntervalSet
    substitute: int

    @property
    def kind(self) -> str:
        return "select"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        r = in_range.intersect(self.keep)
        return r.union(IntervalSet.point(self.substitute))


@dataclasses.dataclass(frozen=True)
class FilterStrSentinel(Transform):
    """Drop (compact away) STRING values equal to ``sentinel`` before any
    hashing/vocab mapping — the reference's Addons>GatherStrValueGenIndice
    (keep values != not_equal attr, generate compacted indices;
    gather_str_value_gen_indice_ops.cc:31-58).  Lives on the string plane,
    so the id-interval algebra treats it as range-neutral (out_range
    default) and it must precede the chain's string->int transform."""

    sentinel: str

    @property
    def kind(self) -> str:
        return "gather"


@dataclasses.dataclass(frozen=True)
class Cast(Transform):
    """dtype cast; a Keep op for the interval algebra."""

    dtype: str = "int64"

    @property
    def kind(self) -> str:
        return "keep"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return in_range


@dataclasses.dataclass(frozen=True)
class HostEvalChain(Transform):
    """Bounded host-side evaluator for otherwise-unrecognized pre-lookup
    VALUE compute — the run-anything fallback the reference gets from
    leaving unmatched graph segments on the CPU (RETURN_IF_FALSE
    discipline + CPU placement, cuda_emitter.cc:141-154).  The importer
    compiles a chain of elementwise ops with constant operands (the
    MatchExpr/op_infer_fn vocabulary: Mul/Add/Sub/Div/FloorDiv/FloorMod/
    Min/Max/Floor/Ceil/Round/Cast) into ``steps`` evaluated per request on
    the host in the ORIGINAL TF dtype, so results stay bit-exact with the
    TF session that ran the same ops.

    steps: tuple of (op, const, dtype) applied left-to-right; dtype in
    {"f32", "f64", "i32", "i64"} is the TF op's T attr — each step casts
    its input to that dtype before computing, reproducing TF's per-op
    dtype semantics exactly.  Integer-dtype step constants stay Python
    ints (an int64 const above 2^53 would be corrupted by a float()
    round-trip, breaking the bit-exact-with-TF contract)."""

    steps: Tuple[Tuple[str, Optional[float], str], ...]

    def __init__(self, steps):
        def coerce(c, dt):
            if c is None:
                return None
            if str(dt) in ("i32", "i64"):
                return int(c)
            return float(c)

        object.__setattr__(
            self, "steps",
            tuple((str(op), coerce(c, dt), str(dt)) for op, c, dt in steps),
        )

    @property
    def kind(self) -> str:
        # establishes no known range: downstream range analysis treats the
        # output as unbounded (canonicalize then warns + clamps at serving)
        return "keep"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return IntervalSet.all()


@dataclasses.dataclass(frozen=True)
class IdentityTransform(Transform):
    @property
    def kind(self) -> str:
        return "keep"

    def out_range(self, in_range: IntervalSet) -> IntervalSet:
        return in_range


# ---------------------------------------------------------------------------
# Tables / lookup / columns / model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """One embedding table.  ``vocab_size`` rows x ``dim`` columns."""

    name: str
    vocab_size: int
    dim: int
    dtype: str = "float32"
    init_seed: int = 0
    init_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class LookupSpec:
    """Canonical lookup: pooled = combine_{l in row} w_l * table[id_l];
    empty rows produce zeros (TF ``safe_embedding_lookup_sparse`` semantics —
    the observable behavior of the reference's SparseFillEmptyRows + Select
    idiom, lookup_optimizer.cc:108-134)."""

    table: str
    combiner: Combiner = Combiner.MEAN
    weight_field: Optional[str] = None  # parallel FLOAT_LIST feature


@dataclasses.dataclass(frozen=True)
class PostPool:
    """Post-lookup per-column compute on the POOLED [B, d] output — the
    expressible subset of the reference's post-lookup column subgraphs:
    BatchColReduction (Sum over the embedding dim, cuda_emitter.cc:
    1180-1244), elementwise affine, softmax over the embedding dim (the
    SparseSoftmax pattern, post_lookup_optimizer.cc:311-478, restated on
    the pooled dense output), and elementwise column x column products
    (the push-Mul-under-sparse pattern, post_lookup_optimizer.cc:480-608).

    op:
      * "reduce_sum"  — y = sum_d x[:, d]   (output width 1)
      * "reduce_mean" — y = mean_d x[:, d]  (output width 1)
      * "affine"      — y = x * scale + bias (per-dim vectors or scalars
                        broadcast; output width d)
      * "softmax"     — y = softmax_d(x) (stable: exp(x - max) / sum;
                        output width d)
      * "mul_column"  — y = x * pooled[other] elementwise, where ``other``
                        names another embedding column of the SAME dim in
                        the model; the operand is other's RAW pooled
                        output (pre-post), so chains cannot cycle.
      * "matmul"      — y = x @ weight, a frozen per-column projection
                        [d_in, d_out] (output width d_out).  The pooled
                        restatement of the reference's push-MatMul-under-
                        sparse rewrite (post_lookup_optimizer.cc:227-309:
                        SparseToDense(sp) @ W -> SparseToDense(values @ W))
                        — sum/mean/sqrtn pooling is linear in the values,
                        so projecting the POOLED vector equals pooling the
                        projected sequence values up to float association.
    Ops chain left-to-right; an affine after a reduce acts on width 1."""

    op: str
    scale: Optional[Tuple[float, ...]] = None
    bias: Optional[Tuple[float, ...]] = None
    other: Optional[str] = None         # mul_column operand column name
    weight: Optional[Tuple[Tuple[float, ...], ...]] = None  # matmul [d,k]

    def __post_init__(self):
        if self.op not in ("reduce_sum", "reduce_mean", "affine",
                           "softmax", "mul_column", "matmul"):
            raise ValueError(f"unknown PostPool op {self.op!r}")
        if self.op == "mul_column" and not self.other:
            raise ValueError("mul_column needs other=<column name>")
        for f in ("scale", "bias"):
            v = getattr(self, f)
            if v is not None:
                # ALWAYS coerce the elements: a tuple of np.float64 would
                # skip coercion and bake "np.float64(...)" reprs into
                # cache_key, so the same spec hashes differently before
                # and after a serde round-trip
                object.__setattr__(
                    self, f,
                    tuple(float(x) for x in np.atleast_1d(v)),
                )
        if self.op == "matmul":
            w = self.weight
            if w is None:
                raise ValueError("matmul needs weight=[d_in][d_out]")
            w = tuple(tuple(float(x) for x in row) for row in np.atleast_2d(w))
            if len({len(r) for r in w}) != 1:
                raise ValueError("matmul weight rows must be equal length")
            object.__setattr__(self, "weight", w)

    def out_width(self, d: int) -> int:
        if self.op == "matmul":
            if len(self.weight) != d:
                raise ValueError(
                    f"matmul weight is {len(self.weight)}x"
                    f"{len(self.weight[0])} but the column is width {d}"
                )
            return len(self.weight[0])
        return 1 if self.op.startswith("reduce") else d

    def cache_key(self) -> str:
        w = None
        if self.weight is not None:
            import hashlib

            w = hashlib.md5(repr(self.weight).encode()).hexdigest()[:12]
        return (
            f"PostPool:{self.op}:{self.scale}:{self.bias}:{self.other}:{w}"
        )


def column_out_width(model, col) -> int:
    """Concat-slot width of an embedding column: table dim transformed by
    the post-lookup chain."""
    d = model.tables[col.lookup.table].dim
    for p in col.post:
        d = p.out_width(d)
    return d


@dataclasses.dataclass(frozen=True)
class FeatureColumn:
    """source -> transforms -> (optional) lookup -> post -> concat slot.

    ``lookup is None`` means a dense passthrough column: the (single
    per-example float) value feeds the tower directly.  ``post`` applies
    per-column compute to the pooled output (see PostPool)."""

    name: str
    source: FeatureSource
    transforms: Tuple[Transform, ...] = ()
    lookup: Optional[LookupSpec] = None
    post: Tuple["PostPool", ...] = ()
    # in_concat=False: the column's pooled output feeds OTHER columns'
    # post chains (mul_column operands) but occupies no concat slot — how
    # the reference's push-Mul-under-sparse rewrite imports when only the
    # product reaches the output concat (post_lookup_optimizer.cc:480-608)
    in_concat: bool = True

    def __post_init__(self):
        object.__setattr__(self, "transforms", tuple(self.transforms))
        object.__setattr__(self, "post", tuple(self.post))
        if self.post and self.lookup is None:
            raise ValueError(
                f"column {self.name!r}: post-lookup ops need a lookup"
            )
        if not self.in_concat and self.lookup is None:
            raise ValueError(
                f"column {self.name!r}: in_concat=False needs a lookup "
                "(a hidden column exists only as a pooled operand)"
            )

    def chain_key(self) -> str:
        """Identity of the source+transform chain, for shared-sub-column
        dedup (two columns with equal chain_key compute identical ids)."""
        parts = [
            self.source.field,
            self.source.kind.value,
            str(self.source.delimiter),
            str(self.source.fields),
            str(self.source.width),
        ]
        parts += [t.cache_key() for t in self.transforms]
        return "|".join(parts)


@dataclasses.dataclass(frozen=True)
class TowerSpec:
    """Dense tower over [dense_features, pooled_embeddings].

    arch:
      * "mlp"      — concat everything, run top MLP (reference models E/F,
                     examples/python/dlrm.py:140-207 style)
      * "dlrm_dot" — DLRM: bottom MLP on dense, dot-interaction of embedding
                     vectors (requires uniform dim), top MLP
    """

    arch: str = "mlp"
    bottom_mlp: Tuple[int, ...] = ()
    top_mlp: Tuple[int, ...] = (1024, 1024, 128, 1)
    activation: str = "relu"
    final_activation: Optional[str] = "sigmoid"
    init_seed: int = 0


@dataclasses.dataclass
class ModelSpec:
    name: str
    tables: Dict[str, TableSpec]
    columns: List[FeatureColumn]
    tower: TowerSpec = dataclasses.field(default_factory=TowerSpec)

    def __post_init__(self):
        self.validate()

    def validate(self):
        names = set()
        for col in self.columns:
            if col.name in names:
                raise ValueError(f"duplicate column name {col.name!r}")
            names.add(col.name)
            if col.lookup is not None:
                if col.lookup.table not in self.tables:
                    raise ValueError(
                        f"column {col.name!r} references unknown table "
                        f"{col.lookup.table!r}"
                    )
            else:
                if col.source.kind != FeatureKind.DENSE_FLOAT:
                    raise ValueError(
                        f"dense passthrough column {col.name!r} must have "
                        f"DENSE_FLOAT source, got {col.source.kind}"
                    )
                if col.transforms:
                    raise ValueError(
                        f"dense passthrough column {col.name!r} cannot have "
                        "transforms"
                    )
            if col.source.width != 1 and col.lookup is not None:
                raise ValueError(
                    f"column {col.name!r}: source width "
                    f"{col.source.width} is only valid on dense "
                    "passthrough columns"
                )
            # (post without a lookup is unrepresentable: FeatureColumn's
            # constructor raises "post-lookup ops need a lookup")
            if col.post and self.tower.arch == "dlrm_dot":
                raise ValueError(
                    f"column {col.name!r}: post-lookup ops change slot "
                    "widths; dlrm_dot interaction requires uniform dims"
                )
        by_name = {c.name: c for c in self.columns}
        for col in self.columns:
            if not col.post or col.lookup is None:
                continue
            # fold widths through the chain so a mul_column AFTER a
            # width-changing op (reduce/matmul) is checked against the
            # width AT ITS POSITION, not the column's table dim — the
            # operand is the other column's RAW pooled [B, table dim]
            # and mul is strictly elementwise (no broadcast)
            w = self.tables[col.lookup.table].dim
            for p in col.post:
                if p.op == "mul_column":
                    other = by_name.get(p.other)
                    if other is None or other.lookup is None:
                        raise ValueError(
                            f"column {col.name!r}: mul_column operand "
                            f"{p.other!r} is not an embedding column"
                        )
                    if self.tables[other.lookup.table].dim != w:
                        raise ValueError(
                            f"column {col.name!r}: mul_column operand "
                            f"{p.other!r} is width "
                            f"{self.tables[other.lookup.table].dim} but "
                            f"the chain is width {w} at that position"
                        )
                w = p.out_width(w)

    @property
    def embedding_columns(self) -> List[FeatureColumn]:
        return [c for c in self.columns if c.lookup is not None]

    @property
    def dense_columns(self) -> List[FeatureColumn]:
        return [c for c in self.columns if c.lookup is None]

    @property
    def dense_width(self) -> int:
        """Total dense tower-input width (sum of passthrough widths)."""
        return sum(c.source.width for c in self.dense_columns)

    @property
    def output_dim(self) -> int:
        """Width of the concatenated feature matrix feeding the tower:
        dense passthroughs + each concat-visible embedding column's
        post-chain output width."""
        d = self.dense_width
        for c in self.embedding_columns:
            if c.in_concat:
                d += column_out_width(self, c)
        return d

    def spec_hash(self) -> str:
        """Stable hash for compile caching (the analogue of the reference's
        generated-code MD5 cache key, cuda_emitter.cc:86-111)."""
        h = hashlib.sha256()
        h.update(self.name.encode())
        for t in sorted(self.tables):
            h.update(repr(self.tables[t]).encode())
        for c in self.columns:
            h.update(c.chain_key().encode())
            h.update(repr(c.lookup).encode())
            # post chains / hidden columns / declared ranges all change the
            # lowered program (concat widths, slot membership, which
            # transforms simplify away) and must change the hash
            for p in c.post:
                h.update(p.cache_key().encode())
            h.update(repr(c.in_concat).encode())
            h.update(repr(c.source.int_range).encode())
        h.update(repr(self.tower).encode())
        return h.hexdigest()[:16]

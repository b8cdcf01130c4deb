"""Lowering: ModelSpec -> CompiledModel (grouped, stacked, static layout).

The TPU-native replacement for the reference's per-column CUDA codegen
(cuda_emitter.cc EmitFCCode emits one __device__ struct per column and one
thread block per column).  Instead of 1000 tiny programs we build a handful
of *lookup groups*: columns sharing (embedding_dim, raggedness, and — for
one-hot-megakernel-eligible columns — the 128-padded vocab) are stacked —
their tables concatenated row-wise into one array with per-column row
offsets, their ids packed into one [B, C, L] tensor — so the whole model
executes as a few large batched gathers/matmuls that XLA can tile onto the
MXU, plus one static-offset concat (the reference's ConcatOutputs scatter
kernel disappears into layout).

Host/device split (reference analogue: SetFCBeginToCPU pins string producers
to CPU, cuda_emitter.cc:172-190):
  * string hashing / vocab maps -> host (recom_tpu.runtime.host_prep)
  * Bucketize of dense floats  -> device, batched over all such columns
  * everything downstream       -> device
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from recom_tpu.config import EngineConfig
from recom_tpu.ir.spec import (
    Bucketize,
    Combiner,
    FeatureColumn,
    FeatureKind,
    ModelSpec,
    Transform,
)

_COMBINER_CODE = {
    Combiner.SUM: 0,
    Combiner.MEAN: 1,
    Combiner.SQRTN: 2,
    # SOFTMAX pools as a plain weighted SUM on device: the softmax of the
    # scores happens on HOST at weight-staging time (softmax_scores,
    # shared with the oracle) so no transcendental runs on the compute
    # path and the bit-exactness contract holds.
    Combiner.SOFTMAX: 0,
}


@dataclasses.dataclass
class GroupMember:
    column: FeatureColumn
    table: str
    row_offset: int              # row offset into the group's stacked table
    vocab_size: int
    combiner: Combiner
    device_bucketize: Optional[Bucketize]   # ids computed on device if set
    device_lut: Optional[np.ndarray]        # post-bucketize id LUT (int32,
                                            # -1 = dropped), or None
    host_chain: Tuple[Transform, ...]       # transforms evaluated on host
    # filled in by layout assignment:
    group_index: int = -1        # position (C axis) inside the group
    concat_offset: int = -1      # column's offset in the model-order concat
    out_width: int = -1          # concat-slot width (dim, or 1 after a
                                 # post-lookup reduce)
    in_group_offset: int = -1    # offset in the group's output concat


@dataclasses.dataclass
class LookupGroup:
    gid: int
    dim: int
    ragged: bool                 # True -> runtime row-length bucket (L >= 1)
    members: List[GroupMember]
    # uniform per-column vocab when this group lowers to the Pallas one-hot
    # MXU megakernel (ops/lookup_pallas.py); None -> XLA gather path
    pallas_vocab: Optional[int] = None
    stacked_rows: int = 0
    row_offsets: Optional[np.ndarray] = None     # [C] int32
    combiner_code: Optional[np.ndarray] = None   # [C] int32
    has_weights: bool = False
    # per-column bool: column uses an explicit weight field (its combiner
    # follows TF's weighted-path rounding; unweighted columns follow the
    # SparseSegment* reciprocal-multiply rounding)
    weighted_cols: Optional[np.ndarray] = None
    # per-column last valid row (vocab-1): runtime ids clamp here, the
    # serving semantics canonicalize_lookup's warn path promises (ids < 0
    # stay missing).  Without the clamp an oversized id would fall into a
    # SIBLING member's rows of the stacked table.
    vocab_caps: Optional[np.ndarray] = None
    # device-bucketize members occupy group indices [0, n_bucketize)
    n_bucketize: int = 0
    boundary_matrix: Optional[np.ndarray] = None  # [n_bucketize, Kmax] f32
    boundary_counts: Optional[np.ndarray] = None  # [n_bucketize] int32
    # post-bucketize LUT stack [n_bucketize, Kmax+1] int32 (identity rows
    # for suffix-free members); None when no member has a suffix
    lut_matrix: Optional[np.ndarray] = None

    @property
    def num_columns(self) -> int:
        return len(self.members)

    @property
    def out_width(self) -> int:
        return sum(m.out_width for m in self.members)

    @property
    def any_post(self) -> bool:
        """Any member carries post-lookup ops (the engine then builds the
        group concat per-member instead of one reshape)."""
        return any(m.column.post for m in self.members)


@dataclasses.dataclass
class CompiledModel:
    model: ModelSpec
    config: EngineConfig
    groups: List[LookupGroup]
    # mapping: model-order emb concat[i] = grouped concat[emb_perm[i]].
    # A permutation without dedup; with dedup_subcolumns aliased duplicate
    # columns map onto their representative's grouped slot, so emb_perm is
    # surjective onto [0, grouped_emb_dim) but not injective.
    emb_perm: np.ndarray
    total_emb_dim: int           # model-order concat width (incl. aliases)
    grouped_emb_dim: int         # grouped concat width (aliases excluded)
    n_dense: int               # total dense tower-input rows (sum of widths)
    # one entry per dense row: (field, dim index | None).  None = width-1
    # scalar feed [B]; an int j = dim j of a width-k vector feed [B, k]
    # (TF numeric_column(shape=(k,))).
    dense_rows: List[Tuple[str, Optional[int]]] = dataclasses.field(
        default_factory=list
    )
    # column name -> (group id, group index) for per-column output extraction
    column_slot: Dict[str, Tuple[int, int]] = dataclasses.field(default_factory=dict)

    def stacked_table(self, g: LookupGroup, tables: Dict[str, np.ndarray]) -> np.ndarray:
        """Concatenate member tables into the group's stacked array."""
        parts = [np.asarray(tables[m.table], dtype=np.float32) for m in g.members]
        return np.concatenate(parts, axis=0)


def _pointwise_suffix_ok(transforms) -> bool:
    """True if every transform acts pointwise on integer ids — such a
    suffix after Bucketize compiles to a LUT over the finite output range."""
    from recom_tpu.ir.spec import (
        Cast,
        FilterRange,
        HashBucket,
        IdentityTransform,
        Mod,
        SelectRange,
    )

    allowed = (FilterRange, SelectRange, Mod, Cast, IdentityTransform,
               HashBucket)
    return all(isinstance(t, allowed) for t in transforms)


def _suffix_lut(bz: Bucketize, suffix) -> Optional[np.ndarray]:
    """Compile a pointwise transform suffix into id -> id' (int32, -1 =
    entry dropped).  Bucketize emits ids in [0, K], so the whole suffix —
    filters, selects, mods, int re-hashing — evaluates over K+1 candidates
    through the ORACLE transform code (single source of semantics).  The
    reference reaches the same effect with its interval-set reconstruction
    (pre_lookup_optimizer.cc:480-720); a LUT subsumes it for any pointwise
    chain."""
    if not suffix:
        return None
    from recom_tpu.oracle.reference import SparseFeature, apply_transform

    k = len(bz.boundaries)
    cand = np.arange(k + 1, dtype=np.int64)
    sp = SparseFeature(cand.copy(), cand.copy(), None, k + 1)
    for t in suffix:
        sp = apply_transform(t, sp)
    lut = np.full((k + 1,), -1, dtype=np.int32)
    lut[np.asarray(sp.row_ids, dtype=np.int64)] = np.asarray(
        sp.values, dtype=np.int64
    ).astype(np.int32)
    return lut


def _split_host_device(col: FeatureColumn):
    """Decide which prefix of the transform chain runs on device.

    A DENSE_FLOAT source whose chain is [Bucketize, *pointwise-int suffix]
    computes ids on device: the batched bucketize plus (when a suffix
    exists) a compiled per-column LUT (see _suffix_lut).  Everything else
    is evaluated on host; the device sees final ids.

    Returns (bucketize | None, device_suffix, host_chain)."""
    if (
        col.source.kind == FeatureKind.DENSE_FLOAT
        and col.transforms
        and isinstance(col.transforms[0], Bucketize)
        and _pointwise_suffix_ok(col.transforms[1:])
        # weighted columns take the ragged host layout end to end (ids +
        # weights planes); a device-bucketize member in a ragged group
        # has no host weights plane to ride.  Same for SOFTMAX: its host
        # softmax writes the weights plane, which bucketize members lack
        and col.lookup.weight_field is None
        and col.lookup.combiner != Combiner.SOFTMAX
    ):
        return col.transforms[0], col.transforms[1:], ()
    return None, (), col.transforms


def _host_class(m: GroupMember) -> int:
    """Host-prep class of a member: 0 = int-hash fast path, 1 = fixed-string
    hash, 2 = delimited split+hash, 3 = generic oracle chain.  Must agree
    with runtime/wire.py's plan partitioning (asserted at plan build).
    Class 3 is the safe generic path; a member is fast-path eligible only
    when the fast kernel reproduces the full semantics: unweighted, single
    HashBucket whose bucket count fits the table (ids never need the
    clamp the generic path applies), and — for splits — a SINGLE-byte
    delimiter (the native splitter scans one byte)."""
    from recom_tpu.ir.spec import HashBucket

    col = m.column
    one_hash = (
        len(m.host_chain) == 1
        and isinstance(m.host_chain[0], HashBucket)
        and m.host_chain[0].num_buckets <= m.vocab_size
    )
    if not one_hash or col.lookup.weight_field is not None:
        return 3
    if col.source.kind == FeatureKind.DENSE_INT:
        return 0
    if col.source.kind == FeatureKind.STRING:
        return 1
    if (
        col.source.kind == FeatureKind.STRING_LIST
        and col.source.delimiter is not None
        and len(col.source.delimiter.encode()) == 1
    ):
        return 2
    return 3


def lower_model(model: ModelSpec, config: EngineConfig) -> CompiledModel:
    # --- group columns by (dim, ragged, pallas_vocab) — the third key
    # part keeps the one-hot megakernel's uniform-[C, V, d] table-stack
    # assumption: pallas-eligible columns must not merge with gather-path
    # columns of the same (dim, ragged) ----------------------------------
    group_map: Dict[Tuple[int, bool, Optional[int]], LookupGroup] = {}
    members_by_col: Dict[str, Tuple[GroupMember, LookupGroup]] = {}
    # Shared-sub-column dedup (config.dedup_subcolumns; the runtime half of
    # compiler/passes.dedup_subcolumns): columns identical in EVERYTHING the
    # device consumes — id chain, table, combiner, weight field, post ops,
    # concat visibility — alias to ONE group member.  The duplicate costs
    # no wire bytes, no [B, C, L] id-plane width, no stacked-table rows,
    # and no pooling: only its model-order concat slots exist, and
    # emb_perm (a gather) points them at the representative's group slot.
    # Reference analogue: PreLookupOptimizer's shared-chain reconstruction
    # (pre_lookup_optimizer.cc:480-720) rebuilds shared prefixes to run
    # once; aliasing whole identical columns subsumes that for the
    # duplicate-column case.
    dedup = bool(getattr(config, "dedup_subcolumns", True))
    rep_by_key: Dict[Tuple, Tuple[GroupMember, LookupGroup]] = {}
    for col in model.embedding_columns:
        if dedup:
            dkey = (
                col.chain_key(), col.lookup.table, col.lookup.combiner,
                col.lookup.weight_field, repr(col.post), col.in_concat,
            )
            hit = rep_by_key.get(dkey)
            if hit is not None:
                members_by_col[col.name] = hit
                continue
        tspec = model.tables[col.lookup.table]
        # weighted columns always take the ragged layout (ids + weights
        # arrays): TF's weighted_categorical_column applies to single-value
        # features too, and the non-ragged fast path has no weights plane
        ragged = (
            col.source.is_ragged
            or col.lookup.weight_field is not None
            or col.lookup.combiner == Combiner.SOFTMAX
        )
        # Pallas one-hot megakernel eligibility: dense (L=1) unweighted
        # columns with small vocab — grouped by vocab so the kernel sees a
        # uniform [C, V, d] table stack
        pallas_vocab = None
        if (
            config.use_pallas
            and not ragged
            and col.lookup.weight_field is None
            and tspec.vocab_size <= config.onehot_vocab_limit
            # int8 groups take the gather path (per-row dequant scales
            # don't fit the one-hot matmul formulation)
            and config.table_dtype != "int8"
        ):
            # group by 128-padded vocab so e.g. V=100 and V=101 columns
            # share one kernel invocation
            pallas_vocab = ((tspec.vocab_size + 127) // 128) * 128
        key = (tspec.dim, ragged, pallas_vocab)
        if key not in group_map:
            group_map[key] = LookupGroup(
                gid=len(group_map), dim=tspec.dim, ragged=ragged,
                members=[], pallas_vocab=pallas_vocab,
            )
        g = group_map[key]
        bz, device_suffix, host_chain = _split_host_device(col)
        lut = _suffix_lut(bz, device_suffix) if bz else None
        if bz is not None:
            # clamp device-computed ids to the member's table (the warn
            # path of canonicalize_lookup admits over-range chains; the
            # contract is clamp-to-last-row, never a sibling's rows)
            cap = tspec.vocab_size - 1
            if lut is not None:
                lut = np.minimum(lut, cap)
            elif len(bz.boundaries) > cap:
                lut = np.minimum(
                    np.arange(len(bz.boundaries) + 1, dtype=np.int32),
                    np.int32(cap),
                )
        m = GroupMember(
            column=col,
            table=col.lookup.table,
            row_offset=0,
            vocab_size=tspec.vocab_size,
            combiner=col.lookup.combiner,
            device_bucketize=bz,
            device_lut=lut,
            host_chain=host_chain,
        )
        g.members.append(m)
        members_by_col[col.name] = (m, g)
        if dedup:
            rep_by_key[dkey] = (m, g)
        if col.lookup.weight_field:
            g.has_weights = True
        if col.lookup.combiner == Combiner.SOFTMAX:
            # even score-less softmax needs a materialized weight plane:
            # uniform scores soften to 1/n, which the mask-only device
            # path cannot express
            g.has_weights = True

    groups = list(group_map.values())

    # --- order members: device-bucketize first, then host members grouped
    # by prep class (int-hash, str-hash, delimited split-hash, generic) so
    # each class occupies a CONTIGUOUS index range — the wire packer then
    # issues one strided native call per class with a single base pointer
    # instead of per-column destination views (runtime/wire.py).
    for g in groups:
        g.members.sort(
            key=lambda m: (m.device_bucketize is None, _host_class(m))
        )
        row = 0
        woff = 0
        codes = []
        offsets = []
        wcols = []
        caps = []
        for idx, m in enumerate(g.members):
            m.group_index = idx
            offsets.append(row)
            m.row_offset = row
            row += m.vocab_size
            from recom_tpu.ir.spec import column_out_width

            # hidden (in_concat=False) members pool like any other but
            # occupy no group-concat slot — they exist as mul_column
            # operands only
            m.out_width = (
                column_out_width(model, m.column)
                if m.column.in_concat else 0
            )
            m.in_group_offset = woff
            woff += m.out_width
            codes.append(_COMBINER_CODE[m.combiner])
            wcols.append(m.column.lookup.weight_field is not None)
            caps.append(m.vocab_size - 1)
        g.stacked_rows = row
        g.row_offsets = np.asarray(offsets, dtype=np.int32)
        g.combiner_code = np.asarray(codes, dtype=np.int32)
        g.weighted_cols = np.asarray(wcols, dtype=bool)
        g.vocab_caps = np.asarray(caps, dtype=np.int32)
        g.n_bucketize = sum(1 for m in g.members if m.device_bucketize is not None)
        if g.n_bucketize:
            bmax = max(
                len(m.device_bucketize.boundaries)
                for m in g.members[: g.n_bucketize]
            )
            from recom_tpu.native.ops import ceil32

            mat = np.full((g.n_bucketize, bmax), np.inf, dtype=np.float32)
            cnts = np.zeros((g.n_bucketize,), dtype=np.int32)
            for i, m in enumerate(g.members[: g.n_bucketize]):
                # ceil32 (smallest f32 >= the f64 boundary), NOT a plain
                # f32 cast: device compares f32 inputs with <=, and
                # ceil32(b) <= x  <=>  b <= f64(x), so the f32 device
                # comparison reproduces the oracle's f64 upper_bound
                # exactly — keeping wire (host ceil32 bucketize) and
                # structured (device bucketize) encodings bit-identical
                # for boundaries whose f32 rounding goes down (e.g. 0.7).
                b = ceil32(
                    np.asarray(m.device_bucketize.boundaries, np.float64)
                )
                mat[i, : len(b)] = b
                cnts[i] = len(b)
            g.boundary_matrix = mat
            g.boundary_counts = cnts
            if any(
                m.device_lut is not None for m in g.members[: g.n_bucketize]
            ):
                luts = np.empty((g.n_bucketize, bmax + 1), dtype=np.int32)
                for i, m in enumerate(g.members[: g.n_bucketize]):
                    row = np.arange(bmax + 1, dtype=np.int32)  # identity
                    if m.device_lut is not None:
                        row[: len(m.device_lut)] = m.device_lut
                    luts[i] = row
                g.lut_matrix = luts

    # --- concat layout: model column order ------------------------------
    # grouped concat = [group0 [B, C0*d0] | group1 ... ]; emb_perm maps the
    # model-order concat position to the grouped position.
    group_base = {}
    base = 0
    for g in groups:
        group_base[g.gid] = base
        base += g.out_width
    # model-order concat width INCLUDES aliased duplicates (each occupies
    # its declared slot, gathered from the shared grouped slot); the
    # grouped concat width (``base``) excludes them
    from recom_tpu.ir.spec import column_out_width as _cow

    total_emb = sum(
        _cow(model, col) if col.in_concat else 0
        for col in model.embedding_columns
    )

    perm = np.empty((total_emb,), dtype=np.int32)
    pos = 0
    column_slot = {}
    for col in model.embedding_columns:
        m, g = members_by_col[col.name]
        m.concat_offset = pos
        column_slot[col.name] = (g.gid, m.group_index)
        src = group_base[g.gid] + m.in_group_offset
        w = m.out_width                # 0 for hidden columns
        perm[pos : pos + w] = np.arange(src, src + w, dtype=np.int32)
        pos += w

    dense_rows: List[Tuple[str, Optional[int]]] = []
    for c in model.dense_columns:
        if c.source.width == 1:
            dense_rows.append((c.source.field, None))
        else:
            dense_rows.extend(
                (c.source.field, j) for j in range(c.source.width)
            )

    return CompiledModel(
        model=model,
        config=config,
        groups=groups,
        emb_perm=perm,
        total_emb_dim=total_emb,
        grouped_emb_dim=base,
        n_dense=len(dense_rows),
        dense_rows=dense_rows,
        column_slot=column_slot,
    )

"""Host-side preprocessing: raw features -> packed device arrays.

The analogue of the reference's CPU-pinned FC prefixes + ConcatInputs
single-blob H2D staging (concat_inputs_ops.cc:42-77): strings are hashed and
ragged features packed on host, then everything crosses to the device as a
few large dense arrays:

  * dense tower features          [n_dense, Bp]  f32
  * per non-ragged group:  raw bucketize floats [n_bz, Bp] f32
                           host-computed ids    [C_host, Bp, 1] int32
  * per ragged group:      padded ids           [C, Bp, L] int32 (-1 = pad)
                           weights (optional)   [C, Bp, L] f32

Semantics of the host transform chains are shared with the NumPy oracle
(oracle/reference.py) — one implementation of truth; the C++ fast path in
recom_tpu/native replaces only the hash inner loop.

LAYOUT: packed arrays are COLUMN-major (batch on axis 1: dense [n, Bp],
raw_bz [n_bz, Bp], host_ids [C, Bp, L]) because per-column host writes are
then contiguous memcpys (measured 2.3x faster than batch-major stacking at
880 columns) and the native *_multi calls emit [n_cols, batch, ...]
directly.  The device transposes to batch-major on entry — a transpose
fused into the first consumer costs nothing against HBM reads.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from recom_tpu.compiler.buckets import pick_bucket
from recom_tpu.compiler.lowering import CompiledModel, LookupGroup
from recom_tpu.ir import spec as spec_mod
from recom_tpu.ir.spec import Combiner
from recom_tpu.oracle.reference import (
    SparseFeature,
    apply_transform,
    materialize_source,
    softmax_scores,
)


# Per-column host work runs SERIALLY by design: measured on model E (100
# hash + 20 split columns, batch 512), a thread pool was a net loss (6.5ms
# vs 5.3ms p50) — each column is ~20-50us of mostly-GIL numpy around a
# short native call.  The productive levers are (a) ONE foreign call per
# column class (native_ops.*_multi) and (b) cross-REQUEST parallelism
# (ServingPipeline).


def _pack_sparse(
    sp: SparseFeature, rowlen: int, batch_padded: int,
    truncate: bool = False, cap: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(values, row_ids[, weights]) -> ids [Bp, L] int32 (-1 pad) and
    weights [Bp, L] f32 (0 pad) or None.  Preserves in-row entry order.

    ``truncate=True`` (allow_truncate_overflow) drops entries past
    ``rowlen`` from the END of each row and ignores rows past
    ``batch_padded`` — matching the native split path's behavior; False
    raises on row overflow (the safe default).

    ``cap``: member's last valid row — over-range ids clamp to it and
    negatives map to -1/missing (the canonicalize_lookup warn-path
    serving contract, applied identically on the wire path so both
    encodings stay bit-identical)."""
    ids = np.full((batch_padded, rowlen), -1, dtype=np.int32)
    values = np.asarray(sp.values, dtype=np.int64)
    if cap is not None and values.size:
        values = np.where(
            values < 0, np.int64(-1), np.minimum(values, cap)
        )
    row_ids = sp.row_ids
    pos = None
    if values.size:
        counts = np.bincount(row_ids, minlength=sp.batch)
        if counts.max() > rowlen and not truncate:
            raise ValueError(
                f"row length {int(counts.max())} exceeds bucket {rowlen}"
            )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(row_ids.shape[0]) - starts[row_ids]
        keep = pos < rowlen
        if truncate:
            keep &= row_ids < batch_padded
        row_ids, pos, values = row_ids[keep], pos[keep], values[keep]
        ids[row_ids, pos] = values.astype(np.int32)
    weights = None
    if sp.weights is not None:
        weights = np.zeros((batch_padded, rowlen), dtype=np.float32)
        if values.size:
            w = np.asarray(sp.weights)[keep]
            weights[row_ids, pos] = w
    return ids, weights


def _is_string_array(data) -> bool:
    if isinstance(data, np.ndarray):
        return data.dtype.kind in ("S", "U")
    return bool(len(data)) and isinstance(data[0], (str, bytes, np.str_, np.bytes_))


def fast_dense_plan(member, batch: Dict):
    """("int"|"str", contiguous array, num_buckets) for the batched native
    hash path, or None.  Covers the dominant host chains: STRING->HashBucket
    and DENSE_INT->HashBucket (reference model E: 100 such columns)."""
    col = member.column
    if member.host_chain and len(member.host_chain) == 1 and isinstance(
        member.host_chain[0], spec_mod.HashBucket
    ) and member.host_chain[0].num_buckets <= member.vocab_size:
        hb = member.host_chain[0]
        data = batch[col.source.field]
        if col.source.kind == spec_mod.FeatureKind.STRING and _is_string_array(data):
            arr = np.asarray(data)
            if arr.dtype.kind == "U":
                try:
                    arr = arr.astype("S")
                except UnicodeEncodeError:
                    return None
            return ("str", np.ascontiguousarray(arr), hb.num_buckets)
        if col.source.kind == spec_mod.FeatureKind.DENSE_INT:
            arr = np.ascontiguousarray(
                np.asarray(batch[col.source.field], dtype=np.int64)
            )
            return ("int", arr, hb.num_buckets)
    return None


def fast_dense_ids(member, batch: Dict) -> Optional[np.ndarray]:
    """Single-column native ids [B] (fallback when the multi-column call is
    unavailable), or None."""
    from recom_tpu.native import ops as native_ops

    plan = fast_dense_plan(member, batch)
    if plan is None:
        return None
    kind, arr, nb = plan
    if kind == "str":
        return native_ops.hash_strings(arr, nb)
    out = native_ops.hash_ints(arr, nb)
    return np.where(arr == -1, -1, out)  # TF ignore_value semantics


def fast_ragged_plan(member, batch: Dict):
    """(values_S_array, delimiter, num_buckets) for the native split+hash
    path, or None.  Applies to delimited STRING_LIST -> HashBucket chains
    whose wire input is an array of joined strings."""
    col = member.column
    if (
        col.source.kind == spec_mod.FeatureKind.STRING_LIST
        and col.source.delimiter is not None
        and len(col.source.delimiter.encode()) == 1
        and len(member.host_chain) == 1
        and isinstance(member.host_chain[0], spec_mod.HashBucket)
        and member.host_chain[0].num_buckets <= member.vocab_size
        and col.lookup.weight_field is None
    ):
        data = batch[col.source.field]
        if _is_string_array(data):
            arr = np.asarray(data)
            if arr.dtype.kind == "U":
                try:
                    arr = arr.astype("S")
                except UnicodeEncodeError:
                    return None
            return arr, col.source.delimiter, member.host_chain[0].num_buckets
    return None


def host_ids_for_member(
    member, batch: Dict, memo: Optional[Dict] = None
) -> SparseFeature:
    """Evaluate the member's host transform chain to final ids.

    ``memo`` dedups identical (source, transform-chain, weight-field)
    evaluations across columns — the runtime effect of the
    dedup_subcolumns compiler pass (shared sub-columns hash once)."""
    wf = member.column.lookup.weight_field
    key = (member.column.chain_key(), wf) if memo is not None else None
    if key is not None and key in memo:
        return memo[key]
    sp = materialize_source(member.column, batch, wf)
    for t in member.host_chain:
        sp = apply_transform(t, sp)
    if key is not None:
        memo[key] = sp
    return sp


class PreparedBatch:
    """Packed arrays + the static shape signature they were packed for."""

    def __init__(self, batch_size, batch_padded, rowlens, arrays, wsig=()):
        self.batch_size = batch_size
        self.batch_padded = batch_padded
        self.rowlens = rowlens          # tuple, one per group (1 if dense)
        self.arrays = arrays            # pytree fed to the jitted function
        # device-hash wire variant: per-group (fixed-string byte width,
        # delimited byte width) buckets, 0 = class hashed on host this
        # request (runtime/wire.py).  () when device_hash is off — the
        # signature then keeps its 2-tuple shape.
        self.wsig = tuple(wsig)

    @property
    def signature(self):
        if self.wsig:
            return (self.batch_padded, self.rowlens, self.wsig)
        return (self.batch_padded, self.rowlens)


def make_empty_prepared(
    compiled: CompiledModel,
    batch_padded: int,
    rowlens: Optional[Tuple[int, ...]] = None,
) -> PreparedBatch:
    """A zero/pad-filled PreparedBatch with the given shape signature —
    for Engine.warmup to trigger compilation without real data.  rowlens:
    one per group (1 forced for non-ragged); default = largest rowlen
    bucket for ragged groups."""
    config = compiled.config
    bp = batch_padded
    if rowlens is None:
        rowlens = tuple(
            max(config.rowlen_buckets) if g.ragged else 1
            for g in compiled.groups
        )
    dense = np.zeros((compiled.n_dense, bp), dtype=np.float32)
    group_arrays: List[Dict[str, np.ndarray]] = []
    for g, rl in zip(compiled.groups, rowlens):
        rl = 1 if not g.ragged else rl
        arrs: Dict[str, np.ndarray] = {}
        if g.n_bucketize:
            arrs["raw_bz"] = np.zeros((g.n_bucketize, bp), np.float32)
        n_host = len(g.members) - g.n_bucketize
        if n_host:
            arrs["host_ids"] = np.full((n_host, bp, rl), -1, np.int32)
            if g.has_weights:
                arrs["weights"] = np.zeros((n_host, bp, rl), np.float32)
        group_arrays.append(arrs)
    rls = tuple(
        1 if not g.ragged else rl for g, rl in zip(compiled.groups, rowlens)
    )
    return PreparedBatch(
        bp, bp, rls, {"dense": dense, "groups": group_arrays}
    )


def prepare_batch(
    compiled: CompiledModel,
    batch: Dict,
    batch_size: Optional[int] = None,
    rowlen_hints: Optional[Dict[int, int]] = None,
) -> PreparedBatch:
    """rowlen_hints: {group id: rowlen bucket} from previous requests
    (Engine tracks them).  When a hint is right — the steady state, since
    serving row-length distributions are stable — the delimited fast path
    hashes directly at the hinted bucket and the separate counting scan is
    skipped; a wrong hint is detected from the hash pass's returned max
    piece count and falls back to count-then-hash."""
    model, config = compiled.model, compiled.config

    if batch_size is None:
        for col in model.columns:
            probe = col.source.field
            if probe in batch:
                batch_size = len(batch[probe])
                break
            if col.source.fields:
                batch_size = len(batch[col.source.fields[0]])
                break
        if batch_size is None:
            raise ValueError("cannot infer batch size from batch dict")
    bp = pick_bucket(config.batch_buckets, batch_size, config.allow_truncate_overflow)
    if batch_size > bp:
        # allow_truncate_overflow past the largest batch bucket: serve the
        # first bp examples (documented truncation, never silent: pick_
        # bucket raised unless the config opted in)
        batch_size = bp

    def stack_cols(fields: List[str], n_rows: int) -> np.ndarray:
        """[len(fields), bp] f32 staging block via numpy row fills.
        (Measured: a native pointer-array memcpy sweep LOSES here — at 880
        columns, extracting .ctypes.data per array costs ~1.1ms while the
        row fills themselves are ~0.45ms.  Per-column attribute access is
        the floor of the many-small-arrays API, not the copying.)"""
        out = np.zeros((n_rows, bp), dtype=np.float32)
        for i, f in enumerate(fields):
            out[i, :batch_size] = np.asarray(
                batch[f], dtype=np.float32
            )[:batch_size]
        return out

    # dense tower features, column-major: each row is one contiguous copy;
    # width-k vector feeds [B, k] contribute k rows (dense_rows plan)
    dense = np.zeros((compiled.n_dense, bp), dtype=np.float32)
    _f32_feeds: Dict[str, np.ndarray] = {}
    for i, (f, j) in enumerate(compiled.dense_rows):
        a = _f32_feeds.get(f)
        if a is None:
            a = np.asarray(batch[f], dtype=np.float32)
            _f32_feeds[f] = a
        dense[i, :batch_size] = (a if j is None else a[:, j])[:batch_size]

    memo: Dict = {} if config.dedup_subcolumns else None
    group_arrays: List[Dict[str, np.ndarray]] = []
    rowlens: List[int] = []
    for g in compiled.groups:
        arrs: Dict[str, np.ndarray] = {}
        host_members = g.members[g.n_bucketize :]

        if g.n_bucketize:
            arrs["raw_bz"] = stack_cols(
                [m.column.source.field for m in g.members[: g.n_bucketize]],
                g.n_bucketize,
            )

        if not g.ragged:
            rowlen = 1
            if host_members:
                from recom_tpu.native import ops as native_ops

                ids = np.full((len(host_members), bp, 1), -1, dtype=np.int32)
                # partition into batched-native int/str hash columns vs the
                # generic oracle-chain path; each native class is ONE
                # foreign call for the whole class (per-column ctypes
                # crossings dominate at ~10us of C++ work per column)
                by_kind = {"int": ([], [], []), "str": ([], [], [])}
                rest = []
                for i, m in enumerate(host_members):
                    plan = fast_dense_plan(m, batch)
                    if plan is None:
                        rest.append((i, m))
                        continue
                    kind, arr, nb = plan
                    idxs, cols, bkts = by_kind[kind]
                    idxs.append(i)
                    cols.append(arr)
                    bkts.append(nb)
                for kind, (idxs, cols, bkts) in by_kind.items():
                    if not cols:
                        continue
                    multi = (
                        native_ops.hash_int_multi(cols, bkts)
                        if kind == "int"
                        else native_ops.hash_fixed_multi(cols, bkts)
                    )
                    if kind == "int" and multi is not None:
                        # TF ignore_value: -1 int input = missing entry
                        multi = np.where(
                            np.asarray(cols) == -1, np.int32(-1), multi
                        )
                    if multi is not None:
                        n = min(multi.shape[1], bp)
                        ids[np.asarray(idxs, np.int64), :n, 0] = multi[:, :n]
                    else:  # no native lib: per-column fallback
                        for i, m in zip(idxs, [host_members[j] for j in idxs]):
                            fast = fast_dense_ids(m, batch)
                            n1 = min(len(fast), bp)
                            ids[i, :n1, 0] = fast[:n1].astype(np.int32)
                for i, m in rest:
                    sp = host_ids_for_member(m, batch, memo)
                    packed, _ = _pack_sparse(
                        sp, 1, bp, config.allow_truncate_overflow,
                        cap=m.vocab_size - 1,
                    )
                    ids[i] = packed
                arrs["host_ids"] = ids
        else:
            from recom_tpu.native import ops as native_ops

            # first pass: row-length discovery.  Delimited fast-path
            # columns count in ONE native call; oracle-chain members use
            # bincount (serially — they share the memo).
            fast_idx: List[int] = []
            fast_arrs: List[np.ndarray] = []
            fast_delims: List[bytes] = []
            fast_buckets: List[int] = []
            slow: List[Tuple[int, SparseFeature]] = []
            max_len = 1
            for i, m in enumerate(host_members):
                fp = fast_ragged_plan(m, batch)
                if fp is not None:
                    arr, delim, nb = fp
                    fast_idx.append(i)
                    fast_arrs.append(np.ascontiguousarray(arr))
                    fast_delims.append(delim.encode())
                    fast_buckets.append(nb)
                else:
                    sp = host_ids_for_member(m, batch, memo)
                    if sp.values is not None and len(sp.row_ids):
                        c = np.bincount(sp.row_ids, minlength=sp.batch).max()
                        max_len = max(max_len, int(c))
                    slow.append((i, m, sp))
            rowlen = None
            multi = None
            hint = rowlen_hints.get(g.gid) if rowlen_hints else None
            if fast_arrs and hint is not None:
                # optimistic pass at the cached bucket — right in steady
                # state, so the counting scan disappears from the hot path
                res = native_ops.split_hash_multi(
                    fast_arrs, fast_delims, fast_buckets, hint
                )
                if res is not None:
                    cand, maxp = res
                    full_max = max(max_len, maxp)
                    if (
                        pick_bucket(
                            config.rowlen_buckets, full_max,
                            config.allow_truncate_overflow,
                        )
                        == hint
                    ):
                        rowlen, multi = hint, cand
            if rowlen is None:
                if fast_arrs:
                    cnt = native_ops.split_count_multi(fast_arrs, fast_delims)
                    if cnt is None:
                        cnt = max(
                            native_ops.split_count_max(a, d.decode())
                            for a, d in zip(fast_arrs, fast_delims)
                        )
                    max_len = max(max_len, int(cnt))
                rowlen = pick_bucket(
                    config.rowlen_buckets, max_len,
                    config.allow_truncate_overflow,
                )
            ids = np.full((len(host_members), bp, rowlen), -1, dtype=np.int32)
            weights = (
                np.zeros((len(host_members), bp, rowlen), dtype=np.float32)
                if g.has_weights
                else None
            )
            if fast_arrs and multi is None:
                res = native_ops.split_hash_multi(
                    fast_arrs, fast_delims, fast_buckets, rowlen
                )
                multi = res[0] if res is not None else None
                if multi is None:  # no native lib: per-column fallback
                    for i, arr, d, nb in zip(
                        fast_idx, fast_arrs, fast_delims, fast_buckets
                    ):
                        packed, _ = native_ops.split_hash_padded(
                            arr, d.decode(), nb, rowlen
                        )
                        n1 = min(packed.shape[0], bp)
                        ids[i, :n1, :] = packed[:n1]
            if multi is not None:
                n = min(multi.shape[1], bp)
                ids[np.asarray(fast_idx, np.int64), :n, :] = multi[:, :n]
            slow_w = {}
            for i, m, sp in slow:
                packed, w = _pack_sparse(
                    sp, rowlen, bp, config.allow_truncate_overflow,
                    cap=m.vocab_size - 1,
                )
                ids[i] = packed
                slow_w[i] = w
            if weights is not None:
                for i in range(len(host_members)):
                    w = slow_w.get(i)
                    weights[i] = w if w is not None else (ids[i] >= 0)
                for i, m in enumerate(host_members):
                    if m.combiner == Combiner.SOFTMAX:
                        # scores -> rowwise masked softmax ON HOST; the
                        # device then pools this member as a weighted SUM
                        weights[i] = softmax_scores(ids[i], weights[i])
            arrs["host_ids"] = ids
            if weights is not None:
                arrs["weights"] = weights
        rowlens.append(rowlen)
        group_arrays.append(arrs)

    arrays = {"dense": dense, "groups": group_arrays}
    return PreparedBatch(batch_size, bp, tuple(rowlens), arrays)

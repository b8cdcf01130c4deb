"""Host-side preprocessing: raw features -> packed device arrays.

The analogue of the reference's CPU-pinned FC prefixes + ConcatInputs
single-blob H2D staging (concat_inputs_ops.cc:42-77): strings are hashed and
ragged features packed on host, then everything crosses to the device as a
few large dense arrays:

  * dense tower features          [Bp, n_dense]  f32
  * per non-ragged group:  raw bucketize floats [Bp, n_bz] f32
                           host-computed ids    [Bp, C_host, 1] int32
  * per ragged group:      padded ids           [Bp, C, L] int32 (-1 = pad)
                           weights (optional)   [Bp, C, L] f32

Semantics of the host transform chains are shared with the NumPy oracle
(oracle/reference.py) — one implementation of truth; the C++ fast path in
recom_tpu/native replaces only the hash inner loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from recom_tpu.compiler.buckets import pick_bucket
from recom_tpu.compiler.lowering import CompiledModel, LookupGroup
from recom_tpu.ir import spec as spec_mod
from recom_tpu.oracle.reference import (
    SparseFeature,
    apply_transform,
    materialize_source,
)


def _map_columns(fn, items):
    """Per-column host work runs SERIALLY by design: measured on model E
    (100 hash + 20 split columns, batch 512), a thread pool is a net loss
    (6.5ms vs 5.3ms p50) — each column is ~20-50us of mostly-GIL numpy
    around a short native call, so pool dispatch overhead dominates.
    Cross-REQUEST parallelism is the productive axis (ServingPipeline)."""
    return [fn(x) for x in items]


def _pack_sparse(
    sp: SparseFeature, rowlen: int, batch_padded: int
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(values, row_ids[, weights]) -> ids [Bp, L] int32 (-1 pad) and
    weights [Bp, L] f32 (0 pad) or None.  Preserves in-row entry order."""
    ids = np.full((batch_padded, rowlen), -1, dtype=np.int32)
    values = np.asarray(sp.values, dtype=np.int64)
    row_ids = sp.row_ids
    if values.size:
        counts = np.bincount(row_ids, minlength=sp.batch)
        if counts.max() > rowlen:
            raise ValueError(
                f"row length {int(counts.max())} exceeds bucket {rowlen}"
            )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(row_ids.shape[0]) - starts[row_ids]
        ids[row_ids, pos] = values.astype(np.int32)
    weights = None
    if sp.weights is not None:
        weights = np.zeros((batch_padded, rowlen), dtype=np.float32)
        if values.size:
            weights[row_ids, pos] = sp.weights
    return ids, weights


def _is_string_array(data) -> bool:
    if isinstance(data, np.ndarray):
        return data.dtype.kind in ("S", "U")
    return bool(len(data)) and isinstance(data[0], (str, bytes, np.str_, np.bytes_))


def fast_dense_ids(member, batch: Dict) -> Optional[np.ndarray]:
    """Native-path final ids [B] for a non-ragged member, or None.

    Covers the dominant host chains: STRING->HashBucket and
    DENSE_INT->HashBucket (reference model E: 100 such columns)."""
    from recom_tpu.native import ops as native_ops

    col = member.column
    if member.host_chain and len(member.host_chain) == 1 and isinstance(
        member.host_chain[0], spec_mod.HashBucket
    ):
        hb = member.host_chain[0]
        data = batch[col.source.field]
        if col.source.kind == spec_mod.FeatureKind.STRING and _is_string_array(data):
            return native_ops.hash_strings(np.asarray(data), hb.num_buckets)
        if col.source.kind == spec_mod.FeatureKind.DENSE_INT:
            return native_ops.hash_ints(np.asarray(data), hb.num_buckets)
    return None


def fast_ragged_plan(member, batch: Dict):
    """(values_S_array, delimiter, num_buckets) for the native split+hash
    path, or None.  Applies to delimited STRING_LIST -> HashBucket chains
    whose wire input is an array of joined strings."""
    col = member.column
    if (
        col.source.kind == spec_mod.FeatureKind.STRING_LIST
        and col.source.delimiter is not None
        and len(member.host_chain) == 1
        and isinstance(member.host_chain[0], spec_mod.HashBucket)
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

    def __init__(self, batch_size, batch_padded, rowlens, arrays):
        self.batch_size = batch_size
        self.batch_padded = batch_padded
        self.rowlens = rowlens          # tuple, one per group (1 if dense)
        self.arrays = arrays            # pytree fed to the jitted function

    @property
    def signature(self) -> Tuple[int, Tuple[int, ...]]:
        return (self.batch_padded, self.rowlens)


def prepare_batch(
    compiled: CompiledModel,
    batch: Dict,
    batch_size: Optional[int] = None,
) -> PreparedBatch:
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

    # dense tower features (single stacked copy, not per-column writes)
    dense = np.zeros((bp, compiled.n_dense), dtype=np.float32)
    if compiled.n_dense:
        dense[:batch_size] = np.stack(
            [np.asarray(batch[c.source.field], dtype=np.float32)
             for c in model.dense_columns],
            axis=1,
        )

    memo: Dict = {} if config.dedup_subcolumns else None
    group_arrays: List[Dict[str, np.ndarray]] = []
    rowlens: List[int] = []
    for g in compiled.groups:
        arrs: Dict[str, np.ndarray] = {}
        host_members = g.members[g.n_bucketize :]

        if g.n_bucketize:
            raw = np.zeros((bp, g.n_bucketize), dtype=np.float32)
            raw[:batch_size] = np.stack(
                [np.asarray(batch[m.column.source.field], dtype=np.float32)
                 for m in g.members[: g.n_bucketize]],
                axis=1,
            )
            arrs["raw_bz"] = raw

        if not g.ragged:
            rowlen = 1
            if host_members:
                ids = np.full((bp, len(host_members), 1), -1, dtype=np.int32)
                # fast native paths run threaded (ctypes releases the GIL);
                # memoized oracle-chain members run serially (shared memo)
                fasts = _map_columns(
                    lambda m: fast_dense_ids(m, batch), host_members
                )
                for i, (m, fast) in enumerate(zip(host_members, fasts)):
                    if fast is not None:
                        ids[: len(fast), i, 0] = fast.astype(np.int32)
                        continue
                    sp = host_ids_for_member(m, batch, memo)
                    packed, _ = _pack_sparse(sp, 1, bp)
                    ids[:, i, :] = packed
                arrs["host_ids"] = ids
        else:
            from recom_tpu.native import ops as native_ops

            # first pass: row-length discovery (native count for delimited
            # columns — threaded, read-only; oracle chain + bincount
            # members serially: they share the memo)
            def plan_one(m):
                fp = fast_ragged_plan(m, batch)
                if fp is not None:
                    arr, delim, _nb = fp
                    return ("fast", fp, native_ops.split_count_max(arr, delim))
                return None

            pre = _map_columns(plan_one, host_members)
            plans = []
            max_len = 1
            for m, p in zip(host_members, pre):
                if p is not None:
                    plans.append((p[0], p[1]))
                    max_len = max(max_len, p[2])
                else:
                    sp = host_ids_for_member(m, batch, memo)
                    if sp.values is not None and len(sp.row_ids):
                        c = np.bincount(sp.row_ids, minlength=sp.batch).max()
                        max_len = max(max_len, int(c))
                    plans.append(("slow", sp))
            rowlen = pick_bucket(
                config.rowlen_buckets, max_len, config.allow_truncate_overflow
            )
            ids = np.full((bp, len(host_members), rowlen), -1, dtype=np.int32)
            weights = (
                np.zeros((bp, len(host_members), rowlen), dtype=np.float32)
                if g.has_weights
                else None
            )

            def fill_one(item):
                # each call writes a distinct ids[:, i, :] slice — safe
                i, (tag, payload) = item
                if tag == "fast":
                    arr, delim, nb = payload
                    packed, _ = native_ops.split_hash_padded(
                        arr, delim, nb, rowlen
                    )
                    ids[: packed.shape[0], i, :] = packed
                    return None
                packed, w = _pack_sparse(payload, rowlen, bp)
                ids[:, i, :] = packed
                return w

            ws = _map_columns(fill_one, enumerate(plans))
            if weights is not None:
                for i, w in enumerate(ws):
                    weights[:, i, :] = (
                        w if w is not None else (ids[:, i, :] >= 0)
                    )
            arrs["host_ids"] = ids
            if weights is not None:
                arrs["weights"] = weights
        rowlens.append(rowlen)
        group_arrays.append(arrs)

    arrays = {"dense": dense, "groups": group_arrays}
    return PreparedBatch(batch_size, bp, tuple(rowlens), arrays)

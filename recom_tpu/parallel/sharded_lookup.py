"""Row-sharded embedding lookup over a device mesh.

The communication spine that replaces the reference's ConcatInputs H2D blob
(SURVEY.md section 2.7: the reference's only data movement is one
cudaMemcpy; scaling past one chip's HBM requires sharding tables).  Tables
whose stacked rows exceed ``EngineConfig.shard_rows_above`` are row-sharded
over the mesh's "model" axis; the lookup runs as:

    ids (replicated over model, sharded over data)
      -> each shard gathers the rows IT owns, masks the rest to zero
      -> partial pooled sums
      -> psum over the model axis (rides ICI)

Static shapes throughout (no dynamic all-to-all send sizes — the masked
-psum formulation is the XLA-friendly equivalent of the NCCL all-to-all id
exchange; ids are tiny relative to embeddings, so replicating them over the
model axis costs less than an id exchange would).

Determinism note: the cross-shard psum adds partial sums in ring order,
which is deterministic run-to-run but MAY differ in final float32 ulps from
the single-device left-to-right accumulation when a row's entries live on
different shards.  Single-device execution remains bit-exact with the
oracle; sharded execution is validated to 1e-6 and for exact equality
whenever each row's ids land on one shard.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recom_tpu.ops import lookup_xla


def pad_rows_to_multiple(table: np.ndarray, multiple: int) -> np.ndarray:
    """Pad stacked table rows so they divide evenly across shards (pad rows
    are never addressed: ids always target real rows)."""
    r = table.shape[0]
    pad = (-r) % multiple
    if pad == 0:
        return table
    return np.concatenate(
        [table, np.zeros((pad,) + table.shape[1:], table.dtype)], axis=0
    )


def stripe_rows(table: np.ndarray, m: int) -> np.ndarray:
    """Logical -> striped physical layout: logical row r lives on shard
    r % m at local index r // m (physical[(r % m) * (R/m) + r // m] =
    logical[r]).  Striping load-balances a stacked group whose members have
    very different vocab sizes — with contiguous blocks, a small table's
    rows land entirely on one shard and every batch's ids for that column
    hammer it (the skew that overflows all-to-all capacity and serializes
    the psum path's gathers).  Works on [R, ...] arrays (row vectors and
    per-row scale vectors alike)."""
    r = table.shape[0]
    rest = table.shape[1:]
    assert r % m == 0
    return np.moveaxis(
        table.reshape((r // m, m) + rest), 1, 0
    ).reshape((r,) + rest)


def unstripe_rows(table: np.ndarray, m: int) -> np.ndarray:
    """Inverse of stripe_rows (physical -> logical), for checkpoint export."""
    r = table.shape[0]
    rest = table.shape[1:]
    assert r % m == 0
    return np.moveaxis(
        table.reshape((m, r // m) + rest), 0, 1
    ).reshape((r,) + rest)


def sharded_group_pooled(
    mesh: Mesh,
    table: jnp.ndarray,          # [R_padded, d], R_padded % model_size == 0
    ids: jnp.ndarray,            # [B, C, L] int32, -1 = pad (global batch)
    row_offsets: np.ndarray,     # [C] static
    combiner_code: np.ndarray,   # [C] static
    weights: Optional[jnp.ndarray] = None,
    exact_math: bool = True,
    weighted_cols=None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jnp.ndarray:
    """group_pooled with the table row-sharded over ``model_axis`` (STRIPED
    layout — build the device array with stripe_rows) and the batch sharded
    over ``data_axis``.  Returns [B, C, d] sharded on batch."""
    from recom_tpu.ops.lookup_xla import table_num_rows
    from recom_tpu.ops.quant import QuantizedTable

    row_offsets = np.asarray(row_offsets)
    combiner_code = np.asarray(combiner_code)
    m = mesh.shape[model_axis]
    r_padded = table_num_rows(table)
    assert r_padded % m == 0, "pad table with pad_rows_to_multiple first"
    shard_rows = r_padded // m
    table_spec = (
        QuantizedTable(P(model_axis, None), P(model_axis))
        if isinstance(table, QuantizedTable)
        else P(model_axis, None)
    )

    def local_fn(tbl_local, ids_local, w_local):
        # tbl_local: [shard_rows, d] (striped: holds logical rows
        # {r : r % m == k}); ids_local: [b_local, C, L]
        k = jax.lax.axis_index(model_axis)
        valid = ids_local >= 0
        gids = jnp.where(valid, ids_local, 0) + jnp.asarray(row_offsets)[None, :, None]
        lids = gids // m
        mine = valid & ((gids % m) == k)
        # reuse the single-device kernel on the local shard: ids out of my
        # range become -1 (masked), so partial sums cover only my rows.
        local_ids = jnp.where(mine, lids, -1).astype(jnp.int32)
        # partial sums only (divide AFTER the psum): force sum combiner
        partial = lookup_xla.group_pooled(
            tbl_local,
            local_ids,
            np.zeros_like(row_offsets),
            np.zeros_like(combiner_code),   # all-sum
            w_local,
            exact_math=exact_math,
        )                                                # [b_local, C, d]
        total = jax.lax.psum(partial, model_axis)

        # divisors from the (model-replicated) ids — no comm needed; the
        # exactness-critical divisor math lives in ONE place
        # (lookup_xla.apply_combiner_divisors, shared with every path)
        wfull = (
            valid.astype(jnp.float32)
            if w_local is None
            else w_local * valid
        )
        wsum = wfull.sum(axis=2)
        w2sum = (wfull * wfull).sum(axis=2)
        return lookup_xla.apply_combiner_divisors(
            total, wsum, w2sum, combiner_code, exact_math,
            weighted=(
                (w_local is not None)
                if weighted_cols is None
                else weighted_cols
            ),
        )

    if weights is not None:
        fn = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(
                table_spec,
                P(data_axis, None, None),
                P(data_axis, None, None),
            ),
            out_specs=P(data_axis, None, None),
        )
        return fn(table, ids, weights)
    fn = jax.shard_map(
        lambda t, i: local_fn(t, i, None),
        mesh=mesh,
        in_specs=(table_spec, P(data_axis, None, None)),
        out_specs=P(data_axis, None, None),
    )
    return fn(table, ids)

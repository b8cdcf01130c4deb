"""All-to-all ID-exchange sharded embedding lookup.

The second comm strategy for row-sharded tables (the first, masked-gather +
psum, lives in sharded_lookup.py).  This one is the TPU restatement of the
classic distributed-DLRM exchange the reference never had (SURVEY.md §2.7:
"all-to-all ID exchange + embedding return over ICI"), built entirely from
static shapes so XLA can compile it once per bucket:

  each (data, model) device takes its 1/m slice of the local batch's ids
    -> routes each id to the model-shard that owns the row
       (fixed-capacity per-destination buckets; deterministic stable order)
    -> lax.all_to_all over the model axis: ids out          [tiny]
    -> owner shards gather their rows locally                [N/m gathers/dev]
    -> lax.all_to_all back: embedding rows return            [the payload]
    -> inverse permutation restores [b, C, L, d] entry order
    -> in-order pooling (bit-exact with the single-device path)
    -> all_gather over model rebuilds the data-shard's batch

vs the psum path: each device gathers only its 1/m of the ids (instead of
all ids masked), and pooling happens in original entry order, so this path
is BIT-EXACT with the oracle even when a row's ids span shards.  The psum
path remains preferable for very long ragged rows (it pools before it
communicates: [b,C,d] moved instead of [b,C,L,d] row payloads).

Capacity: per-destination bucket capacity is static.  With hashed ids the
destination distribution is near-uniform, so capacity = ceil(N/m) * factor
(default 2.0) virtually never overflows; overflowing ids are DROPPED (their
rows pool as zeros) and the overflow count is returned so the caller can
log, fall back to the psum path, or raise (Engine checks it on the first
call of each shape bucket).  This is the fixed-capacity-with-overflow-
fallback design SURVEY.md §7 prescribes in place of dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recom_tpu.ops import lookup_xla


def a2a_capacity(n_ids: int, m: int, factor: float = 2.0) -> int:
    """Static per-destination bucket capacity, padded to a multiple of 8
    (sublane alignment).  factor >= m gives a provably-lossless capacity."""
    cap = int(np.ceil(n_ids / m * factor))
    cap = min(cap, n_ids)            # never more than every id to one dest
    return max(8, ((cap + 7) // 8) * 8)


def all_to_all_group_pooled(
    mesh: Mesh,
    table: jnp.ndarray,          # [R_pad, d], R_pad % m == 0, P(model, None)
    ids: jnp.ndarray,            # [B, C, L] int32 global batch, -1 = pad
    row_offsets: np.ndarray,     # [C] static
    combiner_code: np.ndarray,   # [C] static
    weights: Optional[jnp.ndarray] = None,
    exact_math: bool = True,
    capacity_factor: float = 2.0,
    dedup: bool = True,
    weighted_cols=None,
    data_axis: str = "data",
    model_axis: str = "model",
    chunks: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pooled [B, C, d] sharded over data, global overflow count).

    ``table`` must be in the STRIPED physical layout (sharded_lookup
    .stripe_rows): logical row r on shard r % m.  Requires
    (B / data_axis_size) % model_axis_size == 0 — the local batch is sliced
    evenly across model shards for routing.

    ``chunks`` > 1 splits the row-RETURN exchange (the payload — the id
    exchange is tiny) along the capacity axis into that many independent
    all_to_all calls, and restores/accumulates each chunk's rows as soon
    as it lands: the scatter-gather of chunk k is data-independent of the
    exchange of chunk k+1, so XLA's scheduler can hide all but one
    chunk's ICI latency behind compute (SURVEY §7 hard part 3; the
    monolithic exchange serialized comm before any restoration could
    start).  Every chunking is bit-exact: each entry's row comes from
    exactly one chunk and the others contribute fill-zeros."""
    from recom_tpu.ops.lookup_xla import table_dim, table_num_rows
    from recom_tpu.ops.quant import QuantizedTable

    row_offsets = np.asarray(row_offsets)
    combiner_code = np.asarray(combiner_code)
    m = mesh.shape[model_axis]
    dsize = mesh.shape[data_axis]
    r_padded, d = table_num_rows(table), table_dim(table)
    assert r_padded % m == 0, "pad table with pad_rows_to_multiple first"
    shard_rows = r_padded // m
    table_spec = (
        QuantizedTable(P(model_axis, None), P(model_axis))
        if isinstance(table, QuantizedTable)
        else P(model_axis, None)
    )
    b, c, l = ids.shape
    b_loc = b // dsize
    assert b_loc % m == 0, (
        f"local batch {b_loc} not divisible by model axis {m}"
    )
    b_my = b_loc // m
    n = b_my * c * l
    cap = a2a_capacity(n, m, capacity_factor)
    # chunking must never change the capacity (capacity is part of the
    # overflow contract): use the largest feasible chunk count <= the
    # request that divides cap evenly (cap is a multiple of 8, so 2
    # always fits once cap >= 16)
    chunks = max(1, int(chunks))
    while chunks > 1 and cap % chunks:
        chunks -= 1
    capc = cap // chunks

    def local_fn(tbl_local, ids_local, w_local):
        k = jax.lax.axis_index(model_axis)
        # my slice of this data-shard's batch rows
        my = jax.lax.dynamic_slice_in_dim(ids_local, k * b_my, b_my, axis=0)
        valid = my >= 0
        gids = jnp.where(valid, my, 0) + jnp.asarray(row_offsets)[None, :, None]
        flat = gids.reshape(n)
        fvalid = valid.reshape(n)
        # striped layout: logical row r -> shard r % m, local index r // m
        owner = (flat % m).astype(jnp.int32)
        local_row = (flat // m).astype(jnp.int32)
        # owner-major sort key: a bijection of the row id whose sorted
        # order groups by owner AND places duplicate ids adjacently — one
        # sort serves routing and dedup.  Invalid (pad) slots sort past
        # every real bucket (sentinel) so they consume no capacity.
        sentinel = jnp.int32(m * shard_rows)
        okey = jnp.where(
            fvalid, owner * shard_rows + local_row, sentinel
        ).astype(jnp.int32)

        order = jnp.argsort(okey, stable=True)
        sk = okey[order]
        real = sk < sentinel
        if dedup:
            # the reference's Unique+Gather idiom (lookup_optimizer.cc:
            # 89-99): each distinct id is exchanged and gathered ONCE;
            # duplicates restore from the representative's returned row.
            is_first = real & jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]]
            )
        else:
            is_first = real
        # representative (unique-run) index for every sorted position
        seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1     # [n]
        so = jnp.where(real, sk // shard_rows, m).astype(jnp.int32)
        # uniques are owner-grouped (owner-major key), so rank within the
        # owner bucket = global unique index - owner's first unique index
        uidx = seg
        counts = (
            jnp.zeros((m + 1,), jnp.int32).at[so].add(is_first.astype(jnp.int32))
        )
        ustarts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        urank = uidx - ustarts[so]                           # [n]
        ok_u = is_first & (urank < cap)
        # overflow counts every AFFECTED entry (a dropped unique drops all
        # its duplicates) — the honest "ids lost" number
        rep_ok_by_seg = (
            jnp.zeros((n,), jnp.bool_)
            .at[jnp.where(is_first, uidx, n)]
            .set(ok_u, mode="drop")
        )
        entry_ok = real & rep_ok_by_seg[seg]
        overflow = jnp.sum(real & ~entry_ok).astype(jnp.int32)
        send_ids = (
            jnp.zeros((m, cap), jnp.int32)
            .at[so, jnp.where(ok_u, urank, cap)]
            .set(jnp.where(real, sk % shard_rows, 0), mode="drop")
        )

        # --- exchange ids; owners gather; rows return -------------------
        recv_ids = jax.lax.all_to_all(
            send_ids, model_axis, split_axis=0, concat_axis=0, tiled=True
        )                                                  # [m, cap]
        rows = lookup_xla.gather_rows_f32(
            tbl_local, recv_ids.reshape(-1)
        ).reshape(m, cap, d)

        # --- restore original entry order through representatives -------
        # per-unique slot (owner*cap + rank), indexed by unique id
        slot_by_seg = (
            jnp.full((n,), m * cap, jnp.int32)
            .at[jnp.where(is_first, uidx, n)]
            .set(
                jnp.where(ok_u, so * cap + urank, m * cap), mode="drop"
            )
        )
        lin_sorted = jnp.where(entry_ok, slot_by_seg[seg], m * cap)
        lin = jnp.zeros((n,), jnp.int32).at[order].set(lin_sorted)
        if chunks == 1:
            rows_back = jax.lax.all_to_all(
                rows, model_axis,
                split_axis=0, concat_axis=0, tiled=True,
            )                                              # [m, cap, d]
            rows_full = jnp.take(
                rows_back.reshape(m * cap, d), lin, axis=0,
                mode="fill", fill_value=0.0,
            )                                              # [n, d]
        else:
            # pipelined return: exchange capacity-slice k while the
            # restoration gather of slice k-1 runs.  Entry -> chunk map:
            # slot so*cap + r lives in chunk r // capc at local linear
            # index so*capc + (r - k*capc).  Entries outside chunk k (or
            # overflowed: sentinel m*cap) gather fill-zeros, so the sum
            # over chunks reassembles rows_full exactly.
            so_lin = lin // cap                            # sentinel -> m
            r_lin = lin % cap
            rows_full = jnp.zeros((n, d), rows.dtype)
            for ck in range(chunks):
                back_k = jax.lax.all_to_all(
                    jax.lax.slice_in_dim(
                        rows, ck * capc, (ck + 1) * capc, axis=1
                    ),
                    model_axis, split_axis=0, concat_axis=0, tiled=True,
                )                                          # [m, capc, d]
                in_k = (
                    (lin < m * cap)
                    & (r_lin >= ck * capc)
                    & (r_lin < (ck + 1) * capc)
                )
                lin_k = jnp.where(
                    in_k, so_lin * capc + (r_lin - ck * capc), m * capc
                )
                rows_full = rows_full + jnp.take(
                    back_k.reshape(m * capc, d), lin_k, axis=0,
                    mode="fill", fill_value=0.0,
                )
        rows4 = rows_full.reshape(b_my, c, l, d)

        if w_local is None:
            w_my = valid.astype(jnp.float32)
        else:
            w_slice = jax.lax.dynamic_slice_in_dim(
                w_local, k * b_my, b_my, axis=0
            )
            w_my = w_slice * valid
        pooled_my = lookup_xla.pool_rows_inorder(
            rows4, w_my, combiner_code, exact_math,
            weighted=(
                (w_local is not None)
                if weighted_cols is None
                else weighted_cols
            ),
        )                                                  # [b_my, C, d]
        # output batch sharded over (data, model): model shard k holds rows
        # [k*b_my, (k+1)*b_my) of its data shard's local batch — exactly the
        # P((data, model)) block order.  GSPMD re-shards for consumers
        # (an all-gather over model it can overlap with downstream compute).
        return pooled_my, jax.lax.psum(
            jax.lax.psum(overflow, model_axis), data_axis
        )

    out_specs = (P((data_axis, model_axis), None, None), P())
    in_specs = [table_spec, P(data_axis, None, None)]
    args = [table, ids]
    if weights is not None:
        in_specs.append(P(data_axis, None, None))
        args.append(weights)
        fn = jax.shard_map(
            local_fn, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=out_specs,
        )
    else:
        fn = jax.shard_map(
            lambda t, i: local_fn(t, i, None), mesh=mesh,
            in_specs=tuple(in_specs), out_specs=out_specs,
        )
    return fn(*args)

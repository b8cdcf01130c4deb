"""Pure-XLA lookup ops: the reference path every optimized kernel is checked
against, and the fallback for configurations the Pallas megakernel does not
cover (the analogue of the reference's CPU fallback for un-emittable columns,
cuda_emitter.cc:192-211 — except our fallback still runs on the TPU).

Bit-exactness contract (vs the NumPy oracle): pooling accumulates float32 in
in-row entry order, empty rows produce zeros, ids < 0 are masked out.
Combiner divisors are applied once, after the sum, as IEEE float32 divisions.
TPU hardware divides/square-roots via reciprocal approximation (NOT correctly
rounded), so exact mode routes the divisor math through emulated float64 —
measured bit-identical to IEEE float32 division on TPU, at negligible cost
for [B, C]-sized divisor arrays.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def device_bucketize(
    x: jnp.ndarray, boundaries: jnp.ndarray, counts: jnp.ndarray
) -> jnp.ndarray:
    """TF Bucketize over a batched column group.

    x: [B, C] raw floats; boundaries: [C, K] padded with +inf; counts: [C]
    true boundary counts.  id = #boundaries <= x (upper_bound); NaN maps to
    count (matches std::upper_bound / np.searchsorted ordering of NaN)."""
    kmax = boundaries.shape[1]
    less = (x[:, :, None] < boundaries[None, :, :]).sum(
        axis=-1, dtype=jnp.int32
    )
    ids = kmax - less
    # NaN: all comparisons false -> less == 0 -> ids == kmax; clip to count.
    return jnp.clip(ids, 0, counts[None, :])


def exact_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """float32 division with IEEE correct rounding on TPU (via emulated f64;
    requires jax_enable_x64 — the Engine turns it on)."""
    a64 = a.astype(jnp.float64)
    if a64.dtype != jnp.float64:
        raise RuntimeError(
            "exact_div needs jax_enable_x64 (Engine enables it; set "
            "EngineConfig.exact_combiner_math=False to use hardware division)"
        )
    return (a64 / b.astype(jnp.float64)).astype(jnp.float32)


def exact_sqrt(a: jnp.ndarray) -> jnp.ndarray:
    a64 = a.astype(jnp.float64)
    if a64.dtype != jnp.float64:
        raise RuntimeError("exact_sqrt needs jax_enable_x64")
    return jnp.sqrt(a64).astype(jnp.float32)


def gather_rows_f32(table, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather table rows at ``idx`` and return float32.

    ``table`` is a [R, d] array in any float dtype (bf16 rows upcast AFTER
    the gather so HBM traffic stays at the stored width) or a
    quant.QuantizedTable (int8 + per-row scale, dequantized post-gather)."""
    from recom_tpu.ops.quant import QuantizedTable, dequantize_rows

    if isinstance(table, QuantizedTable):
        q_rows = jnp.take(table.q, idx, axis=0)
        scales = jnp.take(table.scale, idx, axis=0)
        return dequantize_rows(q_rows, scales)
    rows = jnp.take(table, idx, axis=0)
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    return rows


def table_num_rows(table) -> int:
    from recom_tpu.ops.quant import QuantizedTable

    return table.q.shape[0] if isinstance(table, QuantizedTable) else table.shape[0]


def table_dim(table) -> int:
    from recom_tpu.ops.quant import QuantizedTable

    return table.q.shape[1] if isinstance(table, QuantizedTable) else table.shape[1]


def apply_combiner_divisors(
    acc: jnp.ndarray,            # [B, C, d] in-order sums
    wsum: jnp.ndarray,           # [B, C] sum of weights
    w2sum: jnp.ndarray,          # [B, C] sum of squared weights
    combiner_code: np.ndarray,   # [C] STATIC
    exact_math: bool = True,
    weighted: bool = False,
) -> jnp.ndarray:
    """Apply the combiner denominator (mean: wsum, sqrtn: sqrt(w2sum));
    empty rows (denominator 0) become zeros — the observable behavior of
    the reference's SparseFillEmptyRows + Select patch-up idiom
    (lookup_optimizer.cc:108-134).

    ``weighted`` selects the TF ROUNDING convention (validated against
    installed TF 2.21): the unweighted SparseSegmentMean/SqrtN kernels
    compute ``sum * (1 / denom)`` (reciprocal rounded to f32, then a
    correctly-rounded multiply), while the weighted embedding_lookup_sparse
    path divides.  The two differ by 1 ulp on ~10% of values."""
    combiner_code = np.asarray(combiner_code)
    need_mean = bool((combiner_code == 1).any())
    need_sqrtn = bool((combiner_code == 2).any())
    if not (need_mean or need_sqrtn):
        return acc
    div = exact_div if exact_math else (lambda a, b_: a / b_)
    sqrt = exact_sqrt if exact_math else jnp.sqrt
    code = jnp.asarray(combiner_code)[None, :]
    if need_sqrtn:
        sq = sqrt(w2sum)
        denom = jnp.where(code == 1, wsum, jnp.where(code == 2, sq, 1.0))
    else:
        denom = jnp.where(code == 1, wsum, 1.0)
    nonzero = denom > 0
    safe_denom = jnp.where(nonzero, denom, 1.0)
    # ``weighted`` may be a scalar or a per-COLUMN bool vector (a stacked
    # group can mix weighted and unweighted columns; each follows its own
    # TF kernel's rounding)
    wmask = (
        np.full(combiner_code.shape, bool(weighted))
        if isinstance(weighted, (bool, np.bool_))
        else np.asarray(weighted, bool)
    )
    if wmask.all():
        out = div(acc, safe_denom[:, :, None])
    elif not wmask.any():
        recip = div(jnp.ones_like(safe_denom), safe_denom)
        out = acc * recip[:, :, None]
    else:
        recip = div(jnp.ones_like(safe_denom), safe_denom)
        out = jnp.where(
            jnp.asarray(wmask)[None, :, None],
            div(acc, safe_denom[:, :, None]),
            acc * recip[:, :, None],
        )
    return jnp.where(nonzero[:, :, None], out, 0.0)


def pool_rows_inorder(
    rows: jnp.ndarray,           # [B, C, L, d] gathered rows (any value at
                                 # masked slots — w must be 0 there)
    w: jnp.ndarray,              # [B, C, L] f32 weights, 0 at pads
    combiner_code: np.ndarray,   # [C] STATIC
    exact_math: bool = True,
    weighted: bool = False,
) -> jnp.ndarray:
    """Pool already-gathered rows left-to-right in float32 — the shared
    in-order accumulation core of every lookup path (single-device gather,
    all-to-all exchange).  Bit-exact with the NumPy oracle: the optimization
    barrier stops XLA from FMA-contracting the multiply into the scan add
    (single rounding != the oracle's separately-rounded mul-then-add)."""
    combiner_code = np.asarray(combiner_code)
    b, c, l, d = rows.shape
    need_sqrtn = bool((combiner_code == 2).any())
    if l == 1:
        acc = rows[:, :, 0] * w[:, :, 0][:, :, None]
        wsum = w[:, :, 0]
        w2sum = w[:, :, 0] * w[:, :, 0] if need_sqrtn else wsum
    else:
        prods = jnp.moveaxis(rows, 2, 0) * jnp.moveaxis(w, 2, 0)[..., None]
        w_l = jnp.moveaxis(w, 2, 0)
        w2 = w_l * w_l if need_sqrtn else w_l
        prods, w2 = jax.lax.optimization_barrier((prods, w2))

        def add_step(carry, xs):
            acc, wsum, w2sum = carry
            p, wl, w2l = xs
            return (acc + p, wsum + wl, w2sum + w2l), None

        init = (prods[0] * 0.0, w_l[0] * 0.0, w2[0] * 0.0)
        (acc, wsum, w2sum), _ = jax.lax.scan(add_step, init, (prods, w_l, w2))
    return apply_combiner_divisors(
        acc, wsum, w2sum, combiner_code, exact_math, weighted
    )


def group_pooled(
    table: jnp.ndarray,          # [R, d] stacked group table, f32
    ids: jnp.ndarray,            # [B, C, L] int32, -1 = missing/pad
    row_offsets: np.ndarray,     # [C] int32, STATIC (baked into the program)
    combiner_code: np.ndarray,   # [C] int32: 0 sum / 1 mean / 2 sqrtn, STATIC
    weights: Optional[jnp.ndarray] = None,  # [B, C, L] f32 (0 at pads)
    exact_math: bool = True,
    weighted_cols=None,          # scalar or [C] bool: per-column rounding
) -> jnp.ndarray:
    """Masked, in-order segment pooling of a whole column group.

    Returns [B, C, d] float32.  This is the canonical lowered lookup form
    (the reference LookupOptimizer's {ids, segment_ids, num_segments,
    combiner} canonical form, lookup_optimizer.cc:157-268, restated for
    static shapes: segment_ids are implicit in the [B, C, L] layout)."""
    row_offsets = np.asarray(row_offsets)
    combiner_code = np.asarray(combiner_code)
    b, c, l = ids.shape
    mask = ids >= 0
    weighted = (
        (weights is not None) if weighted_cols is None else weighted_cols
    )
    w = mask.astype(jnp.float32) if weights is None else weights * mask
    safe_ids = jnp.where(mask, ids, 0) + jnp.asarray(row_offsets)[None, :, None]

    need_mean = bool((combiner_code == 1).any())
    need_sqrtn = bool((combiner_code == 2).any())

    if l == 1:
        emb = gather_rows_f32(table, safe_ids[:, :, 0])       # [B, C, d]
        acc = emb * w[:, :, 0][:, :, None]
        if not (need_mean or need_sqrtn):
            return acc
        wsum = w[:, :, 0]
        w2sum = w[:, :, 0] * w[:, :, 0] if need_sqrtn else wsum
        return apply_combiner_divisors(
            acc, wsum, w2sum, combiner_code, exact_math, weighted
        )
    # Ragged path: ONE flat gather (a scan of small per-l gathers is
    # latency-bound and far slower on TPU), then the shared in-order
    # pooling core — pool_rows_inorder owns the bit-exactness contract
    # (FMA barrier + left-to-right float32 scan) for every lookup path.
    ids_l = jnp.moveaxis(safe_ids, 2, 0)                      # [L, B, C]
    d = table_dim(table)
    rows = gather_rows_f32(table, ids_l.reshape(l, b * c))
    rows4 = jnp.moveaxis(rows.reshape(l, b, c, d), 0, 2)      # [B, C, L, d]
    return pool_rows_inorder(rows4, w, combiner_code, exact_math, weighted)

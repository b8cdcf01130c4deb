"""Pure-XLA lookup ops: the reference path every optimized kernel is checked
against, and the fallback for configurations the Pallas megakernel does not
cover (the analogue of the reference's CPU fallback for un-emittable columns,
cuda_emitter.cc:192-211 — except our fallback still runs on the TPU).

Bit-exactness contract (vs the NumPy oracle): pooling accumulates float32 in
in-row entry order (lax.scan over the L axis), empty rows produce zeros,
ids < 0 are masked out.  Combiner divisors are applied once, after the sum,
as float32 divisions — identical operation order to oracle/reference.py
pool_lookup.
"""

from __future__ import annotations

from typing import Optional

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


def group_pooled(
    table: jnp.ndarray,          # [R, d] stacked group table, f32
    ids: jnp.ndarray,            # [B, C, L] int32, -1 = missing/pad
    row_offsets: jnp.ndarray,    # [C] int32
    combiner_code: jnp.ndarray,  # [C] int32: 0 sum / 1 mean / 2 sqrtn
    weights: Optional[jnp.ndarray] = None,  # [B, C, L] f32 (0 at pads)
) -> jnp.ndarray:
    """Masked, in-order segment pooling of a whole column group.

    Returns [B, C, d] float32.  This is the canonical lowered lookup form
    (the reference LookupOptimizer's {ids, segment_ids, num_segments,
    combiner} canonical form, lookup_optimizer.cc:157-268, restated for
    static shapes: segment_ids are implicit in the [B, C, L] layout)."""
    b, c, l = ids.shape
    mask = ids >= 0
    weighted = weights is not None
    w = mask.astype(jnp.float32) if weights is None else weights * mask
    safe_ids = jnp.where(mask, ids, 0) + row_offsets[None, :, None]

    if l == 1:
        emb = jnp.take(table, safe_ids[:, :, 0], axis=0)      # [B, C, d]
        acc = emb * w[:, :, 0][:, :, None]
        wsum = w[:, :, 0]
        w2sum = w[:, :, 0] * w[:, :, 0]
    elif not weighted:
        # Unweighted hot path: fused gather+mask+accumulate scan, sequential
        # over the L axis (left-to-right, matching the oracle).  Mask
        # weights are exactly 0/1, so even FMA contraction of mul+add
        # cannot change the rounding.
        ids_l = jnp.moveaxis(safe_ids, 2, 0)                  # [L, B, C]
        w_l = jnp.moveaxis(w, 2, 0)                           # [L, B, C]

        def step(carry, xs):
            acc, wsum = carry
            idx, wl = xs
            emb = jnp.take(table, idx, axis=0)                # [B, C, d]
            acc = acc + emb * wl[:, :, None]
            wsum = wsum + wl
            return (acc, wsum), None

        init = (
            jnp.zeros((b, c, table.shape[1]), jnp.float32),
            jnp.zeros((b, c), jnp.float32),
        )
        (acc, wsum), _ = jax.lax.scan(step, init, (ids_l, w_l))
        w2sum = wsum  # 0/1 weights: sum of squares == sum
    else:
        # Weighted path: XLA contracts mul+add into an FMA (single rounding)
        # even across an optimization_barrier on the product, which breaks
        # bit-exactness with the oracle's separately-rounded multiply-then-
        # add.  Materialize all products first (vectorized, exact), barrier,
        # then an add-only sequential scan.  Costs L x the activation
        # memory, acceptable because explicit weight_field columns are rare.
        ids_l = jnp.moveaxis(safe_ids, 2, 0)                  # [L, B, C]
        w_l = jnp.moveaxis(w, 2, 0)                           # [L, B, C]
        prods = jnp.take(table, ids_l, axis=0) * w_l[..., None]
        w2 = w_l * w_l
        prods, w2 = jax.lax.optimization_barrier((prods, w2))

        def add_step(carry, xs):
            acc, wsum, w2sum = carry
            p, wl, w2l = xs
            return (acc + p, wsum + wl, w2sum + w2l), None

        init = (
            jnp.zeros((b, c, table.shape[1]), jnp.float32),
            jnp.zeros((b, c), jnp.float32),
            jnp.zeros((b, c), jnp.float32),
        )
        (acc, wsum, w2sum), _ = jax.lax.scan(
            add_step, init, (prods, w_l, w2)
        )

    code = combiner_code[None, :]
    denom = jnp.where(
        code == 1, wsum, jnp.where(code == 2, jnp.sqrt(w2sum), 1.0)
    )
    nonzero = denom > 0
    safe_denom = jnp.where(nonzero, denom, 1.0)
    return jnp.where(
        nonzero[:, :, None], acc / safe_denom[:, :, None], 0.0
    )

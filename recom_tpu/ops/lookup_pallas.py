"""Pallas megakernel: one-hot MXU lookup for uniform-vocab column groups.

The TPU-native reinterpretation of the reference's generated FusedKnl (one
CUDA thread block per column, cuda_emitter.cc:2097-2134): here one *grid
step* handles a (batch-tile x column-tile) block of the whole group, and the
"gather" is a one-hot matmul on the MXU — table rows are *streamed* through
VMEM instead of randomly addressed, so the kernel is immune to random-access
HBM inefficiency and keeps the MXU busy.

  out[c, b, :] = sum_v (ids[b, c] == v) * table[c, v, :]

accumulated over vocab tiles (the reduction grid dimension).  With
Precision.HIGHEST the selected row is added to zeros only, so results are
bit-exact with the gather path and the NumPy oracle.

Measured reality on TPU v5e (batch 512, 980 columns, dim 8): XLA's native
gather already runs at HBM speed-of-light (~0.02 ms), so this kernel is an
*alternative* backend — selected via EngineConfig.use_pallas for groups with
uniform vocab <= onehot_vocab_limit — rather than an unconditional win.  It
becomes favorable when random-access gathers degrade (very large batch x
columns with small tables that stay VMEM-resident across batch tiles).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, tbl_ref, out_ref, *, vt: int):
    vi = pl.program_id(2)

    @pl.when(vi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids_blk = ids_ref[:]                                  # [CT, B_t]
    # keep index math in int32: under jax_enable_x64 a python-int product
    # would promote to i64, which Mosaic cannot legalize
    voff = jnp.int32(vi) * jnp.int32(vt)
    local = ids_blk - voff                                # ids in this v-tile
    iota = jax.lax.broadcasted_iota(jnp.int32, local.shape + (vt,), 2)
    onehot = (local[:, :, None] == iota).astype(jnp.float32)  # [CT, B_t, VT]
    # bf16-stored tables upcast per-tile in VMEM (free next to the matmul)
    tbl = tbl_ref[:]
    if tbl.dtype != jnp.float32:
        tbl = tbl.astype(jnp.float32)
    # batched (over the column tile) one-hot matmul: [CT, B_t, d]
    part = jax.lax.dot_general(
        onehot,
        tbl,                                              # [CT, VT, d]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += part


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_div(total: int, pref: int) -> int:
    """Largest divisor of ``total`` that is <= ``pref`` — batch buckets and
    column counts are not guaranteed multiples of the preferred tile (e.g.
    EngineConfig(batch_buckets=(200,)) is legal), and a bare modulo assert
    here would surface as an unexplained trace-time AssertionError."""
    t = min(pref, total)
    while total % t:
        t -= 1
    return t


def _pick_tile(total: int, pref: int, quantum: int) -> int:
    """Largest multiple of ``quantum`` that divides ``total`` and is <=
    ``pref`` (v_pad is always a multiple of the 128-lane quantum, but not
    necessarily of the preferred 512 tile — e.g. vocab 2209 -> 2304)."""
    assert total % quantum == 0
    k = total // quantum
    for m in range(min(pref // quantum, k), 0, -1):
        if k % m == 0:
            return quantum * m
    return quantum


def _bz_kernel(raw_ref, lo_ref, hi_ref, cnt_ref, tbl_ref, out_ref, *, vt: int):
    """Fused bucketize + one-hot matmul: the TPU-native EmitInputInline
    (reference fuses Bucketize into the megakernel as a shared-memory
    binary search, cuda_emitter.cc:1858-1886).  Bucket membership IS an
    interval test — onehot[c, b, v] = lo[c, v] <= x[c, b] < hi[c, v] —
    so raw floats one-hot directly against per-vocab boundary pairs and
    the separate [B, C] id tensor never exists.  NaN maps to the last
    bucket (count), matching std::upper_bound semantics."""
    vi = pl.program_id(2)

    @pl.when(vi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = raw_ref[:]                                        # [CT, B_t]
    lo = lo_ref[:]                                        # [CT, VT]
    hi = hi_ref[:]                                        # [CT, VT]
    # minor-dim insertions stay on 32-bit values (Mosaic rejects non-no-op
    # dim insertion on 1-bit bools); comparisons run on broadcasted f32
    xb = x[:, :, None]                                    # [CT, B_t, 1]
    in_iv = (
        (lo[:, None, :] <= xb) & (xb < hi[:, None, :])
    ).astype(jnp.float32)                                 # [CT, B_t, VT]
    # NaN and +inf -> bucket == count (the last real bucket), matching
    # upper_bound/searchsorted: both fail every half-open interval above
    voff = jnp.int32(vi) * jnp.int32(vt)
    vids = voff + jax.lax.broadcasted_iota(jnp.int32, (1, 1, vt), 2)
    # f32 literals: under jax_enable_x64 bare floats promote to f64,
    # which Mosaic cannot lay out
    specialf = jnp.where(
        x < jnp.float32(jnp.inf), jnp.float32(0), jnp.float32(1)
    )[:, :, None]
    cnt = cnt_ref[:]                                      # [CT, 1] int32
    is_cnt = (vids == cnt[:, :, None]).astype(jnp.float32)
    onehot = jnp.maximum(in_iv, specialf * is_cnt)
    tbl = tbl_ref[:]
    if tbl.dtype != jnp.float32:
        tbl = tbl.astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        tbl,                                              # [CT, VT, d]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bt", "ct", "vt", "interpret"))
def _onehot_bucketize_impl(
    table3: jnp.ndarray,   # [C_pad, V_pad, d] per-column tables (zero padded)
    raw_t: jnp.ndarray,    # [C_pad, B] f32 raw feature values
    lo: jnp.ndarray,       # [C_pad, V_pad] f32 lower bucket bounds
    hi: jnp.ndarray,       # [C_pad, V_pad] f32 upper bucket bounds
    counts: jnp.ndarray,   # [C_pad, 1] int32 true boundary counts
    bt: int = 128,
    ct: int = 8,
    vt: int = 512,
    interpret: bool = False,
):
    c_pad, v_pad, d = table3.shape
    b = raw_t.shape[1]
    bt = _pick_div(b, bt)
    ct = _pick_div(c_pad, ct)
    vt = _pick_tile(v_pad, vt, 128)
    grid = (c_pad // ct, b // bt, v_pad // vt)

    return pl.pallas_call(
        functools.partial(_bz_kernel, vt=vt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ct, bt), lambda ci, bi, vi: (ci, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, vt), lambda ci, bi, vi: (ci, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, vt), lambda ci, bi, vi: (ci, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda ci, bi, vi: (ci, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ct, vt, d), lambda ci, bi, vi: (ci, vi, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ct, bt, d), lambda ci, bi, vi: (ci, bi, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c_pad, b, d), jnp.float32),
        interpret=interpret,
    )(raw_t, lo, hi, counts, table3)


def onehot_bucketize_lookup(
    table3: jnp.ndarray,
    raw_t: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    counts: jnp.ndarray,   # [C_pad, 1] int32
    bt: int = 128,
    ct: int = 8,
    vt: int = 512,
    interpret: bool = False,
):
    """Gathered rows [C_pad, B, d] for bucketized float columns without
    ever materializing ids.  Padded vocab slots carry lo=hi=+inf (empty
    intervals), padded columns contribute zero rows.  Differentiable
    w.r.t. table3 (ids recomputed cheaply in the backward pass; raw
    features get zero cotangent — bucketize is piecewise constant)."""
    _, v_pad, d = table3.shape
    tdtype = table3.dtype

    @jax.custom_vjp
    def _f(t, r):
        return _onehot_bucketize_impl(t, r, lo, hi, counts, bt, ct, vt,
                                      interpret)

    def _fwd(t, r):
        return _f(t, r), r

    def _bwd(r, g):
        # bucket id = #(boundaries <= x); the FINITE lo entries are exactly
        # the boundaries (slot 0 is the -inf edge, pads are +inf).
        fin = jnp.isfinite(lo)
        le = (lo[:, None, :] <= r[:, :, None]) & fin[:, None, :]
        ids = le.sum(axis=2, dtype=jnp.int32)
        special = ~(r < jnp.inf)                           # NaN or +inf
        ids = jnp.where(special, counts, ids)

        def col_grad(ids_c, g_c):
            z = jnp.zeros((v_pad, d), jnp.float32)
            return z.at[ids_c].add(g_c, mode="drop")

        dt = jax.vmap(col_grad)(ids, g.astype(jnp.float32))
        return dt.astype(tdtype), jnp.zeros_like(r)

    _f.defvjp(_fwd, _bwd)
    return _f(table3, raw_t)


def bucket_bounds(
    boundary_matrix: np.ndarray,   # [C, Kmax] f32, +inf padded
    boundary_counts: np.ndarray,   # [C] int32
    v_pad: int,
    c_pad: int,
):
    """(lo, hi, counts) arrays for onehot_bucketize_lookup.  Bucket v of
    column c spans [bounds[v-1], bounds[v]) with -inf/+inf sentinels;
    vocab slots beyond count+1 and padded columns get empty intervals."""
    c, kmax = boundary_matrix.shape
    lo = np.full((c_pad, v_pad), np.inf, dtype=np.float32)
    hi = np.full((c_pad, v_pad), np.inf, dtype=np.float32)
    counts = np.zeros((c_pad, 1), dtype=np.int32)
    for i in range(c):
        k = int(boundary_counts[i])
        b = boundary_matrix[i, :k].astype(np.float64)
        edges = np.concatenate([[-np.inf], b, [np.inf]])
        lo[i, : k + 1] = edges[:-1].astype(np.float32)
        hi[i, : k + 1] = edges[1:].astype(np.float32)
        counts[i, 0] = k
    return lo, hi, counts


@functools.partial(
    jax.jit, static_argnames=("bt", "ct", "vt", "interpret")
)
def _onehot_lookup_impl(
    table3: jnp.ndarray,   # [C_pad, V_pad, d] per-column tables (zero padded)
    ids_t: jnp.ndarray,    # [C_pad, B] int32 local ids, -1 = missing
    bt: int = 128,
    ct: int = 8,
    vt: int = 512,
    interpret: bool = False,
):
    """Returns gathered-and-masked rows [C_pad, B, d] (missing ids -> 0)."""
    c_pad, v_pad, d = table3.shape
    b = ids_t.shape[1]
    bt = _pick_div(b, bt)
    ct = _pick_div(c_pad, ct)
    vt = _pick_tile(v_pad, vt, 128)
    grid = (c_pad // ct, b // bt, v_pad // vt)

    return pl.pallas_call(
        functools.partial(_kernel, vt=vt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ct, bt), lambda ci, bi, vi: (ci, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                # literal index 0 must stay int32: under jax_enable_x64 a
                # bare 0 promotes to i64 and Mosaic rejects the index map
                (ct, vt, d), lambda ci, bi, vi: (ci, vi, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ct, bt, d), lambda ci, bi, vi: (ci, bi, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c_pad, b, d), jnp.float32),
        interpret=interpret,
    )(ids_t, table3)


def onehot_lookup(
    table3: jnp.ndarray,
    ids_t: jnp.ndarray,
    bt: int = 128,
    ct: int = 8,
    vt: int = 512,
    interpret: bool = False,
):
    """onehot_lookup, differentiable w.r.t. table3.

    Pallas kernels have no automatic transpose, so the VJP is explicit:
    d(table3)[c, v, :] = sum_b [ids_t[c, b] == v] * g[c, b, :] — a
    per-column scatter-add (XLA), with missing (-1) ids dropped.  Shapes
    and dtype are captured in the closure (static at trace time)."""
    _, v_pad, d = table3.shape
    tdtype = table3.dtype

    @jax.custom_vjp
    def _lookup(t, i):
        return _onehot_lookup_impl(t, i, bt, ct, vt, interpret)

    def _fwd(t, i):
        return _lookup(t, i), i

    def _bwd(i, g):
        def col_grad(ids_c, g_c):
            z = jnp.zeros((v_pad, d), jnp.float32)
            return z.at[ids_c].add(g_c, mode="drop")

        dt = jax.vmap(col_grad)(
            jnp.where(i >= 0, i, v_pad), g.astype(jnp.float32)
        )
        return dt.astype(tdtype), None

    _lookup.defvjp(_fwd, _bwd)
    return _lookup(table3, ids_t)


def group_pooled_onehot(
    table3: jnp.ndarray,          # [C_pad, V_pad, d] zero-padded
    ids: jnp.ndarray,             # [B, C, 1] int32 stacked-group layout
    combiner_code: np.ndarray,    # [C] static
    num_columns: int,             # true C (un-padded)
    exact_math: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for lookup_xla.group_pooled on an L=1 uniform-vocab group
    (ids here are LOCAL per-column, not stacked-row-offset)."""
    from recom_tpu.ops import lookup_xla

    b = ids.shape[0]
    c_pad = table3.shape[0]
    ids2 = ids[:, :, 0]
    if ids2.shape[1] < c_pad:
        pad = jnp.full((b, c_pad - ids2.shape[1]), -1, jnp.int32)
        ids2 = jnp.concatenate([ids2, pad], axis=1)
    # positional args: custom_vjp nondiff_argnums require positional form
    rows = onehot_lookup(table3, ids2.T, 128, 8, 512, interpret)  # [C_pad, B, d]
    acc = jnp.transpose(rows[:num_columns], (1, 0, 2))        # [B, C, d]

    mask = (ids[:, :, 0] >= 0).astype(jnp.float32)            # [B, C]
    combiner_code = np.asarray(combiner_code)
    if not (combiner_code != 0).any():
        return acc
    div = lookup_xla.exact_div if exact_math else (lambda a, b_: a / b_)
    code = jnp.asarray(combiner_code)[None, :]
    # L == 1: wsum == w2sum == mask, and sqrt(mask) == mask
    denom = jnp.where(code == 0, 1.0, mask)
    nz = denom > 0
    safe = jnp.where(nz, denom, 1.0)
    return jnp.where(nz[:, :, None], div(acc, safe[:, :, None]), 0.0)

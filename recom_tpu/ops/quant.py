"""Quantized embedding-table storage.

Embedding lookup is HBM-bandwidth-bound: at batch 512 x 1000 columns the
gather streams table rows, so stored bytes ARE the latency.  The reference
keeps fp32 tables (VariableV2, frozen); we additionally support:

  bfloat16  — 2x less gather traffic, rows upcast AFTER the gather (in
              registers), ~3 decimal digits kept
  int8      — 4x less traffic: symmetric per-row scales (scale = max|row| /
              127), dequant after gather: f32(q) * scale[row]

Per-ROW scaling matters for embeddings: row norms in trained tables span
orders of magnitude (frequent ids get large rows), so a per-table scale
would crush rare-id rows to zero.

Exactness contract: quantization is lossy by definition, so the bit-exact
oracle comparison is against the DEQUANTIZED table (see
tests/test_quant.py) — the lookup+pool pipeline itself stays exact.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp


class QuantizedTable(NamedTuple):
    """Pytree leaf pair for an int8 row-quantized table."""

    q: jnp.ndarray        # [R, d] int8
    scale: jnp.ndarray    # [R] f32, 0.0 for all-zero rows


def quantize_rows_int8(table: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization (numpy, build time)."""
    table = np.asarray(table, np.float32)
    amax = np.abs(table).max(axis=1)
    scale = np.where(amax > 0, amax / 127.0, 0.0).astype(np.float32)
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    q = np.clip(np.rint(table * inv[:, None]), -127, 127).astype(np.int8)
    return q, scale


def dequantize_rows(q_rows: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """int8 rows [..., d] + per-row scales [...] -> f32 rows."""
    return q_rows.astype(jnp.float32) * scales[..., None]


def dequantize_table(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Full-table dequant (numpy) — the oracle-comparison reference."""
    return np.asarray(q, np.float32) * np.asarray(scale, np.float32)[:, None]

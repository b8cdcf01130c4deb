"""Static shape bucketing — the replacement for symbolic shapes.

The reference solves dynamic shapes with a 4.1k-LoC SymEngine symbolic
subsystem (reference tensorflow_addons/symbolic_shape/) because TF graphs
execute with truly dynamic shapes.  Under XLA everything must be static, so we
instead pad each dynamic dimension (batch, nnz-per-row) up to a small ladder
of bucket sizes: one compiled program per touched bucket combination, bounded
by ``len(batch_buckets) * len(rowlen_buckets)^n_ragged_groups`` in the worst
case and by the handful of buckets that actually occur in practice.
"""

from __future__ import annotations

from typing import Sequence, Tuple


def pick_bucket(ladder: Sequence[int], n: int, allow_truncate: bool = False) -> int:
    """Smallest bucket >= n.  If n exceeds the ladder: the last bucket when
    truncation is allowed, else ValueError."""
    if n < 0:
        raise ValueError(f"negative size {n}")
    for b in ladder:
        if n <= b:
            return b
    if allow_truncate:
        return ladder[-1]
    raise ValueError(
        f"size {n} exceeds largest bucket {ladder[-1]}; extend the ladder or "
        "set allow_truncate_overflow"
    )


def bucket_signature(
    batch_bucket: int, rowlen_buckets: Sequence[int]
) -> Tuple[int, Tuple[int, ...]]:
    """Hashable compile-cache key (the analogue of the reference's generated
    -code MD5, cuda_emitter.cc:86-111 — ours keys the XLA trace cache)."""
    return (batch_bucket, tuple(rowlen_buckets))

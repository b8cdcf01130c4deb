"""Closed-boundary integer interval sets.

The TPU-native analogue of the reference's Boost.ICL interval algebra used by
its PreLookupOptimizer (reference graph_optimizers/pre_lookup_optimizer.cc:
66-123 compiles comparison predicates into interval sets; the runtime filter
ops carry ``left_boundaries``/``right_boundaries`` attrs with *closed*
boundaries, custom_ops/gather_value_gen_indice/gather_value_gen_indice_ops.cc:
36-42).  We only need integers: every range-establishing transform (hash
bucket, bucketize, vocab lookup) produces integer ids.

All intervals are closed ``[lo, hi]``.  The empty set is ``IntervalSet([])``;
the universe is ``IntervalSet.all()`` = the full int64 range (so complement-
based sets like ``x != 5`` classify 63-bit hash/snowflake ids correctly).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np

INT_MIN = -(1 << 63)
INT_MAX = (1 << 63) - 1


class IntervalSet:
    """An immutable union of disjoint closed integer intervals."""

    __slots__ = ("_ivs",)

    def __init__(self, intervals: Iterable[Tuple[int, int]] = ()):
        self._ivs: Tuple[Tuple[int, int], ...] = self._normalize(intervals)

    @staticmethod
    def _normalize(intervals) -> Tuple[Tuple[int, int], ...]:
        ivs = sorted((int(lo), int(hi)) for lo, hi in intervals if lo <= hi)
        out: List[Tuple[int, int]] = []
        for lo, hi in ivs:
            # merge adjacent integer intervals: [0,3] + [4,7] == [0,7]
            if out and lo <= out[-1][1] + 1:
                out[-1] = (out[-1][0], max(out[-1][1], hi))
            else:
                out.append((lo, hi))
        return tuple(out)

    # --- constructors -----------------------------------------------------
    @classmethod
    def all(cls) -> "IntervalSet":
        return cls([(INT_MIN, INT_MAX)])

    @classmethod
    def empty(cls) -> "IntervalSet":
        return cls([])

    @classmethod
    def point(cls, v: int) -> "IntervalSet":
        return cls([(v, v)])

    @classmethod
    def ge(cls, v: int) -> "IntervalSet":
        return cls([(v, INT_MAX)])

    @classmethod
    def gt(cls, v: int) -> "IntervalSet":
        if v >= INT_MAX:
            return cls.empty()
        return cls([(v + 1, INT_MAX)])

    @classmethod
    def le(cls, v: int) -> "IntervalSet":
        return cls([(INT_MIN, v)])

    @classmethod
    def lt(cls, v: int) -> "IntervalSet":
        if v <= INT_MIN:
            return cls.empty()
        return cls([(INT_MIN, v - 1)])

    @classmethod
    def closed(cls, lo: int, hi: int) -> "IntervalSet":
        return cls([(lo, hi)])

    # --- algebra ----------------------------------------------------------
    def union(self, other: "IntervalSet") -> "IntervalSet":
        return IntervalSet(self._ivs + other._ivs)

    def intersect(self, other: "IntervalSet") -> "IntervalSet":
        out = []
        for alo, ahi in self._ivs:
            for blo, bhi in other._ivs:
                lo, hi = max(alo, blo), min(ahi, bhi)
                if lo <= hi:
                    out.append((lo, hi))
        return IntervalSet(out)

    def complement(self) -> "IntervalSet":
        out = []
        prev = INT_MIN
        for lo, hi in self._ivs:
            if lo > prev:
                out.append((prev, lo - 1))
            prev = hi + 1
        if prev <= INT_MAX:
            out.append((prev, INT_MAX))
        return IntervalSet(out)

    def difference(self, other: "IntervalSet") -> "IntervalSet":
        return self.intersect(other.complement())

    # --- predicates -------------------------------------------------------
    @property
    def intervals(self) -> Tuple[Tuple[int, int], ...]:
        return self._ivs

    def is_empty(self) -> bool:
        return not self._ivs

    def is_all(self) -> bool:
        return self._ivs == ((INT_MIN, INT_MAX),)

    def contains(self, v: int) -> bool:
        for lo, hi in self._ivs:
            if lo <= v <= hi:
                return True
        return False

    def is_superset(self, other: "IntervalSet") -> bool:
        return other.difference(self).is_empty()

    def min(self) -> int:
        return self._ivs[0][0]

    def max(self) -> int:
        return self._ivs[-1][1]

    # --- vectorized membership (host preprocessing + oracle) --------------
    def membership_mask(self, x: np.ndarray) -> np.ndarray:
        """Boolean mask of elements of ``x`` inside the set (vectorized)."""
        x = np.asarray(x)
        mask = np.zeros(x.shape, dtype=bool)
        for lo, hi in self._ivs:
            mask |= (x >= lo) & (x <= hi)
        return mask

    def boundaries(self) -> Tuple[List[int], List[int]]:
        """(left_boundaries, right_boundaries) in the reference filter-op
        attr format (closed boundaries)."""
        return [lo for lo, _ in self._ivs], [hi for _, hi in self._ivs]

    # --- dunder -----------------------------------------------------------
    def __eq__(self, other) -> bool:
        return isinstance(other, IntervalSet) and self._ivs == other._ivs

    def __hash__(self) -> int:
        return hash(self._ivs)

    def __repr__(self) -> str:
        if self.is_empty():
            return "IntervalSet(empty)"
        if self.is_all():
            return "IntervalSet(all)"

        def fmt(v):
            if v == INT_MIN:
                return "-inf"
            if v == INT_MAX:
                return "+inf"
            return str(v)

        return "IntervalSet(%s)" % " | ".join(
            f"[{fmt(lo)},{fmt(hi)}]" for lo, hi in self._ivs
        )


def compare_to_interval(op: str, rhs: int) -> IntervalSet:
    """Compile a comparison predicate ``x <op> rhs`` into an interval set
    (the reference's MatchExpr comparison leaves,
    pre_lookup_optimizer.cc:92-123)."""
    if op in (">",):
        return IntervalSet.gt(rhs)
    if op in (">=",):
        return IntervalSet.ge(rhs)
    if op in ("<",):
        return IntervalSet.lt(rhs)
    if op in ("<=",):
        return IntervalSet.le(rhs)
    if op in ("==",):
        return IntervalSet.point(rhs)
    if op in ("!=",):
        return IntervalSet.point(rhs).complement()
    raise ValueError(f"unknown comparison op {op!r}")

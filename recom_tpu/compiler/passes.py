"""Compiler passes over the column IR.

TPU-native re-design of the reference's graph optimizers
(graph_optimizers/): because we own the IR, each pass is a few dozen lines
of interval algebra instead of hundreds of lines of TF-graph pattern
matching.  Every pass must preserve oracle semantics exactly — property
-tested by comparing oracle outputs before/after in tests/test_passes.py
(the contract the reference only enforces by graceful degradation).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.utils.logging import Logger

_log = Logger("passes")
from recom_tpu.ir.spec import (
    Cast,
    FeatureColumn,
    FeatureKind,
    FilterRange,
    IdentityTransform,
    ModelSpec,
    SelectRange,
    Transform,
)


def _replace_columns(model: ModelSpec, columns: List[FeatureColumn]) -> ModelSpec:
    return ModelSpec(model.name, dict(model.tables), columns, model.tower)


def initial_range(col: FeatureColumn) -> IntervalSet:
    """Integer range of the raw source values (pre-transform).  Integer
    sources with declared bounds (FeatureSource.int_range) seed the
    interval analysis immediately — filters/selects before any Map
    transform become provable; everything else gets the universe and the
    first Map establishes the real range."""
    from recom_tpu.ir.spec import FeatureKind

    src = col.source
    if (
        src.int_range is not None
        and src.kind in (FeatureKind.DENSE_INT, FeatureKind.INT_LIST)
    ):
        lo, hi = src.int_range
        # (DENSE_INT -1 = missing is dropped at materialization, BEFORE
        # the transform chain — the declared range describes real values)
        return IntervalSet.closed(int(lo), int(hi))
    return IntervalSet.all()


def chain_out_range(col: FeatureColumn) -> IntervalSet:
    r = initial_range(col)
    for t in col.transforms:
        r = t.out_range(r)
    return r


# ---------------------------------------------------------------------------
# Pass 1: useless-transform pruning (UselessNodesPruner analogue,
# reference useless_nodes_pruner.cc:24-136 — Identity/no-op elimination)
# ---------------------------------------------------------------------------


def prune_useless(model: ModelSpec) -> Tuple[ModelSpec, Dict]:
    removed = 0
    new_cols = []
    for col in model.columns:
        kept = tuple(
            t for t in col.transforms
            if not isinstance(t, (IdentityTransform, Cast))
        )
        removed += len(col.transforms) - len(kept)
        new_cols.append(
            dataclasses.replace(col, transforms=kept) if kept != col.transforms
            else col
        )
    return _replace_columns(model, new_cols), {"removed_transforms": removed}


# ---------------------------------------------------------------------------
# Pass 2: interval-set pre-lookup simplification (PreLookupOptimizer
# analogue, reference pre_lookup_optimizer.cc:413-478 Simplify — fuse
# consecutive Gathers/Selects, drop ops whose interval doesn't shrink the
# established range)
# ---------------------------------------------------------------------------


def _simplify_chain(
    transforms: Tuple[Transform, ...], r: IntervalSet
) -> Tuple[List[Transform], int]:
    out: List[Transform] = []
    dropped = 0
    for t in transforms:
        if isinstance(t, FilterRange):
            keep = t.keep.intersect(r) if not r.is_all() else t.keep
            if keep.is_superset(r):
                dropped += 1          # filter can never drop anything
                continue
            prev = out[-1] if out else None
            if isinstance(prev, FilterRange):
                out[-1] = FilterRange(prev.keep.intersect(keep))
                dropped += 1
            elif isinstance(prev, SelectRange) and not keep.contains(prev.substitute):
                # Select(k,s) then Filter(f) with s not in f  ==  Filter(k&f)
                out[-1] = FilterRange(prev.keep.intersect(keep))
                dropped += 1
            else:
                out.append(FilterRange(keep))
            r = r.intersect(keep)
        elif isinstance(t, SelectRange):
            if t.keep.is_superset(r):
                dropped += 1          # select can never substitute anything
                continue
            prev = out[-1] if out else None
            if (
                isinstance(prev, SelectRange)
                and prev.substitute == t.substitute
            ):
                out[-1] = SelectRange(
                    prev.keep.intersect(t.keep), t.substitute
                )
                dropped += 1
            else:
                out.append(t)
            r = t.out_range(r)
        else:
            out.append(t)
            r = t.out_range(r)
    return out, dropped


def simplify_pre_lookup(model: ModelSpec) -> Tuple[ModelSpec, Dict]:
    dropped_total = 0
    new_cols = []
    for col in model.columns:
        if col.lookup is None:
            new_cols.append(col)
            continue
        simplified, dropped = _simplify_chain(
            col.transforms, initial_range(col)
        )
        dropped_total += dropped
        new_cols.append(
            dataclasses.replace(col, transforms=tuple(simplified))
            if dropped
            else col
        )
    return _replace_columns(model, new_cols), {"dropped_transforms": dropped_total}


# ---------------------------------------------------------------------------
# Pass 3: lookup canonicalization (LookupOptimizer analogue, reference
# lookup_optimizer.cc:25-59 — we verify id ranges against table bounds at
# compile time and record provable validity for kernel selection)
# ---------------------------------------------------------------------------


def canonicalize_lookup(
    model: ModelSpec, strict: bool = False
) -> Tuple[ModelSpec, Dict]:
    """Range-verify every chain against its table.  A chain whose range
    can exceed the vocab WARNS and serves with runtime clamp/mask
    semantics (ids < 0 prune as missing, ids >= vocab clamp to the last
    row) — the reference's contract is leave-the-graph-untouched on any
    match surprise (lookup_optimizer.cc RETURN_IF_FALSE discipline), and
    a compile-time rejection would block serving for a model TF would
    run.  ``strict=True`` (EngineConfig.strict_id_ranges) restores the
    hard error for deployments that prefer failing the build."""
    always_valid = 0
    range_warnings = 0
    for col in model.embedding_columns:
        vocab = model.tables[col.lookup.table].vocab_size
        r = chain_out_range(col)
        if not r.is_empty() and r.max() >= vocab:
            unconstrained = r.is_all()
            msg = (
                f"column {col.name!r}: transform chain "
                + ("is unconstrained (no Map transform or declared "
                   "int_range bounds it)"
                   if unconstrained else
                   f"can produce id {r.max()}")
                + f" >= table vocab {vocab}"
            )
            if strict:
                # unconstrained chains are exactly the ones most likely to
                # exceed the vocab; strict mode must fail the build for
                # them too, not only for finitely-overlarge ranges
                raise ValueError(
                    msg + " (strict_id_ranges=True fails the build; the "
                    "default serves with runtime clamp/mask)"
                )
            if not unconstrained:
                # finite-but-overlarge ranges are a declared contract
                # breach — warn; the unconstrained case is the NORMAL
                # shape for identity columns (runtime clamp always on)
                _log.warning(
                    msg + "; serving with runtime clamp/mask semantics"
                )
                range_warnings += 1
            continue
        if not r.is_empty() and r.min() >= 0:
            always_valid += 1
    return model, {
        "columns_provably_valid": always_valid,
        "range_warnings": range_warnings,
    }


# ---------------------------------------------------------------------------
# Pass 4: shared-sub-column dedup (new in this framework; the reference
# re-computes shared prefixes per column).  The pass reports the count;
# the mechanics live in two places: host_prep memoizes chain evaluation by
# chain_key (shared prefixes hash once), and lowering ALIASES device-
# identical columns (chain+table+combiner+weights+post) to one group
# member — the duplicate occupies no wire bytes, no [B, C, L] id-plane
# width, no stacked-table rows, and no pooling (lowering.lower_model).
# ---------------------------------------------------------------------------


def dedup_subcolumns(model: ModelSpec) -> Tuple[ModelSpec, Dict]:
    seen: Dict[str, str] = {}
    duplicates = 0
    for col in model.embedding_columns:
        key = col.chain_key()
        if key in seen:
            duplicates += 1
        else:
            seen[key] = col.name
    return model, {"duplicate_chains": duplicates}

"""The pass pipeline driver — the analogue of FCOptimizePass::Run
(reference passes/fc_optimize_pass.cc:26-89): run each optimizer in order,
each gated by config, each preserving oracle semantics (property-tested in
tests/test_passes.py), with optional per-stage IR dumps.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Tuple

from recom_tpu.config import EngineConfig
from recom_tpu.ir.spec import ModelSpec


@dataclasses.dataclass
class PassReport:
    stages: List[Dict] = dataclasses.field(default_factory=list)

    def record(self, name: str, info: Dict):
        self.stages.append({"pass": name, **info})


def _dump(model: ModelSpec, config: EngineConfig, stage: str):
    if not config.dump_ir_dir:
        return
    os.makedirs(config.dump_ir_dir, exist_ok=True)
    path = os.path.join(config.dump_ir_dir, f"{model.name}_{stage}.json")
    # serde's full serialization (post chains, in_concat, weight fields,
    # int_range, ...) — a hand-rolled subset made dumps of post-bearing
    # models indistinguishable from post-free ones
    from recom_tpu.ir.serde import model_to_dict

    with open(path, "w") as f:
        json.dump(model_to_dict(model), f, indent=1)


def run_passes(
    model: ModelSpec, config: EngineConfig
) -> Tuple[ModelSpec, PassReport]:
    """Ordering mirrors the reference pipeline (fc_optimize_pass.cc:41-73):
    prune -> pre-lookup interval simplification -> lookup canonicalization;
    dedup (ours) runs last since canonical chains dedup better."""
    from recom_tpu.compiler import passes

    report = PassReport()
    _dump(model, config, "0_input")
    if config.prune_useless:
        model, info = passes.prune_useless(model)
        report.record("prune_useless", info)
        _dump(model, config, "1_prune")
    if config.pre_lookup_opt:
        model, info = passes.simplify_pre_lookup(model)
        report.record("simplify_pre_lookup", info)
        _dump(model, config, "2_prelookup")
    if config.lookup_opt:
        model, info = passes.canonicalize_lookup(
            model, strict=getattr(config, "strict_id_ranges", False)
        )
        report.record("canonicalize_lookup", info)
        _dump(model, config, "3_lookup")
    if config.dedup_subcolumns:
        model, info = passes.dedup_subcolumns(model)
        report.record("dedup_subcolumns", info)
        _dump(model, config, "4_dedup")
    return model, report

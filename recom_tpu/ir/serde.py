"""ModelSpec <-> JSON serialization.

Used by checkpointing (spec travels with the weights), the feature-spec
importer, and per-pass IR dumps.  The reference's equivalent persistent
artifact is the TF SavedModel itself plus dumped GraphDefs
(fc_optimize_pass.cc:28-31); our IR is small enough to round-trip as JSON.
"""

from __future__ import annotations

import json
from typing import Dict

from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.ir import spec as S

_TRANSFORMS = {
    "CrossHash": S.CrossHash,
    "HashBucket": S.HashBucket,
    "Bucketize": S.Bucketize,
    "NumToId": S.NumToId,
    "VocabLookup": S.VocabLookup,
    "Mod": S.Mod,
    "FilterRange": S.FilterRange,
    "FilterStrSentinel": S.FilterStrSentinel,
    "SelectRange": S.SelectRange,
    "Cast": S.Cast,
    "IdentityTransform": S.IdentityTransform,
    "HostEvalChain": S.HostEvalChain,
}


def transform_to_dict(t: S.Transform) -> Dict:
    name = type(t).__name__
    if isinstance(t, S.HashBucket):
        body = {"num_buckets": t.num_buckets}
    elif isinstance(t, S.Bucketize):
        body = {"boundaries": list(t.boundaries)}
    elif isinstance(t, S.NumToId):
        body = {"num_ids": t.num_ids, "default_id": t.default_id}
    elif isinstance(t, S.VocabLookup):
        body = {
            "vocab": list(t.vocab), "num_oov": t.num_oov,
            "default": t.default,
        }
    elif isinstance(t, S.CrossHash):
        body = {"num_buckets": t.num_buckets, "hash_key": t.hash_key}
    elif isinstance(t, S.Mod):
        body = {"n": t.n}
    elif isinstance(t, S.FilterRange):
        body = {"keep": list(t.keep.intervals)}
    elif isinstance(t, S.FilterStrSentinel):
        body = {"sentinel": t.sentinel}
    elif isinstance(t, S.SelectRange):
        body = {"keep": list(t.keep.intervals), "substitute": t.substitute}
    elif isinstance(t, S.Cast):
        body = {"dtype": t.dtype}
    elif isinstance(t, S.HostEvalChain):
        body = {"steps": [list(s) for s in t.steps]}
    elif isinstance(t, S.IdentityTransform):
        body = {}
    else:
        raise TypeError(f"unknown transform {t}")
    return {"kind": name, **body}


def transform_from_dict(d: Dict) -> S.Transform:
    kind = d["kind"]
    body = {k: v for k, v in d.items() if k != "kind"}
    if kind in ("FilterRange", "SelectRange"):
        body["keep"] = IntervalSet(
            [(int(lo), int(hi)) for lo, hi in body["keep"]]
        )
    if kind == "HostEvalChain":
        body["steps"] = [tuple(s) for s in body["steps"]]
    cls = _TRANSFORMS[kind]
    return cls(**body)


def model_to_dict(model: S.ModelSpec) -> Dict:
    return {
        "name": model.name,
        "tables": {
            k: {
                "vocab_size": t.vocab_size, "dim": t.dim, "dtype": t.dtype,
                "init_seed": t.init_seed, "init_scale": t.init_scale,
            }
            for k, t in model.tables.items()
        },
        "columns": [
            {
                "name": c.name,
                "source": {
                    "field": c.source.field,
                    "kind": c.source.kind.value,
                    "delimiter": c.source.delimiter,
                    "fields": list(c.source.fields) if c.source.fields else None,
                    "int_range": (
                        list(c.source.int_range)
                        if c.source.int_range else None
                    ),
                    "width": c.source.width,
                },
                "transforms": [transform_to_dict(t) for t in c.transforms],
                "lookup": None
                if c.lookup is None
                else {
                    "table": c.lookup.table,
                    "combiner": c.lookup.combiner.value,
                    "weight_field": c.lookup.weight_field,
                },
                "in_concat": c.in_concat,
                "post": [
                    {"op": p.op,
                     "scale": list(p.scale) if p.scale else None,
                     "bias": list(p.bias) if p.bias else None,
                     "other": p.other,
                     "weight": [list(r) for r in p.weight]
                     if p.weight else None}
                    for p in c.post
                ],
            }
            for c in model.columns
        ],
        "tower": {
            "arch": model.tower.arch,
            "bottom_mlp": list(model.tower.bottom_mlp),
            "top_mlp": list(model.tower.top_mlp),
            "activation": model.tower.activation,
            "final_activation": model.tower.final_activation,
            "init_seed": model.tower.init_seed,
        },
    }


def model_from_dict(d: Dict) -> S.ModelSpec:
    tables = {
        k: S.TableSpec(name=k, **v) for k, v in d["tables"].items()
    }
    columns = []
    for c in d["columns"]:
        src = S.FeatureSource(
            c["source"]["field"],
            S.FeatureKind(c["source"]["kind"]),
            delimiter=c["source"].get("delimiter"),
            fields=tuple(c["source"]["fields"])
            if c["source"].get("fields")
            else None,
            int_range=tuple(c["source"]["int_range"])
            if c["source"].get("int_range")
            else None,
            width=c["source"].get("width", 1),
        )
        lookup = None
        if c["lookup"] is not None:
            lookup = S.LookupSpec(
                c["lookup"]["table"],
                S.Combiner(c["lookup"]["combiner"]),
                weight_field=c["lookup"].get("weight_field"),
            )
        columns.append(
            S.FeatureColumn(
                c["name"], src,
                tuple(transform_from_dict(t) for t in c["transforms"]),
                lookup,
                in_concat=c.get("in_concat", True),
                post=tuple(
                    S.PostPool(
                        p["op"],
                        scale=tuple(p["scale"]) if p.get("scale") else None,
                        bias=tuple(p["bias"]) if p.get("bias") else None,
                        other=p.get("other"),
                        weight=tuple(tuple(r) for r in p["weight"])
                        if p.get("weight") else None,
                    )
                    for p in c.get("post", ())
                ),
            )
        )
    tower = S.TowerSpec(
        arch=d["tower"]["arch"],
        bottom_mlp=tuple(d["tower"]["bottom_mlp"]),
        top_mlp=tuple(d["tower"]["top_mlp"]),
        activation=d["tower"]["activation"],
        final_activation=d["tower"]["final_activation"],
        init_seed=d["tower"]["init_seed"],
    )
    return S.ModelSpec(d["name"], tables, columns, tower)


def model_to_json(model: S.ModelSpec) -> str:
    return json.dumps(model_to_dict(model), indent=1)


def model_from_json(s: str) -> S.ModelSpec:
    return model_from_dict(json.loads(s))

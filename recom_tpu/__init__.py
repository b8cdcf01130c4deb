"""recom_tpu: a TPU-native inference/training engine for deep recommendation
models with massive embedding-column counts.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
AlibabaResearch/recom (RECom, ASPLOS'23): recsys feature specs
(hash-bucketize, vocab lookup, sparse segment pooling, column concat) are
ingested into a small column IR, simplified by interval-set
redundancy-elimination and lookup-canonicalization passes, and compiled into a
handful of fused Pallas gather/segment-reduce megakernels. Static shape
bucketing replaces RECom's SymEngine symbolic shapes (reference:
tensorflow_addons/symbolic_shape/) to keep XLA compiles bounded; embedding
tables are row-sharded over a device mesh with all-to-all ID exchange.

Layer map (TPU-native analogue of SURVEY.md section 1):
  L4 pipeline driver      recom_tpu.compiler.pipeline
  L3 compiler passes      recom_tpu.compiler.passes / lowering
  L2 shape bucketing      recom_tpu.compiler.buckets
  L1 runtime + kernels    recom_tpu.runtime / recom_tpu.ops
  L0 host preprocessing   recom_tpu.runtime.host_prep + recom_tpu/native (C++)
"""

from recom_tpu.ir.spec import (  # noqa: F401
    Bucketize,
    Cast,
    Combiner,
    CrossHash,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    FilterRange,
    FilterStrSentinel,
    HashBucket,
    IdentityTransform,
    LookupSpec,
    Mod,
    ModelSpec,
    NumToId,
    PostPool,
    SelectRange,
    TableSpec,
    TowerSpec,
    VocabLookup,
)
from recom_tpu.config import EngineConfig  # noqa: F401

__version__ = "0.1.0"


# Lazy class exports (PEP 562): the runtime classes import jax, which
# oracle-only users must be able to avoid at package-import time.  A
# module __getattr__ (not wrapper functions) returns the REAL classes, so
# classmethods like Trainer.restore and isinstance checks work.
_LAZY = {
    "Engine": ("recom_tpu.runtime.executor", "Engine"),
    "ServingPipeline": ("recom_tpu.runtime.server", "ServingPipeline"),
    "MicroBatcher": ("recom_tpu.runtime.batcher", "MicroBatcher"),
    "Trainer": ("recom_tpu.train", "Trainer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'recom_tpu' has no attribute {name!r}")

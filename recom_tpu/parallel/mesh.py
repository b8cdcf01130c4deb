"""Device mesh construction.

The reference has NO multi-device story (single-process single-GPU
inference; SURVEY.md section 2.7) — this subsystem is new in the TPU
framework: a ("data", "model") mesh where the batch is data-parallel and
embedding-table ROWS are sharded over the model axis (the DLRM
expert-parallel analogue), with the dense tower replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def enable_async_collectives() -> None:
    """Append --xla_tpu_enable_async_all_to_all to XLA_FLAGS (idempotent).

    With this flag the TPU scheduler rewrites the chunked a2a row-return
    exchanges (all_to_all_lookup.py chunks>1) into all-to-all-start/done
    pairs and hoists the restoration fusions of earlier chunks between
    them — verified on an AOT v5e:2x4 compile (tools/overlap_evidence.py
    records the HLO).  XLA parses XLA_FLAGS per compilation, so setting
    it at mesh-construction time covers every subsequent jit.  TPU-only:
    non-TPU backends ABORT on unknown flags in XLA_FLAGS (strict
    parse_flags_from_env), so CPU meshes skip it — their collectives are
    host-thread emulation with nothing to async-ify anyway."""
    import os

    import jax

    try:
        if jax.default_backend() != "tpu":
            return
    except Exception:
        return
    flag = "--xla_tpu_enable_async_all_to_all=true"
    cur = os.environ.get("XLA_FLAGS", "")
    if "xla_tpu_enable_async_all_to_all" not in cur:
        os.environ["XLA_FLAGS"] = (cur + " " + flag).strip()


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    shape=None uses all local devices as (n, 1) — pure data parallel.
    A -1 entry is inferred from the device count."""
    enable_async_collectives()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    # a fully-specified shape may use a prefix of the available devices
    arr = np.array(devices[:need]).reshape(shape)
    return Mesh(arr, axis_names)

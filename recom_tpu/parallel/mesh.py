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


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    shape=None uses all local devices as (n, 1) — pure data parallel.
    A -1 entry is inferred from the device count."""
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

"""Multi-host (multi-process) execution support.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7); this
module provides the pieces that take the sharded lookup across HOSTS, where
the model axis spans processes and the table exchange rides DCN (or ICI on
a pod slice) — the "100GB+ tables row-sharded over 2+ hosts" BASELINE
configuration:

  * init(): jax.distributed bootstrap
  * global_mesh(): a ("data", "model") mesh over all processes' devices
  * from_global(): place a host array on the mesh under a PartitionSpec
    via make_array_from_callback — each process materializes only ITS
    addressable shards, so a 100GB striped table never exists whole in
    one host's memory (pass the table with P("model") row sharding, or
    P() replicated for small inputs)
  * gather_to_host(): fully-addressable fetch of a sharded result

Validated end-to-end by tools/multihost_demo.py, which runs the all-to-all
and psum lookup paths over 2 OS processes x 4 virtual CPU devices and
checks bit-exactness against the single-process kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init(
    coordinator: str, num_processes: int, process_id: int
) -> None:
    """jax.distributed bootstrap (idempotent per process: a second call —
    another Engine, a retried startup, or user code that already
    initialized — is a no-op instead of the RuntimeError
    jax.distributed.initialize raises)."""
    state = getattr(
        getattr(jax._src, "distributed", None), "global_state", None
    )
    if state is not None and state.client is not None:
        return
    try:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def global_mesh(
    axis_names: Tuple[str, str] = ("data", "model"),
    data_parallel_hosts: bool = False,
) -> Mesh:
    """A 2-D mesh over every device of every process.

    data_parallel_hosts=False (default) puts the MODEL axis across hosts —
    table shards span hosts and lookup comm crosses the host boundary (the
    interesting configuration); True puts the data axis across hosts
    (tables replicated or sharded within each host)."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    devs = np.array(jax.devices())
    if data_parallel_hosts:
        return Mesh(devs.reshape(n_proc, local), axis_names)
    # model axis spans every device of every process: table shards and the
    # lookup exchange cross the host boundary
    return Mesh(devs.reshape(1, n_proc * local), axis_names)


def from_global(mesh: Mesh, spec: P, global_array: np.ndarray):
    """Place a globally-known numpy array on the mesh: every process
    materializes only its addressable shards (for tables too big for one
    host, pass a callback-backed array-like that slices lazily — anything
    supporting __getitem__ with numpy basic indexing works)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        np.shape(global_array), sharding, lambda idx: global_array[idx]
    )


def gather_to_host(x) -> np.ndarray:
    """Fetch a (possibly cross-process) sharded array to every host."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

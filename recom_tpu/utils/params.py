"""Deterministic parameter initialization shared by the NumPy oracle and the
JAX engine.

Both sides must materialize *identical* float32 parameters so lookup outputs
can be compared bit-for-bit (the reference has no such oracle; its QA is
graceful degradation + AE-figure comparison, SURVEY.md section 4).  All
randomness is NumPy PCG64 keyed by (spec seed, name) — never jax.random, so
the oracle stays jax-free.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Tuple

import numpy as np

from recom_tpu.ir.spec import ModelSpec, TableSpec, TowerSpec


def _rng(seed: int, name: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([seed, zlib.crc32(name.encode())]))


def init_table(spec: TableSpec) -> np.ndarray:
    rng = _rng(spec.init_seed, spec.name)
    scale = np.float32(spec.init_scale / np.sqrt(spec.dim))
    # float32 generation: half the RNG cost, matters for multi-GB tables
    t = rng.standard_normal((spec.vocab_size, spec.dim), dtype=np.float32)
    t *= scale
    return t


def init_mlp(
    seed: int, name: str, in_dim: int, hidden: Tuple[int, ...]
) -> List[Dict[str, np.ndarray]]:
    """He-initialized MLP layer params: [{'w': [in,out], 'b': [out]}, ...]."""
    layers = []
    d = in_dim
    for i, h in enumerate(hidden):
        rng = _rng(seed, f"{name}/layer{i}")
        w = (rng.standard_normal((d, h)) * np.sqrt(2.0 / d)).astype(np.float32)
        b = np.zeros((h,), dtype=np.float32)
        layers.append({"w": w, "b": b})
        d = h
    return layers


def tower_input_dim(model: ModelSpec) -> int:
    """Width of the tower's input concat for each arch."""
    from recom_tpu.ir.spec import column_out_width

    tower = model.tower
    n_dense = model.dense_width
    emb_dims = [
        column_out_width(model, c)
        for c in model.embedding_columns
        if c.in_concat
    ]
    if tower.arch == "mlp":
        if tower.bottom_mlp:
            n_dense = tower.bottom_mlp[-1] if n_dense else 0
        return n_dense + sum(emb_dims)
    if tower.arch == "dlrm_dot":
        if not emb_dims:
            raise ValueError("dlrm_dot needs embedding columns")
        dims = set(emb_dims)
        if len(dims) != 1:
            raise ValueError("dlrm_dot requires uniform embedding dim")
        d = dims.pop()
        if not tower.bottom_mlp or tower.bottom_mlp[-1] != d:
            raise ValueError(
                "dlrm_dot requires bottom_mlp ending at the embedding dim"
            )
        n_vec = len(emb_dims) + 1  # + bottom-MLP output vector
        n_pairs = n_vec * (n_vec - 1) // 2
        return d + n_pairs
    raise ValueError(f"unknown tower arch {tower.arch!r}")


def init_model_params(model: ModelSpec) -> Dict:
    """Full parameter pytree (plain dicts of np.float32 arrays)."""
    params: Dict = {"tables": {}, "tower": {}}
    for name, tspec in model.tables.items():
        params["tables"][name] = init_table(tspec)
    tower = model.tower
    if tower.bottom_mlp:
        params["tower"]["bottom"] = init_mlp(
            tower.init_seed,
            f"{model.name}/bottom",
            model.dense_width,
            tuple(tower.bottom_mlp),
        )
    params["tower"]["top"] = init_mlp(
        tower.init_seed, f"{model.name}/top", tower_input_dim(model), tuple(tower.top_mlp)
    )
    return params

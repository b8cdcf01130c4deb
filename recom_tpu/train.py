"""Training on top of the inference engine.

The reference is inference-only (frozen VariableV2 tables, SURVEY.md
section 5 "checkpoint/resume: none"), but a complete TPU framework must
close the loop: the same compiled forward — grouped stacked-table lookups,
shard_map'd when row-sharded — is differentiable end-to-end, so training is
jax.grad over Engine._forward plus an optax optimizer.  Gradients of
jnp.take are scatter-adds into (sharded) dense table cotangents; the model
axis keeps table grads and optimizer state sharded alongside the tables.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from recom_tpu.config import EngineConfig
from recom_tpu.ir.spec import ModelSpec
from recom_tpu.runtime.executor import Engine, mlp_apply
from recom_tpu.runtime.host_prep import prepare_batch


def rowwise_adagrad(
    learning_rate: float = 0.01, eps: float = 1e-10
) -> optax.GradientTransformation:
    """Row-wise AdaGrad for embedding tables (the production DLRM table
    optimizer): ONE accumulator per table row — mean of the row's squared
    gradients — instead of one per element, cutting optimizer state for a
    [R, d] table from R*d to R floats.  Rows untouched by a batch have
    zero gradient and therefore unchanged accumulators and values, so the
    update is sparse in effect even though JAX cotangents are dense."""

    def init(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:1], jnp.float32)
            if p.ndim == 2
            else jnp.zeros_like(p),
            params,
        )

    def update(grads, state, params=None):
        del params

        def new_acc(g, acc):
            return acc + (jnp.mean(g * g, axis=1) if g.ndim == 2 else g * g)

        def upd(g, acc2):
            s = jax.lax.rsqrt(acc2 + eps)
            return -learning_rate * g * (s[:, None] if g.ndim == 2 else s)

        new_state = jax.tree_util.tree_map(new_acc, grads, state)
        updates = jax.tree_util.tree_map(upd, grads, new_state)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def dlrm_optimizer(
    table_lr: float = 0.01, tower_lr: float = 1e-3
) -> optax.GradientTransformation:
    """The standard DLRM split: row-wise AdaGrad on embedding tables,
    Adam on the dense tower."""

    def label(params):
        return {
            "stacked": jax.tree_util.tree_map(
                lambda _: "tables", params["stacked"]
            ),
            "tower": jax.tree_util.tree_map(
                lambda _: "tower", params["tower"]
            ),
        }

    return optax.multi_transform(
        {"tables": rowwise_adagrad(table_lr), "tower": optax.adam(tower_lr)},
        label,
    )


def forward_logits(engine: Engine, params, arrays, signature=None) -> jnp.ndarray:
    """Engine forward but with the final activation stripped (losses want
    logits).  ``signature`` is required on the single-blob wire path (the
    blob's layout is keyed by it)."""
    return engine._forward(
        params, arrays, mode=(), logits_only=True, signature=signature
    )["output"]


class Trainer:
    """Mini training loop: BCE loss on the tower output, optax optimizer,
    one jitted train_step per shape bucket.

    >>> tr = Trainer(model, EngineConfig(mesh_shape=(2, 4)))
    >>> loss = tr.step(raw_batch, labels)
    """

    def __init__(
        self,
        model: ModelSpec,
        config: Optional[EngineConfig] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        params: Optional[Dict] = None,
    ):
        if config is not None and config.table_dtype != "float32":
            raise ValueError(
                "training requires table_dtype='float32' (bf16/int8 table "
                "storage is an inference-serving optimization)"
            )
        self.engine = Engine(model, config, params)
        self.optimizer = optimizer or optax.adam(1e-3)
        self.opt_state = self.optimizer.init(self.engine.device_params)
        self._step_cache: Dict[Tuple, object] = {}

    @property
    def params(self):
        return self.engine.device_params

    def _make_step(self, signature):
        eng = self.engine
        opt = self.optimizer

        def loss_fn(params, arrays, labels, mask):
            logits = forward_logits(eng, params, arrays, signature)
            per = optax.sigmoid_binary_cross_entropy(logits[:, 0], labels)
            return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        def train_step(params, opt_state, arrays, labels, mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, arrays, labels, mask
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    def save(self, path: str) -> None:
        """Checkpoint the FULL training state for exact resume: the engine
        checkpoint (spec + portable params, runtime/checkpoint.py) plus
        the optimizer state leaves (opt_state.npz, tree order).

        The reference has no training at all (SURVEY section 5
        "checkpoint/resume: none"); this closes the production loop:
        resume from a save reproduces the uninterrupted run bit-for-bit
        (tests/test_training.py resume tests).  Restore topology must
        match save topology — row-sharded optimizer leaves are saved in
        their striped physical layout."""
        import os

        from recom_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(path, self.engine)
        leaves = jax.tree_util.tree_leaves(self.opt_state)
        np.savez(
            os.path.join(path, "opt_state.npz"),
            **{f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )

    @classmethod
    def restore(
        cls,
        path: str,
        config: Optional[EngineConfig] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
    ) -> "Trainer":
        """Rebuild a Trainer from ``save``: engine from the stored
        spec/params, optimizer state leaves loaded into the structure of a
        fresh ``optimizer.init`` (each leaf device_put to the template
        leaf's sharding, so mesh placement is re-established)."""
        import os

        from recom_tpu.runtime.checkpoint import load_checkpoint

        model, params = load_checkpoint(path)
        tr = cls(model, config, optimizer=optimizer, params=params)
        data = np.load(os.path.join(path, "opt_state.npz"))
        leaves, treedef = jax.tree_util.tree_flatten(tr.opt_state)
        if len(data.files) != len(leaves):
            raise ValueError(
                f"opt_state leaf count mismatch: checkpoint has "
                f"{len(data.files)}, optimizer.init built {len(leaves)} — "
                "same optimizer and topology required for resume"
            )
        from jax.sharding import NamedSharding

        new = []
        for i, tmpl in enumerate(leaves):
            arr = jnp.asarray(data[f"leaf{i}"], dtype=tmpl.dtype)
            sh = getattr(tmpl, "sharding", None)
            # a fresh init leaf is an UNCOMMITTED single-device array —
            # committing the restored leaf to its device would clash with
            # the mesh-sharded params at the first jitted step; only
            # re-establish real mesh placements
            if isinstance(sh, NamedSharding):
                arr = jax.device_put(arr, sh)
            new.append(arr)
        tr.opt_state = jax.tree_util.tree_unflatten(treedef, new)
        return tr

    def step(self, batch: Dict, labels: np.ndarray) -> float:
        prepared = self.engine.prepare(batch)
        bp = prepared.batch_padded
        lab = np.zeros((bp,), np.float32)
        lab[: prepared.batch_size] = np.asarray(labels, np.float32)
        mask = np.zeros((bp,), np.float32)
        mask[: prepared.batch_size] = 1.0

        fn = self._step_cache.get(prepared.signature)
        if fn is None:
            fn = self._make_step(prepared.signature)
            self._step_cache[prepared.signature] = fn

        arrays = self.engine.shard_batch_arrays(prepared.arrays)
        if self.engine.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.engine.mesh, P("data"))
            lab = jax.device_put(lab, sh)
            mask = jax.device_put(mask, sh)

        params, opt_state, loss = fn(
            self.engine.device_params, self.opt_state, arrays, lab, mask
        )
        self.engine.device_params = params
        self.opt_state = opt_state
        return float(loss)

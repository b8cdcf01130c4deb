"""Multi-device TRAINING equivalence artifact (VERDICT r02 weak #7).

Trains the SAME planted-signal model from the SAME float32 init on the
SAME batch stream twice:

  * single device (no mesh), and
  * a ("data", "model") mesh with the big table row-sharded (EP) and the
    batch data-parallel (DP),

and records what the dryrun's one-step check cannot: the full loss
trajectories side by side (max per-step |delta|), the exported parameter
end-state difference after N steps (sharded tables unstriped by
checkpoint export), and the held-out AUC of both arms.  Runs on the
8-device virtual CPU mesh — the same mechanism the driver's
dryrun_multichip validates — so it needs no TPU pod.

Expected physics: the a2a lookup path is bit-exact, but data-parallel
loss/grad reductions sum in a different order than the single-device
batch reduction, so losses track to ~1e-5 and parameters drift at
rounding level over many steps; the artifact records the measured
deltas, not just a pass/fail.

  python -m recom_tpu.tools.train_multi --steps 120 --out TRAIN_MULTI.json
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time

import numpy as np

VOCAB_BIG, VOCAB_SMALL, DIM = 4096, 48, 8
EVAL_N = 4096


def make_model():
    from recom_tpu.ir.spec import (
        Combiner,
        FeatureColumn,
        FeatureKind,
        FeatureSource,
        LookupSpec,
        ModelSpec,
        NumToId,
        TableSpec,
        TowerSpec,
    )

    tables = {
        "big": TableSpec("big", VOCAB_BIG, DIM),     # row-sharded (EP)
        "small": TableSpec("small", VOCAB_SMALL, DIM),  # replicated
    }
    cols = [
        FeatureColumn(
            "bids", FeatureSource("bids", FeatureKind.INT_LIST),
            (NumToId(VOCAB_BIG),), LookupSpec("big", Combiner.MEAN),
        ),
        FeatureColumn(
            "sids", FeatureSource("sids", FeatureKind.INT_LIST),
            (NumToId(VOCAB_SMALL),), LookupSpec("small", Combiner.SUM),
        ),
        FeatureColumn("d0", FeatureSource("d0", FeatureKind.DENSE_FLOAT)),
    ]
    tower = TowerSpec(arch="mlp", bottom_mlp=(), top_mlp=(16, 1),
                      final_activation="sigmoid")
    return ModelSpec("trainmulti", tables, cols, tower)


def make_data(rng, n):
    lens_b = rng.integers(1, 6, n)
    lens_s = rng.integers(1, 4, n)
    bids = [rng.integers(0, VOCAB_BIG, int(k)).tolist() for k in lens_b]
    sids = [rng.integers(0, VOCAB_SMALL, int(k)).tolist() for k in lens_s]
    d0 = rng.standard_normal(n).astype(np.float32)
    signal = (
        np.array([np.mean(r) / (VOCAB_BIG - 1) for r in bids])
        + 0.2 * np.array([np.mean(r) / (VOCAB_SMALL - 1) for r in sids])
        + 0.3 * d0
    )
    labels = (
        signal + 0.1 * rng.standard_normal(n) > 0.65
    ).astype(np.float32)
    return {"bids": bids, "sids": sids, "d0": d0}, labels


def train_arm(model, np_params, stream, eval_batch, eval_labels,
              lr, mesh_shape):
    import jax
    import optax

    from recom_tpu import EngineConfig
    from recom_tpu.runtime.checkpoint import export_params
    from recom_tpu.tools.auc_parity import auc
    from recom_tpu.train import Trainer

    bs = len(stream[0][1])
    cfg = EngineConfig(
        use_pallas=False,
        batch_buckets=(bs, EVAL_N),
        persistent_compilation_cache=False,
        mesh_shape=mesh_shape,
        # force the 4096-row table onto the sharded path on the mesh arm
        shard_rows_above=2048 if mesh_shape else (1 << 62),
    )
    tr = Trainer(model, cfg, optimizer=optax.adam(lr),
                 params=copy.deepcopy(np_params))
    losses = [tr.step(b, l) for b, l in stream]
    scores = np.asarray(tr.engine.predict(eval_batch)["output"])[:, 0]
    a = auc(eval_labels, scores)
    final = export_params(tr.engine)     # unstripes sharded tables
    sharded = sorted(getattr(tr.engine, "_sharded_gids", ()))
    return losses, a, final, sharded


def _tree_max_delta(a, b):
    out = {}
    for k in a["tables"]:
        out[f"tables/{k}"] = float(
            np.max(np.abs(np.asarray(a["tables"][k], np.float64)
                          - np.asarray(b["tables"][k], np.float64)))
        )
    for key, layers in a["tower"].items():
        for i, (la, lb) in enumerate(zip(layers, b["tower"][key])):
            out[f"tower/{key}/{i}"] = float(max(
                np.max(np.abs(np.asarray(la["w"], np.float64)
                              - np.asarray(lb["w"], np.float64))),
                np.max(np.abs(np.asarray(la["b"], np.float64)
                              - np.asarray(lb["b"], np.float64))),
            ))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--mesh", type=int, nargs=2, default=[4, 2],
                    help="(data, model) mesh for the sharded arm")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n_dev = args.mesh[0] * args.mesh[1]
    # APPEND to any pre-set XLA_FLAGS (setdefault would silently lose the
    # device-count flag on hosts where the env already carries XLA_FLAGS,
    # leaving 1 CPU device and failing the mesh arm at Trainer build)
    flag = f"--xla_force_host_platform_device_count={n_dev}"
    prior = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prior:
        os.environ["XLA_FLAGS"] = f"{prior} {flag}".strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    model = make_model()
    from recom_tpu.utils.params import init_model_params
    from recom_tpu.tools.auc_parity import auc

    np_params = init_model_params(model)
    rng = np.random.default_rng(7)
    stream = [make_data(rng, args.batch) for _ in range(args.steps)]
    eval_batch, eval_labels = make_data(np.random.default_rng(998), EVAL_N)

    t0 = time.perf_counter()
    losses_1, auc_1, final_1, _ = train_arm(
        model, np_params, stream, eval_batch, eval_labels, args.lr, None
    )
    single_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    losses_m, auc_m, final_m, sharded = train_arm(
        model, np_params, stream, eval_batch, eval_labels, args.lr,
        tuple(args.mesh),
    )
    mesh_s = time.perf_counter() - t0

    dl = np.abs(np.asarray(losses_1) - np.asarray(losses_m))
    deltas = _tree_max_delta(final_1, final_m)
    doc = {
        "protocol": (
            f"identical init + batch stream, Adam lr={args.lr}, "
            f"{args.steps} steps x batch {args.batch}; single device vs "
            f"{tuple(args.mesh)} virtual mesh (row-sharded big table, "
            "data-parallel batch), AUC on held-out "
            f"{EVAL_N}"
        ),
        "sharded_groups": sharded,
        "loss_first": [round(losses_1[0], 6), round(losses_m[0], 6)],
        "loss_last": [round(losses_1[-1], 6), round(losses_m[-1], 6)],
        "loss_max_abs_delta": round(float(dl.max()), 8),
        "loss_decreased": bool(
            losses_1[-1] < losses_1[0] and losses_m[-1] < losses_m[0]
        ),
        "auc_single": round(auc_1, 4),
        "auc_mesh": round(auc_m, 4),
        "auc_gap": round(abs(auc_1 - auc_m), 4),
        "param_end_state_max_abs_delta": {
            k: round(v, 8) for k, v in deltas.items()
        },
        "train_s": [round(single_s, 1), round(mesh_s, 1)],
        "n_virtual_devices": n_dev,
    }
    out = json.dumps(doc, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    ok = (
        doc["loss_decreased"]
        and doc["auc_gap"] <= 0.01
        and dl.max() < 1e-3
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

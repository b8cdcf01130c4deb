"""Naive-TPU baseline arm: the same model, per-column unfused JAX.

The reference's headline compares against TF-GPU — the same accelerator
running the model WITHOUT the compiler (AE/build_and_run.py:57-71), which
is what isolates the compiler's contribution from the hardware's.  Our
TF-CPU baseline alone conflates the two (VERDICT r03 missing #1).  This
arm is the TPU analogue of TF-GPU: a straightforward JAX port of the
feature-column graph with none of the framework's machinery —

  * NO column grouping / table stacking: one embedding table, one gather,
    one masked pool PER COLUMN (1000 XLA ops for model E, like TF-GPU's
    thousands of tiny kernels);
  * NO single-blob wire: every column's array crosses to the device
    individually (per-array transfer, the naive H2D pattern);
  * NO batched host prep: one native-hash call per column (the sane
    naive port — same C++ FarmHash we use, so the comparison isolates
    the framework, not Python-vs-C++ string hashing);
  * NO compiled concat layout: jnp.concatenate of 1000 slices in model
    order, then the same MLP tower.

Two deliberate kindnesses to the naive arm (documented, both favor it):
ragged columns pad to a STATIC cap (a naive port would recompile per
batch max-length — we spare it that), and bucketize runs on device via
jnp.searchsorted (the TF graph's op placement).

Usage (records NAIVE_r04-style rows):
  python -m recom_tpu.tools.naive_tpu --model E --batches 32 512 2048
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List, Tuple

import numpy as np

RAGGED_CAP = 16     # static pad for ragged columns (model E/F lists <= 10)


def naive_prepare(model, batch: Dict, batch_size: int) -> Dict:
    """Per-column host prep, the naive way: one call per column, one
    output array per column, no shared staging.  Hashing uses the same
    native FarmHash as the framework (a naive port would bind the same
    library); delimited columns split+hash one column at a time."""
    from recom_tpu.ir.spec import Bucketize, HashBucket
    from recom_tpu.ir.spec import FeatureKind as FK
    from recom_tpu.native import ops as native_ops

    arrays: Dict[str, np.ndarray] = {}
    for col in model.columns:
        f = col.source.field
        if col.lookup is None:
            arrays[col.name] = np.asarray(
                batch[f], np.float32
            )[:batch_size]
            continue
        t0 = col.transforms[0] if col.transforms else None
        if isinstance(t0, Bucketize):
            arrays[col.name] = np.asarray(
                batch[f], np.float32
            )[:batch_size]
        elif col.source.kind == FK.DENSE_INT and isinstance(t0, HashBucket):
            v = np.asarray(batch[f], np.int64)[:batch_size]
            ids = native_ops.hash_ints(v, t0.num_buckets)
            arrays[col.name] = np.where(v == -1, -1, ids).astype(
                np.int32
            )[:, None]
        elif col.source.kind == FK.STRING and isinstance(t0, HashBucket):
            ids = native_ops.hash_strings(
                np.asarray(batch[f], dtype="S")[:batch_size], t0.num_buckets
            )
            arrays[col.name] = ids.astype(np.int32)[:, None]
        elif col.source.kind == FK.STRING_LIST and isinstance(t0, HashBucket):
            ids, _ = native_ops.split_hash_padded(
                np.asarray(batch[f], dtype="S")[:batch_size],
                col.source.delimiter, t0.num_buckets, RAGGED_CAP,
            )
            arrays[col.name] = ids.astype(np.int32)
        else:
            raise NotImplementedError(
                f"naive arm: column {col.name} chain {col.transforms}"
            )
    return arrays


def _build_forward(model):
    """fn(tables, tower, arrays) -> sigmoid output [B, 1]: one gather +
    one masked pool per column, concatenated in model order.  Shared by
    the end-to-end arm (host-prepared arrays) and the device-step arm
    (on-device generated arrays) so the e2e sanity check vs the engine
    covers both."""
    import jax.numpy as jnp

    from recom_tpu.ir.spec import Bucketize, Combiner
    from recom_tpu.runtime.executor import mlp_apply

    plans = []
    for col in model.columns:
        if col.lookup is None:
            plans.append(("dense", col.name, None, None))
            continue
        t0 = col.transforms[0] if col.transforms else None
        if isinstance(t0, Bucketize):
            plans.append((
                "bucketize", col.name, col.lookup.table,
                np.asarray(t0.boundaries, np.float32),
            ))
        else:
            plans.append((
                "ids_" + (
                    "mean" if col.lookup.combiner is Combiner.MEAN else "sum"
                ),
                col.name, col.lookup.table, None,
            ))

    def fn(tables, tower, arrays):
        outs = []
        dense_parts = []
        for kind, name, tbl, bounds in plans:
            x = arrays[name]
            if kind == "dense":
                dense_parts.append(
                    x[:, None] if x.ndim == 1 else x
                )
                continue
            table = tables[tbl]
            if kind == "bucketize":
                ids = jnp.searchsorted(
                    jnp.asarray(bounds), x, side="right"
                )
                outs.append(table[ids])                     # [B, d]
                continue
            mask = x >= 0                                   # [B, L]
            rows = table[jnp.maximum(x, 0)]                 # [B, L, d]
            pooled = jnp.sum(
                jnp.where(mask[..., None], rows, 0.0), axis=1
            )
            if kind == "ids_mean":
                cnt = jnp.maximum(
                    jnp.sum(mask, axis=1, keepdims=True), 1
                ).astype(jnp.float32)
                pooled = pooled / cnt
            outs.append(pooled)
        emb = jnp.concatenate(outs, axis=1)
        dense = (
            jnp.concatenate(dense_parts, axis=1) if dense_parts
            else jnp.zeros((emb.shape[0], 0), jnp.float32)
        )
        front = dense
        if model.tower.bottom_mlp and dense.shape[1]:
            front = mlp_apply(
                tower["bottom"], dense, model.tower.activation,
                model.tower.activation,
            )
        return mlp_apply(
            tower["top"], jnp.concatenate([front, emb], axis=1),
            model.tower.activation, model.tower.final_activation,
        )

    return fn


def build_naive_fn(model):
    import jax

    return jax.jit(_build_forward(model))


def build_naive_device_fn(model, batch_size: int):
    """jit(fn(tables, tower, seed) -> [B, 1]): the same per-column naive
    forward, fed by arrays GENERATED ON DEVICE from ``seed``.

    Why: on a remote-attached TPU the e2e naive arm is dominated by its
    per-array H2D RPCs (model E = 1000 arrays/request; measured 6.5
    s/request at even 50 columns — see NAIVE smoke row), which measures
    the transport, not the compiler.  This variant gives the naive arm
    its host prep and ALL transfers for free: only its device step is on
    the clock, with fresh content per dispatch (seed-keyed RNG, so the
    transport's execution cache can never serve a repeat).  Every bias
    favors the naive arm; the framework's comparison number is its FULL
    request (host prep + wire transfer + device step)."""
    import jax
    import jax.numpy as jnp

    from recom_tpu.ir.spec import Bucketize, HashBucket
    from recom_tpu.ir.spec import FeatureKind as FK

    forward = _build_forward(model)
    # per-column generation spec: (name, kind, vocab/range, rowlen)
    gens = []
    for col in model.columns:
        if col.lookup is None:
            gens.append((col.name, "dense", 1.0, 1))
            continue
        t0 = col.transforms[0] if col.transforms else None
        if isinstance(t0, Bucketize):
            # spread over the full boundary range (same as make_random_batch)
            gens.append((col.name, "bz",
                         float(t0.boundaries[-1]) * 1.2, 1))
        elif isinstance(t0, HashBucket):
            L = RAGGED_CAP if col.source.kind == FK.STRING_LIST else 1
            gens.append((col.name, "ids", int(t0.num_buckets), L))
        else:
            raise NotImplementedError(col.name)

    B = batch_size

    def fn(tables, tower, seed):
        key = jax.random.PRNGKey(seed)
        kf, ki, kl = jax.random.split(key, 3)
        nf = sum(1 for _, k, _, _ in gens if k in ("dense", "bz"))
        ni = sum(1 for _, k, _, _ in gens if k == "ids")
        uf = jax.random.uniform(kf, (max(nf, 1), B))
        ui = jax.random.uniform(ki, (max(ni, 1), B, RAGGED_CAP))
        # list lengths 0..10: unlike the 1..10 envelope make_random_batch
        # uses, the e2e arm also sees EMPTY lists (missing rows), so the
        # device-step arm draws them too (ADVICE r04: keep the two arms'
        # content distributions aligned, and say so in the protocol)
        lens = jax.random.randint(kl, (max(ni, 1), B), 0, 11)
        pos = jnp.arange(RAGGED_CAP)[None, None, :]
        arrays = {}
        fi = ii = 0
        for name, kind, rng, L in gens:
            if kind in ("dense", "bz"):
                arrays[name] = uf[fi] * rng
                fi += 1
            else:
                ids = (ui[ii] * rng).astype(jnp.int32)
                if L == 1:
                    arrays[name] = ids[:, :1]
                else:
                    mask = pos[0] < lens[ii][:, None]
                    arrays[name] = jnp.where(mask, ids, -1)
                ii += 1
        return forward(tables, tower, arrays)

    return jax.jit(fn)


def measure_naive_device(model, np_params, batch_size: int, n: int = 24,
                         fn=None, fetch_check: bool = True) -> Dict:
    """Device-step-only naive cell: fresh on-device content per dispatch
    (seed-keyed), async loop with confirm-every-8 — the same measurement
    loop shape as the framework cells, minus naive's host prep and H2D
    (both gifted to it).

    ``fetch_check=False`` skips the device->host finiteness pull: on the
    tunneled transport the FIRST D2H of a program output degrades every
    later device op ~40x for the process (CLAUDE.md), so callers that
    keep measuring afterwards (ae_sweep per-cell naive arms; this
    module's own --device-arm sweep) MUST defer any fetch to the very
    end.  The AE_SWEEP_r05 first recording was discarded for exactly
    this: the cell-1 naive fetch poisoned every later cell 10-20x."""
    import jax

    if fn is None:
        fn = build_naive_device_fn(model, batch_size)
    # params go on device ONCE (ADVICE r04 medium): passing numpy params
    # per dispatch would re-stage every table inside the timed loop and
    # inflate the naive arm's step — the opposite of the gifted-transfers
    # protocol this function documents
    tables = jax.device_put({
        k: np.asarray(v, np.float32)
        for k, v in np_params["tables"].items()
    })
    tower = jax.device_put(np_params["tower"])
    jax.block_until_ready((tables, tower))
    t0 = time.perf_counter()
    out = fn(tables, tower, 0)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    assert out.shape[0] == batch_size
    if fetch_check:                      # D2H — see docstring
        o = np.asarray(out)
        assert np.isfinite(o).all()

    pending = []
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        pending.append(fn(tables, tower, i))
        if i % 8 == 0:
            jax.block_until_ready(pending)
            pending = []
    jax.block_until_ready(pending)
    per = (time.perf_counter() - t0) / n
    return {
        "arm": "naive_tpu_device_step",
        "model": model.name,
        "batch": batch_size,
        "device_step_ms": round(per * 1e3, 3),
        "examples_per_s_device_only": round(batch_size / per, 1),
        "warm_compile_s": round(compile_s, 1),
        "distinct_inputs": n,
        "n_unfused_columns": len(model.columns),
        "protocol": "async device loop, on-device RNG content "
                    "(host prep + H2D gifted to the naive arm; params "
                    "device-resident before timing; list lengths drawn "
                    "0..10 vs the e2e arm's 1..10 — empty rows included)",
    }


def measure_naive(model, np_params, batches: List[Dict], batch_size: int,
                  sanity_engine=None, fn=None) -> Dict:
    """Async-loop protocol over distinct batches (same confirm-every-8
    measurement as the framework's AE cells).  Returns the cell row.
    Pass a prebuilt ``fn`` (build_naive_fn) when sweeping several batch
    sizes so jit's per-shape cache is shared across cells."""
    import jax

    if fn is None:
        fn = build_naive_fn(model)
    # tables/tower device-resident before timing (ADVICE r04): only the
    # per-request feature arrays cross per dispatch — the per-ARRAY
    # transfer tax being measured is the batch's, not the params'
    tables = jax.device_put({
        k: np.asarray(v, np.float32)
        for k, v in np_params["tables"].items()
    })
    tower = jax.device_put(np_params["tower"])
    jax.block_until_ready((tables, tower))

    t0 = time.perf_counter()
    warm = naive_prepare(model, batches[0], batch_size)
    out = fn(tables, tower, warm)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    if sanity_engine is not None:
        ref = sanity_engine.predict(batches[0])["output"]
        got = np.asarray(out)[: len(ref)]
        if not np.allclose(got, ref, atol=1e-4):
            raise AssertionError(
                f"naive arm disagrees with engine: max diff "
                f"{np.abs(got - ref).max()}"
            )

    # async loop, confirm every 8 (mirrors tools/serve_loops protocol)
    pending = []
    t0 = time.perf_counter()
    for i, b in enumerate(batches[1:], 1):
        arrays = naive_prepare(model, b, batch_size)
        pending.append(fn(tables, tower, arrays))
        if i % 8 == 0:
            jax.block_until_ready(pending)
            pending = []
    jax.block_until_ready(pending)
    n = len(batches) - 1
    per = (time.perf_counter() - t0) / max(n, 1)

    # host-prep share, measured separately on one batch
    t0 = time.perf_counter()
    for b in batches[1:4]:
        naive_prepare(model, b, batch_size)
    prep_ms = (time.perf_counter() - t0) / max(1, len(batches[1:4])) * 1e3

    return {
        "arm": "naive_tpu",
        "model": model.name,
        "batch": batch_size,
        "request_ms_async": round(per * 1e3, 3),
        "examples_per_s": round(batch_size / per, 1),
        "host_prep_ms": round(prep_ms, 3),
        "warm_compile_s": round(compile_s, 1),
        "distinct_inputs": n,
        "n_device_arrays_per_step": len(model.columns),
        "ragged_pad": RAGGED_CAP,
        "protocol": "async_serving_loop(confirm_every=8)",
    }


def main():
    from recom_tpu.utils.platform import honor_cpu_platform

    honor_cpu_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="E")
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[32, 64, 128, 256, 512, 1024, 2048])
    ap.add_argument("--inputs", type=int, default=24)
    ap.add_argument("--sanity", action="store_true",
                    help="cross-check the first output vs the framework "
                         "engine (builds a second engine)")
    ap.add_argument("--device-arm", action="store_true",
                    help="also record the device-step-only arm (host prep"
                         " + H2D gifted) at every batch size")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from recom_tpu.models import (
        make_model_e, make_model_f, make_random_batch,
    )
    from recom_tpu.utils.params import init_model_params

    kind, _, scale = args.model.partition("@")
    scale = float(scale) if scale else 1.0
    model = (make_model_e if kind == "E" else make_model_f)(scale=scale)
    np_params = init_model_params(model)
    rows = []
    for bs in args.batches:
        n = max(9, min(args.inputs, (args.inputs * 512) // bs))
        bats = [
            make_random_batch(model, bs, seed=31_000 + bs + i)
            for i in range(n + 1)
        ]
        # sanity runs AFTER every timed cell (below): its D2H fetch would
        # degrade all later device ops ~40x on the tunnel (CLAUDE.md)
        row = measure_naive(model, np_params, bats, bs,
                            sanity_engine=None)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.device_arm:
            drow = measure_naive_device(
                model, np_params, bs, n=16, fetch_check=False,
            )   # defer all D2H past the timed sweep
            rows.append(drow)
            print(json.dumps(drow), flush=True)
    if args.sanity:
        # end-of-run fetches only: compare the naive forward vs the
        # engine on one batch per swept size
        import jax

        from recom_tpu import Engine, EngineConfig

        sanity_eng = Engine(model, EngineConfig(), params=np_params)
        fn = build_naive_fn(model)
        tables = {k: np.asarray(v, np.float32)
                  for k, v in np_params["tables"].items()}
        tower = np_params["tower"]
        worst = 0.0
        for bs in args.batches:
            b = make_random_batch(model, bs, seed=77 + bs)
            got = np.asarray(
                fn(tables, tower, naive_prepare(model, b, bs))
            )
            ref = sanity_eng.predict(b)["output"]
            worst = max(worst, float(np.abs(got[: len(ref)] - ref).max()))
        srow = {"sanity_max_abs_diff_vs_engine": worst,
                "sanity_tol": 1e-4, "sanity_ok": bool(worst < 1e-4)}
        assert srow["sanity_ok"], srow
        rows.append(srow)
        print(json.dumps(srow), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            cmd = (
                f"python -m recom_tpu.tools.naive_tpu --model {args.model} "
                f"--batches {' '.join(map(str, args.batches))}"
            )
            json.dump({"cmd": cmd, "rows": rows}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()

"""AE-protocol latency/throughput sweep.

The reference's artifact-evaluation harness sweeps {models E, F} x
{batch 32..2048} x {systems} and serve_workers {2,4,8}
(AE/build_and_run.py:57-80).  This mirrors it for recom_tpu: each cell is
warm-up + N timed iterations of the steady-state device step, plus the
NumPy-oracle CPU baseline for the speedup column.

  python -m recom_tpu.tools.ae_sweep --models E@0.05 F@0.05 \
      --batches 32 128 512 --iters 50
"""

from __future__ import annotations

import argparse
import json
import time


def sweep_model(name: str, batches, iters: int, oracle_batches=()):
    """One sweep row per batch size: device-step latency over DISTINCT
    device-resident inputs (a caching transport returns repeated
    (program, inputs) executions from cache — measured on the remote
    tunnel here — so every timed dispatch must carry different content),
    drained once per measurement so wall time is device-bound."""
    import jax

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import (
        make_model_e,
        make_model_f,
        make_random_batch,
    )
    from recom_tpu.oracle import OracleModel

    kind, _, scale = name.partition("@")
    scale = float(scale) if scale else 1.0
    if kind == "E":
        model = make_model_e(scale=scale)
    elif kind == "F":
        model = make_model_f(scale=scale)
    else:
        raise SystemExit(f"unknown model {name!r} (expected E[@s] or F[@s])")
    eng = Engine(model, EngineConfig())
    rows = []
    for bs in batches:
        batch = make_random_batch(model, bs, seed=bs)
        n_inputs = min(iters, 16)
        bats = [
            make_random_batch(model, bs, seed=1000 + i)
            for i in range(n_inputs)
        ]
        # warm (compile + rowlen hints)
        p = eng.prepare(batch)
        fn = eng._get_jitted(p.signature)
        jax.block_until_ready(fn(eng.device_params, p.arrays)["output"])
        # strict sync serving loop over DISTINCT batches: prep + upload +
        # execute + confirm per request.  Device-only micro-timings are
        # not trustworthy on this transport (caching + wait semantics at
        # microsecond scales); the per-request e2e number is.
        lats = []
        for b in bats:
            t0 = time.perf_counter()
            p = eng.prepare(b)
            f = eng._get_jitted(p.signature)
            jax.block_until_ready(
                f(eng.device_params, p.arrays)["output"]
            )
            lats.append(time.perf_counter() - t0)
        import numpy as _np

        dt = float(_np.median(lats))
        row = {
            "model": model.name,
            "batch": bs,
            "latency_ms": round(dt * 1e3, 3),
            "examples_per_s": round(bs / dt, 1),
            "distinct_inputs": len(bats),
            "protocol": "sync_serving_loop_e2e",
        }
        if bs in oracle_batches:
            oracle = OracleModel(model)
            t0 = time.perf_counter()
            oracle.forward(batch)
            row["oracle_cpu_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
            row["speedup_vs_oracle"] = round(
                row["oracle_cpu_ms"] / row["latency_ms"], 2
            )
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="+", default=["E@0.05"])
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[32, 64, 128, 256, 512, 1024, 2048])
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--oracle-batches", nargs="+", type=int, default=[512])
    args = ap.parse_args()

    out = []
    for name in args.models:
        out.extend(
            sweep_model(
                name, args.batches, args.iters,
                oracle_batches=set(args.oracle_batches),
            )
        )
    print(json.dumps({"sweep": out}, indent=1))


if __name__ == "__main__":
    main()

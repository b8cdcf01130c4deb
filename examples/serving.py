#!/usr/bin/env python
"""Production-style serving: warmup, pipelined requests, online refresh,
SLA report.

Shows the full serving lifecycle on one chip:
  1. build + compile the engine
  2. Engine.warmup() — every shape bucket compiled before traffic
  3. ServingPipeline — host prep of request k+1 overlaps device step k
  4. online refresh mid-traffic: Engine.update_table_rows (stream fresh
     embedding rows) and Engine.reload_params (whole retrained
     checkpoint) — no rebuild, no recompile
  5. throughput_under_sla — the max sustainable load at a p99 target

  python examples/serving.py --columns 100 --batch 256 --sla-ms 20
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--columns", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--sla-ms", type=float, default=50.0)
    args = ap.parse_args()

    import numpy as np

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.runtime.server import ServingPipeline, throughput_under_sla

    model = make_dlrm_model(
        args.columns, 10, 10, 4, 1, 16, [16], [128, 64, 1], name="serve",
        large_rows=100_000,
    )
    eng = Engine(model, EngineConfig(batch_buckets=(args.batch,)))
    n = eng.warmup()
    print(f"warmed {n} programs")

    requests = [
        make_random_batch(model, args.batch, seed=i)
        for i in range(args.requests)
    ]
    with ServingPipeline(eng, prep_workers=4, max_inflight=4) as pipe:
        outs = pipe.map_stream(requests)
    assert all(np.isfinite(o).all() for o in outs)
    print(f"served {len(outs)} requests; engine counters:",
          eng.stats_report()["counters"])

    # --- online refresh mid-traffic: no rebuild, no recompile ----------
    compiles_before = eng.stats["compiles"]
    t0 = "emb_bucketize0"
    dim = model.tables[t0].dim
    rows = np.arange(model.tables[t0].vocab_size)
    eng.update_table_rows(
        t0, rows, np.random.default_rng(1).standard_normal(
            (rows.size, dim)
        ).astype(np.float32),
    )
    from recom_tpu.runtime.checkpoint import export_params

    eng.reload_params(export_params(eng))   # e.g. a retrained checkpoint
    out2 = eng.predict(requests[0])
    assert np.isfinite(np.asarray(out2["output"])).all()
    assert eng.stats["compiles"] == compiles_before
    print("online refresh applied (row update + full reload), 0 recompiles")

    # fresh content per timed request (transport-cached remote devices
    # serve repeated (program, inputs) executions from cache); note the
    # map_stream above already pulled outputs to host, so on the tunnel
    # this demo's SLA numbers run in the post-first-D2H regime — use
    # bench.py / tools/benchmark.py --sla-ms for recorded measurements
    rep = throughput_under_sla(
        eng, requests[:4], sla_ms=args.sla_ms, num_iterations=10,
        worker_ladder=(1, 2, 4),
        batch_factory=lambda k: make_random_batch(
            model, args.batch, seed=50_000 + k
        ),
    )
    best = rep["best_under_sla"]
    if best:
        print(
            f"max sustainable under {args.sla_ms}ms p99: "
            f"{best['examples_per_s']:.0f} examples/s at "
            f"{best['workers']} workers (p99 {best['p99_ms']}ms)"
        )
    else:
        print(f"SLA {args.sla_ms}ms not attainable; ladder: {rep['ladder']}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmark: N bucketized embedding columns, average latency.

The recom_tpu counterpart of the reference's
examples/python/microbenchmark.py:31-91 — same knobs (column count, batch,
table rows, dim, random boundaries), measured the same way (warm-up, then
the average of N timed runs).

  python examples/microbenchmark.py --columns 100 --batch 512
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--columns", type=int, default=100)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--rows", type=int, default=100)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--random-boundary", action="store_true")
    ap.add_argument("--runs", type=int, default=100)
    args = ap.parse_args()

    import jax

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_microbenchmark_model
    from recom_tpu.oracle import OracleModel

    model = make_microbenchmark_model(
        args.columns, table_rows=args.rows, dim=args.dim,
        random_boundary=args.random_boundary,
    )
    batch = make_random_batch(model, args.batch, seed=0)
    eng = Engine(model, EngineConfig())

    out = eng.predict(batch, return_pooled=True)
    ref = OracleModel(model).forward(batch)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
    print(f"bit-exact vs oracle: {args.columns} columns OK")

    # distinct content per timed dispatch: the tunnel transport caches
    # repeated (program, inputs) executions (CLAUDE.md bench invariant)
    stats = eng.benchmark(
        [batch] + [
            make_random_batch(model, args.batch, seed=1 + i)
            for i in range(args.runs)
        ],
        iters=args.runs,
    )
    print(
        f"{args.columns} columns, batch {args.batch}: "
        f"{stats['latency_ms']:.3f} ms avg over {args.runs} runs "
        f"({stats['examples_per_s']:.0f} examples/s, "
        f"backend={jax.default_backend()})"
    )


if __name__ == "__main__":
    main()

"""Ragged-pooling L-rung microbench (VERDICT r04 item 10).

Measures the full ragged lookup step (gather + in-order lax.scan pooling,
ops/lookup_xla.group_pooled) at rowlen rungs L in {16, 32, 64, 128} on
the real chip, against the HBM-traffic floor: the scan is L dependent
adds, and the question is whether it stays memory-bound at the deep
rungs or falls off (which would justify a Pallas ragged-pooling kernel —
SURVEY §7 hard part 1 — per DESIGN.md §4's when-not-to-write-a-kernel
discipline).

Traffic model per step: gather reads B*C*L*d*4 B of table rows (upper
bound; pads clamp to row 0, cached), writes pooled B*C*d*4 B.  GB/s =
that traffic / step time; "flat GB/s across L" = still HBM-bound.

  python -m recom_tpu.tools.ragged_bench --out RAGGED_r05.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_rung(L: int, batch: int, n_cols: int, dim: int, rows: int,
               iters: int = 24) -> dict:
    import jax
    import jax.numpy as jnp

    from recom_tpu.ops import lookup_xla

    rng = np.random.default_rng(L)
    table = jax.device_put(
        rng.standard_normal((rows, dim)).astype(np.float32)
    )
    offs = np.zeros(n_cols, np.int64)
    code = np.asarray([i % 3 for i in range(n_cols)], np.int32)

    fn = jax.jit(
        lambda t, i: lookup_xla.group_pooled(t, i, offs, code)
    )
    # fresh id content per dispatch (transport caches repeat executions);
    # ~70% fill like real list features
    ids_pool = []
    for k in range(iters + 1):
        ids = rng.integers(0, rows, size=(batch, n_cols, L)).astype(np.int32)
        ids[rng.random(ids.shape) < 0.3] = -1
        ids_pool.append(jax.device_put(ids))
    jax.block_until_ready(ids_pool)

    t0 = time.perf_counter()
    out = fn(table, ids_pool[0])
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    # async loop, confirm every 8, NO D2H during timing
    pending = []
    t0 = time.perf_counter()
    for k, ids in enumerate(ids_pool[1:], 1):
        pending.append(fn(table, ids))
        if k % 8 == 0:
            jax.block_until_ready(pending)
            pending = []
    jax.block_until_ready(pending)
    per = (time.perf_counter() - t0) / iters

    gather_bytes = batch * n_cols * L * dim * 4
    out_bytes = batch * n_cols * dim * 4
    return {
        "L": L,
        "step_ms": round(per * 1e3, 4),
        "gather_gbs": round(gather_bytes / per / 1e9, 1),
        "total_gbs": round((gather_bytes + out_bytes) / per / 1e9, 1),
        "per_slot_us": round(per * 1e6 / L, 3),
        "warm_compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rungs", nargs="+", type=int,
                    default=[16, 32, 64, 128])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--cols", type=int, default=16)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    # exact combiner math (sqrtn divisors) computes in f64 exactly like
    # the Engine does (Engine sets this at construction; this tool calls
    # group_pooled directly)
    jax.config.update("jax_enable_x64", True)

    rows_out = []
    for L in args.rungs:
        r = bench_rung(L, args.batch, args.cols, args.dim, args.rows,
                       args.iters)
        rows_out.append(r)
        print(json.dumps(r), flush=True)
    # verdict: memory-bound if deep-rung bandwidth holds >= 60% of the
    # shallow-rung bandwidth (same gather stream, deeper scan)
    if len(rows_out) >= 2:
        ratio = rows_out[-1]["gather_gbs"] / max(
            1e-9, rows_out[0]["gather_gbs"]
        )
        verdict = (
            "scan stays HBM-bound at deep rungs; no Pallas ragged kernel "
            "needed (DESIGN.md #4 discipline)"
            if ratio >= 0.6 else
            "scan falls off HBM-bound at deep rungs; Pallas ragged "
            "pooling kernel is justified"
        )
    else:
        ratio, verdict = None, "need >= 2 rungs"
    out = {
        "workload": {
            "batch": args.batch, "cols": args.cols, "dim": args.dim,
            "rows": args.rows, "fill": 0.7,
        },
        "backend": jax.default_backend(),
        "rungs": rows_out,
        "deep_vs_shallow_bw_ratio": (
            round(ratio, 3) if ratio is not None else None
        ),
        "verdict": verdict,
        "cmd": "python -m recom_tpu.tools.ragged_bench --rungs "
               + " ".join(map(str, args.rungs)),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()

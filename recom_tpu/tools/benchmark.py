"""Serving benchmark CLI — the reference's benchmark_multi_thread /
benchmark_throughput equivalents (recom_examples.patch:100-440).

Mirrored flags:
  --batch-size / --num-iterations / --serve-workers   (threaded serving)
  --embedding-only    fetch the concat instead of the model output
                      (reference --embedding_only, ExtractGraphConcats)
  --profile           capture a jax.profiler trace around the timed run
                      (reference --cuda_profile / --timeline)
Inputs are generated spec-driven, like the reference's graph-driven
ConstructGraphInputs (patch:3363-3450).  Reports per-thread latency
p50/p99 and aggregate examples/s.

Threads share one Engine: jax dispatch is async and thread-safe, so N
serving workers pipeline host prep with device execution — the reference
achieves the same overlap with N session threads over one TF session.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from typing import Dict, List

import numpy as np


def percentile(xs: List[float], p: float) -> float:
    return float(np.percentile(np.asarray(xs), p))


def run_benchmark(
    model,
    batch_size: int = 512,
    num_iterations: int = 100,
    serve_workers: int = 1,
    embedding_only: bool = False,
    profile: bool = False,
    profile_dir: str = "/tmp/recom_tpu_profile",
    config=None,
    warmup: int = 10,
) -> Dict:
    import jax

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.runtime.host_prep import prepare_batch

    eng = Engine(model, config or EngineConfig())
    batches = [
        make_random_batch(model, batch_size, seed=1000 + w)
        for w in range(serve_workers)
    ]

    mode = ("concat",) if embedding_only else ()

    def serve_once(batch):
        prepared = eng.prepare(batch)
        fn = eng._get_jitted(prepared.signature, mode)
        arrays = eng.shard_batch_arrays(prepared.arrays)
        out = fn(eng.device_params, arrays)
        target = out["concat"] if embedding_only else out["output"]
        jax.block_until_ready(target)
        return target

    # warm-up triggers compilation (the reference's warm-up run triggers
    # the whole RECom pass + nvcc, recom_examples.patch:185-192)
    t0 = time.perf_counter()
    for b in batches:            # warm EVERY worker's signature
        serve_once(b)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        serve_once(batches[0])

    lat_per_thread: List[List[float]] = [[] for _ in range(serve_workers)]
    errors: List[BaseException] = []

    # each worker rotates over a pool of DISTINCT batches: a caching
    # transport (e.g. the remote tunnel here) serves repeated
    # (program, inputs) requests from cache and flatters the numbers;
    # on locally-attached hardware the rotation costs nothing.  Pool size
    # is capped (batch generation is host-side Python); iterations past
    # the pool repeat content — reported as distinct_batches so a reader
    # on a caching transport knows how many samples are certainly real.
    pool_n = min(num_iterations, 32)
    pools = [
        [batches[idx]] + [
            make_random_batch(
                model, batch_size, seed=5000 + idx * 1000 + j
            )
            for j in range(pool_n - 1)
        ]
        for idx in range(serve_workers)
    ]
    # warm every DISTINCT signature the pools produce (a pool batch whose
    # row lengths land in a different bucket would otherwise compile
    # inside the timed loop)
    seen_sigs = set()
    for pool in pools:
        for b in pool:
            p = eng.prepare(b)
            if p.signature not in seen_sigs:
                seen_sigs.add(p.signature)
                fn = eng._get_jitted(p.signature, mode)
                import jax as _jax

                _jax.block_until_ready(
                    fn(eng.device_params,
                       eng.shard_batch_arrays(p.arrays))[
                        "concat" if embedding_only else "output"
                    ]
                )

    def worker(idx: int):
        try:
            pool = pools[idx]
            for i in range(num_iterations):
                t = time.perf_counter()
                serve_once(pool[i % len(pool)])
                lat_per_thread[idx].append(time.perf_counter() - t)
        except BaseException as e:  # surfaced after join
            errors.append(e)

    if profile:
        jax.profiler.start_trace(profile_dir)
    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(serve_workers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    if profile:
        jax.profiler.stop_trace()
    if errors:
        raise errors[0]

    lats = [x for per in lat_per_thread for x in per]
    total_examples = serve_workers * num_iterations * batch_size
    return {
        "model": model.name,
        "batch_size": batch_size,
        "serve_workers": serve_workers,
        "iterations": num_iterations,
        "distinct_batches_per_worker": pool_n,
        "embedding_only": embedding_only,
        "compile_s": round(compile_s, 2),
        "latency_ms": {
            "mean": round(float(np.mean(lats)) * 1e3, 3),
            "p50": round(percentile(lats, 50) * 1e3, 3),
            "p99": round(percentile(lats, 99) * 1e3, 3),
        },
        "examples_per_s": round(total_examples / wall, 1),
        "profile_dir": profile_dir if profile else None,
    }


def main():
    from recom_tpu.utils.platform import honor_cpu_platform

    honor_cpu_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="micro100",
                    help="micro<N> | E | F | E@<scale> | criteo")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--num-iterations", type=int, default=100)
    ap.add_argument("--serve-workers", type=int, default=1)
    ap.add_argument("--embedding-only", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--mesh", default=None,
                    help="mesh shape, e.g. 2x4 (data x model)")
    ap.add_argument("--sla-ms", type=float, default=None,
                    help="SLA-pressure throughput mode (reference "
                         "benchmark_throughput): raise concurrency until "
                         "p99 exceeds this latency")
    args = ap.parse_args()

    from recom_tpu import EngineConfig
    from recom_tpu.models import (
        make_criteo_dlrm,
        make_microbenchmark_model,
        make_model_e,
        make_model_f,
    )

    name = args.model
    if name.startswith("micro"):
        model = make_microbenchmark_model(int(name[5:] or 100))
    elif name == "criteo":
        model = make_criteo_dlrm()
    elif name.startswith("E"):
        model = make_model_e(scale=float(name[2:]) if "@" in name else 1.0)
    elif name.startswith("F"):
        model = make_model_f(scale=float(name[2:]) if "@" in name else 1.0)
    else:
        raise SystemExit(f"unknown model {name}")

    config = EngineConfig()
    if args.mesh:
        config.mesh_shape = tuple(int(x) for x in args.mesh.split("x"))

    if args.sla_ms is not None:
        from recom_tpu import Engine
        from recom_tpu.models import make_random_batch
        from recom_tpu.runtime.server import throughput_under_sla

        eng = Engine(model, config)
        batches = [
            make_random_batch(model, args.batch_size, seed=1000 + i)
            for i in range(4)
        ]
        # distinct content per timed request (the tunnel transport caches
        # repeated (program, inputs) executions; a replayed batch pool
        # reads impossibly fast — CLAUDE.md bench invariant)
        result = throughput_under_sla(
            eng, batches, args.sla_ms, num_iterations=args.num_iterations,
            batch_factory=lambda k: make_random_batch(
                model, args.batch_size, seed=10_000 + k
            ),
        )
        print(json.dumps(result, indent=1))
        return

    result = run_benchmark(
        model,
        batch_size=args.batch_size,
        num_iterations=args.num_iterations,
        serve_workers=args.serve_workers,
        embedding_only=args.embedding_only,
        profile=args.profile,
        config=config,
    )
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()

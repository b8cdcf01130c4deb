"""Embedding-only lookup-bandwidth benchmark (``bench.py --embedding-only``).

Reference analogue: ``benchmark_multi_thread --embedding_only`` fetches the
big concat instead of the model output so only the FC/lookup machinery is
timed (recom_examples.patch:100-290).  On TPU the interesting question is
narrower: what fraction of HBM speed-of-light does the row-gather path
reach on the LARGE tables (the only memory-bound lookup — small tables run
as one-hot matmuls on the MXU and are FLOP-, not bandwidth-, shaped)?

Method: device-resident random ids, one jitted program per variant with an
inner ``lax.scan`` of K lookup rounds (ids perturbed per round so no
caching) — the scan amortizes dispatch/tunnel overhead, which at ~40us
per call would otherwise dominate sub-ms kernels.  Two variants:

* ``gather``  — pure ``jnp.take`` row gather: the speed-of-light probe.
* ``pooled``  — the production ``group_pooled`` path (gather + masked
  in-order combiner): what serving actually runs.

Bytes counted = rows_gathered x row_bytes per round x rounds (ids and
outputs excluded — the metric is table-read bandwidth, matching how the
reference counts fetch bytes).
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

# chip HBM peak by jax device_kind (GB/s); conservative public numbers
_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5": 2765.0,       # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # trillium
}


def _peak_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_GBPS.items():
        if kind.startswith(k):
            return v
    return float("nan")


def embedding_only_bench(
    eng, batch: Dict, iters: int = 100, rounds: int = 32,
    windows: int = 5,
) -> Dict:
    """One JSON-able dict: gather GB/s, pooled GB/s, fraction of peak."""
    import jax
    import jax.numpy as jnp

    from recom_tpu.ops import lookup_xla

    # the largest-stacked-bytes group on the gather (non-one-hot) path
    from recom_tpu.ops.lookup_xla import table_dim, table_num_rows
    from recom_tpu.ops.quant import QuantizedTable

    cand = [
        g for g in eng.compiled.groups if g.pallas_vocab is None
    ] or list(eng.compiled.groups)
    g = max(cand, key=lambda g: g.stacked_rows * g.dim)
    table = eng.device_params["stacked"][str(g.gid)]
    rows, d = int(table_num_rows(table)), int(table_dim(table))
    if isinstance(table, QuantizedTable):
        row_bytes = d + 4          # int8 row + the f32 per-row scale
    else:
        row_bytes = d * table.dtype.itemsize

    prep = eng.prepare(batch)
    bp = prep.batch_padded
    rl = dict(zip([q.gid for q in eng.compiled.groups], prep.rowlens))[g.gid]
    c = g.num_columns
    rng = np.random.Generator(np.random.PCG64(11))
    n_gather = bp * c * rl
    offsets = np.zeros(c, np.int32)      # ids already span the full stack
    comb = np.asarray(g.combiner_code)

    # every dispatch carries a UNIQUE salt input: the transport here
    # demonstrably caches repeated (program, inputs) executions (measured
    # "2.2x HBM peak" when inputs repeat), so each request must differ
    ids_dev = jax.device_put(
        rng.integers(0, rows, size=(bp, c, rl), dtype=np.int64).astype(
            np.int32
        )
    )
    jax.block_until_ready(ids_dev)

    def perturb(x, i):
        # new random-ish rows every round, no host traffic (odd Weyl
        # constant; int32 wraparound is defined and % keeps it in range)
        return (x + i * np.int32(1566083941)) % np.int32(rows)

    # table passed as an ARGUMENT (closing over a concrete Array would
    # bake it into the HLO as a constant — a multi-hundred-MB program)
    @jax.jit
    def run_gather(tbl, ids0, salt):
        def body(acc, i):
            rows_ = lookup_xla.gather_rows_f32(
                tbl, perturb(ids0, i + salt).reshape(-1)
            )
            return acc + rows_.sum(), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(rounds, dtype=jnp.int32)
        )
        return acc

    @jax.jit
    def run_pooled(tbl, ids0, salt):
        def body(acc, i):
            pooled = lookup_xla.group_pooled(
                tbl, perturb(ids0, i + salt), offsets, comb,
                exact_math=eng.config.exact_combiner_math,
            )
            return acc + pooled.sum(), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(rounds, dtype=jnp.int32)
        )
        return acc

    results = {}
    salt_counter = [0]
    for name, fn in (("gather", run_gather), ("pooled", run_pooled)):
        def call(fn=fn):
            salt_counter[0] += 1
            return fn(table, ids_dev, np.int32(salt_counter[0] * rounds))

        call().block_until_ready()                      # compile
        # 16 pipelined dispatches per window, ONE drain: the device
        # serializes executions, so wall time is device-bound and
        # dispatch/RTT noise amortizes 16x
        per = 16
        samples = []
        for _ in range(windows):
            t0 = time.perf_counter()
            outs = [call() for _ in range(per)]
            jax.block_until_ready(outs)
            samples.append((time.perf_counter() - t0) / (per * rounds))
        step_s = float(np.median(samples))
        results[name] = {
            "gbps": round(n_gather * row_bytes / step_s / 1e9, 2),
            "step_us": round(step_s * 1e6, 1),
            "windows_us": [round(s * 1e6 / 1, 1) for s in samples],
        }

    dev = jax.devices()[0]
    peak = _peak_for(dev)
    return {
        "metric": "embedding_lookup_gbps",
        "value": results["gather"]["gbps"],
        "unit": "GB/s",
        "vs_baseline": (
            round(results["gather"]["gbps"] / peak, 3)
            if peak == peak else None
        ),
        "detail": {
            "device": getattr(dev, "device_kind", str(dev)),
            "hbm_peak_gbps": peak if peak == peak else None,
            "table_rows": rows,
            "table_dim": d,
            "table_bytes": rows * row_bytes,
            "rows_gathered_per_step": n_gather,
            "bytes_per_step": n_gather * row_bytes,
            "gather": results["gather"],
            "pooled": results["pooled"],
            "group_gid": g.gid,
            "rounds_per_dispatch": rounds,
        },
    }

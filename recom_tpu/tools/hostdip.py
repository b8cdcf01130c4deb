"""F@2048 host-dip measurement (VERDICT r04 item 5).

Round 4 diagnosed model F's per-example host-prep inflation from batch
1024 -> 2048 as host memory-system capacity: the split/str hash stages'
~25 MB working set stops fitting the single core's cache share.  Round 5
removes those stages from the host entirely (device_hash verbatim
staging), so the fix claim is: per-example host prep at F@2048 within
1.2x of F@1024 under the DEFAULT (device-hash) config.  This tool
records both arms at both batches, quiet-min over N reps, CPU-only (no
device in the loop — it measures host prep).

  python -m recom_tpu.tools.hostdip --out HOSTDIP_r05.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(model, config_kw, batches, reps: int):
    from recom_tpu import Engine, EngineConfig

    out = {}
    eng = Engine(
        model, EngineConfig(batch_buckets=(1024, 2048), **config_kw),
        params=None,
    )
    for B in batches:
        from recom_tpu.models import make_random_batch

        batch = make_random_batch(model, B, seed=7)
        for _ in range(2):
            eng.prepare(batch)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            eng.prepare(batch)
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts) * 1e3
        out[B] = {
            "prep_ms_min": round(float(ts.min()), 3),
            "prep_ms_p50": round(float(np.median(ts)), 3),
            "per_example_us_min": round(float(ts.min()) * 1e3 / B, 3),
        }
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from recom_tpu.models import make_model_f

    model = make_model_f()
    res = {}
    for label, kw in (
        ("dev_hash_default", {}),
        ("host_arm", dict(device_hash=False)),
    ):
        res[label] = measure(model, kw, (1024, 2048), args.reps)
        a, b = res[label][1024], res[label][2048]
        res[label]["per_example_ratio_2048_vs_1024"] = round(
            b["per_example_us_min"] / a["per_example_us_min"], 3
        )
    ratio = res["dev_hash_default"]["per_example_ratio_2048_vs_1024"]
    out = {
        "model": "F",
        "arms": res,
        "target": "default-arm per-example prep at F@2048 within 1.2x of "
                  "F@1024 (VERDICT r04 item 5)",
        "target_met": bool(ratio <= 1.2),
        "cmd": "python -m recom_tpu.tools.hostdip",
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()

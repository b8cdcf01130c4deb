"""Full-model device-step bandwidth attribution (VERDICT r03 weak #6).

The microbenchmark gather reaches ~85% of HBM peak (EMBBW) while the full
model-E step implies only ~63% (BENCH lookup_gbps_floor) — this tool
attributes the gap.  Method: measure the device step of
  (a) the FULL model,
  (b) the same columns with an IDENTITY tower (embedding-only — the
      reference's --embedding_only protocol: fetch the big concat,
      recom_examples.patch:100-290), and
  (c) each lookup GROUP in isolation (single-group model, identity tower),
all with device-resident prepared inputs, fresh content per dispatch,
16-deep pipelined windows.  Then:

  tower_ms            = full - emb_only
  group share          = per-group isolated step
  fusion/overhead residual = emb_only - sum(groups)

and per-group effective GB/s = gather bytes / isolated step, so the
"which group is below speed-of-light" question gets a direct answer.

Usage (real TPU, run alone):
  python -m recom_tpu.tools.bw_breakdown --model E --batch 512 \
      --out BWBRK_r04.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def _identity_tower(model):
    from recom_tpu.ir.spec import TowerSpec

    return dataclasses.replace(
        model,
        tower=TowerSpec(
            arch="mlp", bottom_mlp=(), top_mlp=(),
            final_activation=None, init_seed=model.tower.init_seed,
        ),
    )


def _single_group_model(model, member_cols):
    keep = set(member_cols)
    cols = [c for c in model.columns if c.name in keep]
    tables = {
        t: s for t, s in model.tables.items()
        if any(c.lookup is not None and c.lookup.table == t for c in cols)
    }
    return dataclasses.replace(
        _identity_tower(model),
        name=f"{model.name}:g",
        tables=tables,
        columns=cols,
    )


def _device_step(eng, batches, windows=4, pipeline=12):
    """Median per-step device seconds with resident inputs, each prepared
    batch dispatched exactly once (fresh-content invariant)."""
    import jax

    preps = []
    sig = None
    for b in batches:
        p = eng.prepare(b)
        if sig is None:
            sig = p.signature
        if p.signature == sig:
            preps.append(jax.device_put(p.arrays))
    jax.block_until_ready(preps)
    fn = eng._get_jitted(sig)
    jax.block_until_ready(fn(eng.device_params, preps[0])["output"])
    timed = preps[1:]
    per = max(1, min(pipeline, len(timed) // windows))
    samples = []
    i = 0
    while i + per <= len(timed) and len(samples) < windows:
        t0 = time.perf_counter()
        outs = [fn(eng.device_params, a) for a in timed[i : i + per]]
        jax.block_until_ready([o["output"] for o in outs])
        samples.append((time.perf_counter() - t0) / per)
        i += per
    return float(np.median(samples)), [round(s * 1e3, 3) for s in samples]


def run(model_name: str, batch: int, n_inputs: int = 40) -> dict:
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.tools.ae_sweep import _make_model
    from recom_tpu.tools.embedding_bw import _peak_for
    from recom_tpu.utils.params import init_model_params

    import jax

    model = _make_model(model_name)
    np_params = init_model_params(model)
    itemsize = 4

    def fresh(n, seed0):
        return [
            make_random_batch(model, batch, seed=seed0 + i)
            for i in range(n)
        ]

    out = {
        "model": model.name, "batch": batch,
        "cmd": f"python -m recom_tpu.tools.bw_breakdown "
               f"--model {model_name} --batch {batch}",
        "protocol": "device-resident inputs, fresh content per dispatch, "
                    "12-deep pipelined windows; identity-tower variants "
                    "isolate the embedding stage (reference "
                    "--embedding_only, recom_examples.patch:100-290)",
    }

    # (a) full model
    eng = Engine(model, EngineConfig(), params=np_params)
    full_s, full_w = _device_step(eng, fresh(n_inputs, 40_000))
    groups_meta = [
        (g.gid, [m.column.name for m in g.members], g.num_columns,
         g.dim, g.pallas_vocab is not None)
        for g in eng.compiled.groups
    ]
    prep = eng.prepare(fresh(1, 77_777)[0])
    rl_by_gid = dict(
        zip([g.gid for g in eng.compiled.groups], prep.rowlens)
    )
    bp = prep.batch_padded
    gathered = {
        gid: bp * ncol * rl_by_gid[gid] * dim * itemsize
        for gid, _, ncol, dim, _ in groups_meta
    }
    out["full_step_ms"] = round(full_s * 1e3, 3)
    out["full_windows_ms"] = full_w

    # (b) identity tower (embedding-only)
    emb_model = _identity_tower(model)
    emb_eng = Engine(
        emb_model, EngineConfig(), params=init_model_params(emb_model)
    )
    emb_s, emb_w = _device_step(emb_eng, fresh(n_inputs, 50_000))
    out["emb_only_step_ms"] = round(emb_s * 1e3, 3)
    out["emb_only_windows_ms"] = emb_w
    out["tower_ms"] = round((full_s - emb_s) * 1e3, 3)

    # (c) per group in isolation
    rows = []
    for gid, names, ncol, dim, onehot in groups_meta:
        gm = _single_group_model(model, names)
        geng = Engine(gm, EngineConfig(), params=init_model_params(gm))
        gs, gw = _device_step(
            geng, fresh(max(14, n_inputs // 2), 60_000 + gid * 997)
        )
        rows.append({
            "gid": gid, "columns": ncol, "dim": dim,
            "kernel": "onehot_mxu" if onehot else "gather",
            "step_ms": round(gs * 1e3, 3),
            "windows_ms": gw,
            "gather_bytes": gathered[gid],
            "gbps": round(gathered[gid] / gs / 1e9, 2),
        })
    out["groups"] = rows
    sum_groups = sum(r["step_ms"] for r in rows)
    out["sum_groups_ms"] = round(sum_groups, 3)
    out["fusion_residual_ms"] = round(
        out["emb_only_step_ms"] - sum_groups, 3
    )
    total_bytes = sum(gathered.values())
    out["lookup_gbps_full"] = round(total_bytes / full_s / 1e9, 2)
    out["lookup_gbps_emb_only"] = round(total_bytes / emb_s / 1e9, 2)
    peak = _peak_for(jax.devices()[0])
    out["hbm_peak_gbps"] = peak if peak == peak else None
    if peak == peak:
        out["emb_only_frac_of_peak"] = round(
            out["lookup_gbps_emb_only"] / peak, 3
        )
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="E")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--inputs", type=int, default=40)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = run(args.model, args.batch, args.inputs)
    s = json.dumps(res, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s + "\n")
    print(s)


if __name__ == "__main__":
    main()

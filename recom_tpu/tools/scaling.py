"""Sharded-lookup scaling sweep — the measurement protocol for the
BASELINE.json target ">=90% all-to-all scaling efficiency at 2+ hosts".

Sweeps model-axis sizes m in {1, 2, 4, ...} over the available devices,
holding the PER-SHARD table size constant (weak scaling: a 2x bigger mesh
serves a 2x bigger table at the same batch), and reports examples/s plus
efficiency = throughput(m) / throughput(1).  Runs on any mesh: virtual CPU
devices validate the protocol and the collectives; real TPU slices produce
the headline numbers.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m recom_tpu.tools.scaling --rows-per-shard 65536 --dim 64
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sweep(
    rows_per_shard: int = 1 << 16,
    dim: int = 64,
    batch: int = 1024,
    n_columns: int = 16,
    rowlen: int = 1,
    iters: int = 20,
    comm: str = "all_to_all",
    mesh_sizes=None,
    chunks: int = 1,
):
    import jax
    import jax.numpy as jnp

    from recom_tpu.parallel import (
        all_to_all_group_pooled,
        make_mesh,
        sharded_group_pooled,
    )
    from recom_tpu.parallel.sharded_lookup import (
        pad_rows_to_multiple,
        stripe_rows,
    )

    n_dev = len(jax.devices())
    if mesh_sizes is None:
        mesh_sizes = [m for m in (1, 2, 4, 8, 16, 32) if m <= n_dev]

    rng = np.random.default_rng(0)
    results = []
    base_rate = None
    for m in mesh_sizes:
        rows = rows_per_shard * m
        # one wide stacked "table" of n_columns equal slices (weak scaling:
        # rows grow with m); ids uniform over the full range
        table = rng.standard_normal((rows, dim)).astype(np.float32)
        tp = stripe_rows(pad_rows_to_multiple(table, m), m) if m > 1 else table
        per_col = rows // n_columns
        offs = (np.arange(n_columns) * per_col).astype(np.int32)
        code = np.zeros((n_columns,), np.int32)
        # DISTINCT id content for every timed dispatch (+1 warm array):
        # the tunnel transport caches repeated (program, inputs)
        # executions, so re-dispatching one array measures cache hits
        # (CLAUDE.md bench invariant)
        ids_all = [
            rng.integers(
                0, per_col, size=(batch, n_columns, rowlen)
            ).astype(np.int32)
            for _ in range(iters + 1)
        ]

        mesh = make_mesh((1, m))
        if m == 1:
            from recom_tpu.ops import lookup_xla

            fn = jax.jit(
                lambda t, i: lookup_xla.group_pooled(t, i, offs, code)
            )
        elif comm == "all_to_all":
            fn_full = jax.jit(
                lambda t, i, _mesh=mesh: all_to_all_group_pooled(
                    _mesh, t, i, offs, code, chunks=chunks
                )
            )

            def fn(t, i):
                return fn_full(t, i)[0]
        else:
            fn = jax.jit(
                lambda t, i, _mesh=mesh: sharded_group_pooled(
                    _mesh, t, i, offs, code
                )
            )

        from jax.sharding import NamedSharding, PartitionSpec as P

        if m > 1:
            td = jax.device_put(
                jnp.asarray(tp), NamedSharding(mesh, P("model", None))
            )
            id_sh = NamedSharding(mesh, P("data", None, None))
            idds = [jax.device_put(jnp.asarray(a), id_sh) for a in ids_all]
        else:
            td = jnp.asarray(tp)
            idds = [jnp.asarray(a) for a in ids_all]
        jax.block_until_ready(idds)       # uploads land BEFORE timing

        warm, timed = idds[0], idds[1:]
        out = fn(td, warm)
        jax.block_until_ready(out)
        if m > 1 and comm == "all_to_all":
            # efficiency numbers are meaningless if ids were dropped;
            # uniform ids make every timed array statistically identical
            # to the checked one
            ovf = int(fn_full(td, warm)[1])
            assert ovf == 0, (
                f"a2a overflow {ovf} at m={m}; raise capacity_factor"
            )
        t0 = time.perf_counter()
        for a in timed:                   # each dispatched exactly once
            out = fn(td, a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / len(timed)
        rate = batch / dt
        if base_rate is None:
            base_rate = rate
        results.append(
            {
                "model_axis": m,
                "rows_total": rows,
                "latency_ms": round(dt * 1e3, 3),
                "examples_per_s": round(rate, 1),
                "efficiency": round(rate / base_rate, 3),
            }
        )
    # efficiency vs the FIRST comm-paying mesh (m=1 skips collectives
    # entirely, so rate(m)/rate(1) conflates collective cost with the
    # emulation overhead of running collectives at all — VERDICT r03
    # item 3a): the m>=2 ratio isolates how collective cost GROWS
    base2 = next((r["examples_per_s"] for r in results
                  if r["model_axis"] >= 2), None)
    if base2:
        for r in results:
            if r["model_axis"] >= 2:
                r["efficiency_vs_m2"] = round(
                    r["examples_per_s"] / base2, 3
                )
    return results


def wire_model(
    m: int, batch: int, n_columns: int, rowlen: int, dim: int,
    comm: str, capacity_factor: float = 2.0, dtype_bytes: int = 4,
) -> dict:
    """Per-DEVICE bytes moved across the model axis per step — the
    denominator that turns measured efficiency into an interpretable
    number (how much of the loss is communication vs imbalance).

    all_to_all (see all_to_all_lookup.py):
      ids out:   [m, cap] int32, (m-1)/m crosses the wire
      rows back: [m, cap, d] f32, (m-1)/m crosses
      + final all-gather of pooled [b_my, C, d] over model: each device
        receives (m-1) shards of b_my rows.
    psum (sharded_lookup.py): ring all-reduce of pooled [b_loc, C, d]:
      2 x (m-1)/m of the buffer per device.
    """
    from recom_tpu.parallel.all_to_all_lookup import a2a_capacity

    if m <= 1:
        return {"bytes_per_device": 0}
    b_loc = batch            # data axis = 1 in this sweep
    b_my = b_loc // m
    pooled_bytes = b_loc * n_columns * dim * dtype_bytes
    if comm == "all_to_all":
        n = b_my * n_columns * rowlen
        cap = a2a_capacity(n, m, capacity_factor)
        frac = (m - 1) / m
        ids_b = m * cap * 4 * frac
        rows_b = m * cap * dim * dtype_bytes * frac
        gather_b = (m - 1) * b_my * n_columns * dim * dtype_bytes
        return {
            "bytes_per_device": int(ids_b + rows_b + gather_b),
            "ids_bytes": int(ids_b),
            "rows_bytes": int(rows_b),
            "pooled_allgather_bytes": int(gather_b),
            "capacity_per_dest": cap,
        }
    return {
        "bytes_per_device": int(2 * pooled_bytes * (m - 1) / m),
        "allreduce_buffer_bytes": pooled_bytes,
    }


def ici_roofline(
    wire: dict, m: int, device_step_s: float, ici_gbps: float
) -> dict:
    """Projected real-hardware scaling efficiency from the analytic comm
    volume (VERDICT r03 item 3b).

    The CPU-mesh sweep measures collectives under host-thread EMULATION —
    its 19-21% "efficiency" is emulation overhead, not the algorithm.  On
    a real slice the comm cost is bytes/ICI-bandwidth.  Given the measured
    single-chip device step time (the per-device compute that weak scaling
    holds constant) and the per-device bytes the exchange moves, project:

      serial bound:  eff = t_compute / (t_compute + t_comm)
      overlap bound: eff = t_compute / max(t_compute, t_comm)

    ``ici_gbps``: per-chip ICI bandwidth in GB/s (v5e public spec: 1600
    Gbps = 200 GB/s aggregate per chip; override --ici-gbps for other
    generations)."""
    bytes_dev = wire.get("bytes_per_device", 0)
    if not bytes_dev or m <= 1 or device_step_s <= 0:
        return {}
    t_comm = bytes_dev / (ici_gbps * 1e9)
    return {
        "bytes_per_device": bytes_dev,
        "t_comm_ms": round(t_comm * 1e3, 4),
        "t_compute_ms": round(device_step_s * 1e3, 4),
        "ici_gbps_assumed": ici_gbps,
        "projected_efficiency_serial": round(
            device_step_s / (device_step_s + t_comm), 3
        ),
        "projected_efficiency_overlap": round(
            min(1.0, device_step_s / max(device_step_s, t_comm)), 3
        ),
    }


def allgather_elision_probe(args) -> dict:
    """VERDICT r03 item 3c: does the trailing pooled all-gather vanish
    when the consumer accepts (data, model)-sharded batch rows?

    all_to_all_group_pooled already RETURNS its pooled output sharded
    P((data, model)) (all_to_all_lookup.py out_specs) — whether an
    all-gather materializes is decided by the consumer GSPMD compiles
    against.  Compile two programs on the mesh and COUNT all-gather ops
    in the optimized HLO: (a) a tower-like consumer that is happy with
    any batch sharding (matmul with replicated weights), (b) a consumer
    that demands replicated output.  (a) must compile with fewer
    all-gathers over the model axis."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recom_tpu.parallel import all_to_all_group_pooled, make_mesh
    from recom_tpu.parallel.sharded_lookup import (
        pad_rows_to_multiple,
        stripe_rows,
    )

    n_dev = len(jax.devices())
    m = min(4, n_dev)
    if m < 2:
        return {"skipped": f"need >= 2 devices, have {n_dev}"}
    mesh = make_mesh((1, m))
    rng = np.random.default_rng(0)
    rows = args.rows_per_shard * m
    dim, cols = args.dim, args.columns
    table = stripe_rows(
        pad_rows_to_multiple(
            rng.standard_normal((rows, dim)).astype(np.float32), m
        ), m,
    )
    per_col = rows // cols
    offs = (np.arange(cols) * per_col).astype(np.int32)
    code = np.zeros((cols,), np.int32)
    ids = rng.integers(
        0, per_col, size=(args.batch, cols, 1)
    ).astype(np.int32)
    w = rng.standard_normal((cols * dim, 8)).astype(np.float32)

    td = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P("model", None))
    )
    idd = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P("data", None, None))
    )
    wd = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P()))

    def tower_consumer(t, i, wt):
        pooled, ov = all_to_all_group_pooled(mesh, t, i, offs, code)
        flat = pooled.reshape(pooled.shape[0], cols * dim)
        return jnp.sum(flat @ wt), ov     # batch-sharding-agnostic

    def replicated_consumer(t, i):
        pooled, ov = all_to_all_group_pooled(mesh, t, i, offs, code)
        rep = jax.lax.with_sharding_constraint(
            pooled, NamedSharding(mesh, P("data", None, None))
        )                                  # force model-axis replication
        return rep, ov

    out = {"model_axis": m}
    for name, fn, fargs in (
        ("sharded_consumer", tower_consumer, (td, idd, wd)),
        ("replicated_consumer", replicated_consumer, (td, idd)),
    ):
        lowered = jax.jit(fn).lower(*fargs)
        hlo = lowered.compile().as_text()
        out[name] = {
            "allgather_ops": hlo.count("all-gather"),
            "alltoall_ops": hlo.count("all-to-all"),
        }
    out["allgather_elided"] = (
        out["sharded_consumer"]["allgather_ops"]
        < out["replicated_consumer"]["allgather_ops"]
    )
    return out


def run_artifact(args) -> dict:
    """Both comm strategies + wire models, one JSON artifact
    (SCALING_r*.json — VERDICT r01 missing #4: a committed scaling
    result, not just a protocol)."""
    import jax

    out = {
        "protocol": "weak scaling: rows_per_shard const, table grows with "
                    "model axis; efficiency = rate(m)/rate(1)",
        "devices": len(jax.devices()),
        "backend": jax.default_backend(),
        "config": {
            "rows_per_shard": args.rows_per_shard, "dim": args.dim,
            "batch": args.batch, "columns": args.columns,
            "rowlen": args.rowlen, "iters": args.iters,
        },
        "sweeps": {},
    }
    out["config"]["chunks"] = args.chunks
    for comm in ("all_to_all", "psum"):
        rows = sweep(
            rows_per_shard=args.rows_per_shard, dim=args.dim,
            batch=args.batch, n_columns=args.columns,
            rowlen=args.rowlen, iters=args.iters, comm=comm,
            chunks=args.chunks,
        )
        t1 = next(
            (r["latency_ms"] / 1e3 for r in rows if r["model_axis"] == 1),
            0.0,
        )
        device_step_s = args.device_step_ms / 1e3 or t1
        for r in rows:
            r["wire"] = wire_model(
                r["model_axis"], args.batch, args.columns, args.rowlen,
                args.dim, comm,
            )
            rl = ici_roofline(
                r["wire"], r["model_axis"], device_step_s, args.ici_gbps
            )
            if rl:
                r["ici_roofline"] = rl
        out["sweeps"][comm] = rows
    out["roofline_note"] = (
        "CPU-mesh efficiency measures collective EMULATION on host "
        "threads, not the algorithm; ici_roofline projects real-slice "
        "efficiency from the analytic per-device comm bytes vs ICI "
        "bandwidth, anchored on --device-step-ms (measured single-chip "
        "device step; falls back to the m=1 sweep latency of THIS host)."
    )
    out["allgather_elision"] = allgather_elision_probe(args)
    # chunked-vs-monolithic A/B at the weak-scaling endpoints: the m8/m2
    # ratio is THE overlap-sensitive number (VERDICT r04 item 3); medians
    # over 3 reps because single CPU-emulation runs vary +-10%
    import numpy as np

    n_dev = out["devices"]
    if n_dev >= 8:
        ab = {}
        for ck in (1, args.chunks):
            effs = []
            for _ in range(3):
                rs = sweep(
                    rows_per_shard=args.rows_per_shard, dim=args.dim,
                    batch=args.batch, n_columns=args.columns,
                    rowlen=args.rowlen, iters=max(8, args.iters // 2),
                    comm="all_to_all", mesh_sizes=[2, 8], chunks=ck,
                )
                by = {r["model_axis"]: r["examples_per_s"] for r in rs}
                effs.append(by[8] / by[2])
            ab[f"chunks_{ck}"] = {
                "m8_vs_m2_reps": [round(e, 3) for e in effs],
                "m8_vs_m2_median": round(float(np.median(effs)), 3),
            }
        out["chunks_ab"] = ab
    return out


def main():
    from recom_tpu.utils.platform import honor_cpu_platform

    honor_cpu_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows-per-shard", type=int, default=1 << 16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--columns", type=int, default=16)
    ap.add_argument("--rowlen", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunks", type=int, default=2,
                    help="a2a row-return pipeline chunks (EngineConfig."
                         "a2a_chunks analogue; 2 = default overlap)")
    ap.add_argument("--comm", default="all_to_all",
                    choices=["all_to_all", "psum", "both"])
    ap.add_argument("--ici-gbps", type=float, default=200.0,
                    help="per-chip ICI bandwidth GB/s for the roofline "
                         "(default: v5e public 1600 Gbps)")
    ap.add_argument("--device-step-ms", type=float, default=0.0,
                    help="measured single-chip device step (ms) anchoring "
                         "the roofline (e.g. BENCH device_latency_ms); "
                         "0 = use the m=1 sweep latency of this host")
    ap.add_argument("--artifact", default=None,
                    help="write both-strategy JSON artifact to this path")
    args = ap.parse_args()
    if args.artifact or args.comm == "both":
        out = run_artifact(args)
        s = json.dumps(out, indent=1)
        if args.artifact:
            with open(args.artifact, "w") as f:
                f.write(s + "\n")
        print(s)
        return
    results = sweep(
        rows_per_shard=args.rows_per_shard,
        dim=args.dim,
        batch=args.batch,
        n_columns=args.columns,
        rowlen=args.rowlen,
        iters=args.iters,
        comm=args.comm,
        chunks=args.chunks,
    )
    print(json.dumps({"comm": args.comm, "sweep": results}, indent=1))


if __name__ == "__main__":
    main()


# cited protocol: reference AE latency/throughput sweep discipline
# (AE/build_and_run.py:57-80 — warm-up then timed iterations per config);
# scaling efficiency target from BASELINE.json north star.

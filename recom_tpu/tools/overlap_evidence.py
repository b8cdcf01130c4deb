"""Compiled-HLO evidence for a2a comm/compute overlap (VERDICT r04 #3).

AOT-compiles the sharded a2a lookup for a REAL TPU topology (v5e 2x4 by
default — jax.experimental.topologies needs no devices) at chunks=1 vs
chunks=N with --xla_tpu_enable_async_all_to_all, then proves from the
post-scheduling HLO that

  * the chunked program carries multiple independent row-return
    all-to-alls (the monolithic program has exactly one), and
  * the scheduler emitted all-to-all-start/done ASYNC pairs with compute
    ops (the per-chunk restoration fusions) placed BETWEEN start and done
    — i.e. chunk k's restore hides chunk k+1's ICI time.

Writes one JSON artifact:
  python -m recom_tpu.tools.overlap_evidence --out OVERLAP_r05.json
"""

from __future__ import annotations

import argparse
import json
import re


def _compile_hlo(mesh, chunks: int, shape, compiler_options):
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recom_tpu.parallel.all_to_all_lookup import all_to_all_group_pooled

    rows, d, b, c, l = shape
    offs = np.zeros(c, np.int64)
    code = np.zeros(c, np.int32)
    tbl = jax.ShapeDtypeStruct(
        (rows, d), jnp.float32, sharding=NamedSharding(mesh, P("model", None))
    )
    ids = jax.ShapeDtypeStruct(
        (b, c, l), jnp.int32,
        sharding=NamedSharding(mesh, P("data", None, None)),
    )
    fn = jax.jit(
        lambda t, i: all_to_all_group_pooled(
            mesh, t, i, offs, code, chunks=chunks
        )
    )
    return fn.lower(tbl, ids).compile(
        compiler_options=compiler_options
    ).as_text()


def analyze(hlo: str) -> dict:
    """Counts + the schedule-order opcode trace between the first and last
    row-return exchange (f32 payload all-to-alls; the s32 id exchange is
    excluded)."""
    lines = hlo.splitlines()

    def opcode(l):
        # "%name = SHAPE opcode(%operand..." — SHAPE may be a tuple with
        # spaces, so anchor on the "opcode(%" call syntax instead
        if " = " not in l:
            return None, None
        m = re.match(r"\s*%?([\w.\-]+) = ", l)
        c = re.search(r" ([a-z][\w\-]*)\(%?", l)
        return (m.group(1) if m else None), (c.group(1) if c else None)

    ret_rows = []
    for i, l in enumerate(lines):
        name, op = opcode(l)
        if op in ("all-to-all", "all-to-all-start") and "f32" in l:
            ret_rows.append(i)
    async_pairs = sum(
        1 for l in lines
        if opcode(l)[1] == "all-to-all-start" and "f32" in l
    )
    trace = []
    compute_between_pairs = 0
    open_pairs = 0
    if ret_rows:
        for l in lines[ret_rows[0]: ret_rows[-1] + 12]:
            name, op = opcode(l)
            if op is None:
                continue
            trace.append(op)
            if op == "all-to-all-start":
                open_pairs += 1
            elif op == "all-to-all-done":
                open_pairs = max(0, open_pairs - 1)
            elif open_pairs > 0 and op in (
                "fusion", "copy", "sort", "bitcast", "all-reduce"
            ):
                compute_between_pairs += 1
    return {
        "return_exchange_count": len(ret_rows),
        "async_start_done_pairs": async_pairs,
        "compute_ops_inside_async_pairs": compute_between_pairs,
        "schedule_trace": trace[:80],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(args.topology, "tpu")
    dd, mm = (int(x) for x in args.topology.split(":")[1].split("x"))
    mesh = Mesh(np.array(topo.devices).reshape(dd, mm), ("data", "model"))

    shape = (4096, 32, 1024, 4, 8)      # rows, d, B, C, L
    opts = {"xla_tpu_enable_async_all_to_all": "True"}
    out = {
        "topology": args.topology,
        "workload": dict(zip(("rows", "d", "B", "C", "L"), shape)),
        "compiler_options": opts,
        "cmd": (
            f"python -m recom_tpu.tools.overlap_evidence "
            f"--topology {args.topology} --chunks {args.chunks}"
        ),
    }
    for label, ck in (("monolithic", 1), ("chunked", args.chunks)):
        hlo = _compile_hlo(mesh, ck, shape, opts)
        out[label] = {"chunks": ck, **analyze(hlo)}
    mono, chk = out["monolithic"], out["chunked"]
    out["overlap_proven"] = bool(
        chk["return_exchange_count"] > mono["return_exchange_count"]
        and chk["async_start_done_pairs"] >= 2
        and chk["compute_ops_inside_async_pairs"] > 0
    )
    js = json.dumps(out, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()

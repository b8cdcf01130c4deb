"""Multi-host sharded-lookup demo / validation.

Runs the row-sharded embedding lookup with the MODEL axis spanning OS
processes (the stand-in for hosts: 2 processes x 4 virtual CPU devices
each), exercising cross-process Gloo collectives for both comm strategies,
and checks the result bit-exactly (all_to_all) / to fp tolerance (psum)
against the single-process kernel.  This is the executable form of the
BASELINE "tables row-sharded over 2+ hosts" configuration; on real TPU
pods the same code rides ICI/DCN instead of Gloo.

Spawn mode (one command, forks the workers):
  python -m recom_tpu.tools.multihost_demo --spawn 2

SPMD mode (one invocation per host, as on a real pod):
  python -m recom_tpu.tools.multihost_demo \
      --coordinator host0:12355 --num-processes 2 --process-id <i>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(coordinator: str, num_processes: int, process_id: int,
           local_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # exact combiner math

    from recom_tpu.parallel import multihost

    multihost.init(coordinator, num_processes, process_id)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from recom_tpu.ops import lookup_xla
    from recom_tpu.parallel import (
        all_to_all_group_pooled,
        sharded_group_pooled,
    )
    from recom_tpu.parallel.sharded_lookup import (
        pad_rows_to_multiple,
        stripe_rows,
    )

    mesh = multihost.global_mesh()
    m = mesh.shape["model"]
    rng = np.random.default_rng(0)
    C, V, d, B, L = 4, 256, 8, 32, 3
    table = rng.standard_normal((C * V, d)).astype(np.float32)
    striped = stripe_rows(pad_rows_to_multiple(table, m), m)
    ids = rng.integers(0, V, size=(B, C, L)).astype(np.int32)
    ids[rng.random((B, C, L)) < 0.25] = -1
    offs = (np.arange(C) * V).astype(np.int32)
    code = np.array([0, 1, 2, 1], np.int32)

    tdev = multihost.from_global(mesh, P("model", None), striped)
    idev = multihost.from_global(mesh, P("data", None, None), ids)

    ref = np.asarray(
        lookup_xla.group_pooled(jnp.asarray(table), jnp.asarray(ids), offs, code)
    )

    out_a2a, overflow = jax.jit(
        lambda t, i: all_to_all_group_pooled(mesh, t, i, offs, code)
    )(tdev, idev)
    got = multihost.gather_to_host(out_a2a)[:B]
    ovf = int(multihost.gather_to_host(overflow).ravel()[0])
    assert ovf == 0, f"a2a overflow {ovf}"
    np.testing.assert_array_equal(got, ref)

    out_psum = jax.jit(
        lambda t, i: sharded_group_pooled(mesh, t, i, offs, code)
    )(tdev, idev)
    got2 = multihost.gather_to_host(out_psum)[:B]
    np.testing.assert_allclose(got2, ref, atol=1e-6, rtol=1e-6)

    # online row update on the striped cross-process layout (the
    # Engine.update_table_rows mechanism, called in SPMD lockstep): scatter
    # fresh rows at the striped physical indices, then the next lookup must
    # serve the new values bit-exactly
    from jax.sharding import NamedSharding

    upd_rows = rng.choice(C * V, size=16, replace=False).astype(np.int64)
    upd_vals = rng.standard_normal((16, d)).astype(np.float32)
    per = striped.shape[0] // m
    phys = (upd_rows % m) * per + upd_rows // m
    tdev2 = jax.jit(
        lambda t, i, v: t.at[i].set(v),
        out_shardings=NamedSharding(mesh, P("model", None)),
    )(tdev, phys, upd_vals)
    table2 = table.copy()
    table2[upd_rows] = upd_vals
    ref2 = np.asarray(
        lookup_xla.group_pooled(
            jnp.asarray(table2), jnp.asarray(ids), offs, code
        )
    )
    out_upd, _ = jax.jit(
        lambda t, i: all_to_all_group_pooled(mesh, t, i, offs, code)
    )(tdev2, idev)
    got3 = multihost.gather_to_host(out_upd)[:B]
    np.testing.assert_array_equal(got3, ref2)

    if process_id == 0:
        print(
            f"MULTIHOST OK: {num_processes} processes x "
            f"{local_devices} devices, model axis {m}, "
            "all_to_all bit-exact, psum within 1e-6, "
            "striped row update bit-exact",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spawn", type=int, default=None,
                    help="fork N local worker processes (demo/test mode)")
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    if args.spawn:
        procs = [
            subprocess.Popen(
                [
                    sys.executable, "-m", "recom_tpu.tools.multihost_demo",
                    "--coordinator", args.coordinator,
                    "--num-processes", str(args.spawn),
                    "--process-id", str(i),
                    "--local-devices", str(args.local_devices),
                ],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(args.spawn)
        ]
        ok = True
        try:
            for i, p in enumerate(procs):
                out, _ = p.communicate(timeout=600)
                text = out.decode()
                if p.returncode != 0:
                    ok = False
                    print(f"--- worker {i} FAILED ---\n{text[-2000:]}")
                elif "MULTIHOST OK" in text:
                    print(text.strip().splitlines()[-1])
        finally:
            for p in procs:      # a hung worker must not orphan the rest
                if p.poll() is None:
                    p.kill()
        sys.exit(0 if ok else 1)

    assert args.process_id is not None, "--process-id required (or --spawn)"
    worker(
        args.coordinator, args.num_processes, args.process_id,
        args.local_devices,
    )


if __name__ == "__main__":
    main()

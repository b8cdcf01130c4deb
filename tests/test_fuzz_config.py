"""Config-matrix fuzzer: random models under random ENGINE CONFIGS.

test_fuzz.py sweeps random model COMPOSITIONS at a near-default config;
this file sweeps the CONFIG axes against them — use_pallas x table_dtype
x wire_pack x dedup_subcolumns x mesh/shard_comm/shard_rows_above — the
interaction surface where a feature that is correct alone can break
another (e.g. quantized tables under row sharding, wire packing with
device bucketize, Pallas groups next to sharded groups).

Expected-output rules derive from the config:
  * quantized dtypes compare against the oracle running on the engine's
    OWN dequantized storage (export_params) — the quant exactness
    contract (tables are lossy, lookup math is not);
  * a psum-sharded engine is 1e-6-close (documented tolerance);
  * everything else is BIT-exact.
"""

import numpy as np
import pytest

import jax

from recom_tpu import Engine, EngineConfig
from recom_tpu.oracle import OracleModel
from recom_tpu.runtime.checkpoint import export_params

from test_fuzz import random_batch, random_model

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def random_config(rng) -> EngineConfig:
    mesh = None
    if len(jax.devices()) >= 8 and rng.random() < 0.45:
        mesh = ((2, 4), (4, 2), (8, 1))[int(rng.integers(3))]
    dtype = ("float32", "float32", "bfloat16", "int8")[int(rng.integers(4))]
    return EngineConfig(
        use_pallas=bool(rng.integers(2)),
        interpret=True,
        batch_buckets=((64,), (8, 64))[int(rng.integers(2))],
        rowlen_buckets=(
            (1, 2, 4, 8, 12, 16, 32, 64, 128),   # default ladder
            (1, 4, 16, 64, 128),                 # coarse ladder
            (128,),                              # one max-pad bucket
        )[int(rng.integers(3))],
        table_dtype=dtype,
        wire_pack=bool(rng.integers(2)),
        # False routes raw f32 through the fused bucketize+one-hot Pallas
        # kernel (interpret mode on CPU) / the device-bucketize XLA path
        host_bucketize=bool(rng.integers(2)),
        dedup_subcolumns=bool(rng.integers(2)),
        mesh_shape=mesh,
        shard_comm=("all_to_all", "psum")[int(rng.integers(2))]
        if mesh
        else "auto",
        # low threshold shards most groups; high leaves all replicated
        shard_rows_above=int(rng.choice([64, 1 << 22])),
    )


def run_config_seed(seed: int) -> None:
    rng = np.random.default_rng(7_000_000 + seed)
    model = random_model(rng, n_cols=int(rng.integers(3, 9)))
    cfg = random_config(rng)
    batch = random_batch(rng, model, batch=int(rng.integers(5, 40)))

    eng = Engine(model, cfg)
    out = eng.predict(batch, return_pooled=True, return_concat=True)

    params = (
        export_params(eng) if cfg.table_dtype != "float32" else None
    )
    ref = OracleModel(model, params=params).forward(batch)

    psum_sharded = (
        cfg.mesh_shape is not None
        and cfg.shard_comm == "psum"
        and bool(eng._sharded_gids)
    )
    ctx = (
        f"seed={seed} dtype={cfg.table_dtype} pallas={cfg.use_pallas} "
        f"wire={cfg.wire_pack} hostbz={cfg.host_bucketize} "
        f"dedup={cfg.dedup_subcolumns} bb={cfg.batch_buckets} "
        f"rl={cfg.rowlen_buckets} mesh={cfg.mesh_shape} "
        f"comm={cfg.shard_comm} thresh={cfg.shard_rows_above}"
    )
    for c, r in ref["pooled"].items():
        if psum_sharded:
            np.testing.assert_allclose(
                out["pooled"][c], r, rtol=1e-6, atol=1e-6,
                err_msg=f"{ctx} col={c}",
            )
        else:
            np.testing.assert_array_equal(
                out["pooled"][c], r, err_msg=f"{ctx} col={c}"
            )
    if any(c.post for c in model.columns) or psum_sharded:
        np.testing.assert_allclose(
            out["concat"], ref["concat"], rtol=1e-6, atol=1e-6,
            err_msg=ctx,
        )
    else:
        np.testing.assert_array_equal(out["concat"], ref["concat"],
                                      err_msg=ctx)


@needs_8
@pytest.mark.parametrize("seed", range(6))
def test_random_configs_match_oracle(seed):
    run_config_seed(seed)

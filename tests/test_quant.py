"""Quantized table storage (ops/quant.py): bf16 and int8 gather paths.

Exactness contract: the device pipeline on a quantized table must be
BIT-exact with the oracle running on the DEQUANTIZED table — quantization
error lives entirely in the stored values, never in the lookup/pool math.
"""

import numpy as np
import pytest

import jax

from recom_tpu import Engine, EngineConfig
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.oracle import OracleModel
from recom_tpu.ops.quant import (
    dequantize_table,
    quantize_rows_int8,
)
from recom_tpu.runtime.checkpoint import export_params
from recom_tpu.utils.params import init_model_params

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    t = rng.standard_normal((64, 16)).astype(np.float32) * np.exp(
        rng.uniform(-6, 6, size=(64, 1))
    ).astype(np.float32)  # rows spanning 12 nats of magnitude
    q, s = quantize_rows_int8(t)
    deq = dequantize_table(q, s)
    # per-row relative error bounded by half a quantization step
    amax = np.abs(t).max(axis=1, keepdims=True)
    err = np.abs(deq - t)
    assert (err <= amax / 127.0 * 0.5 + 1e-12).all()
    # all-zero rows stay exactly zero
    q0, s0 = quantize_rows_int8(np.zeros((3, 4), np.float32))
    assert (q0 == 0).all() and (s0 == 0).all()


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_engine_quantized_bitexact_vs_dequantized_oracle(dtype):
    m = make_dlrm_model(6, 2, 2, 2, 1, 4, [8], [16, 1], name=f"q_{dtype}",
                        large_rows=2048)
    cfg = EngineConfig(table_dtype=dtype, use_pallas=False,
                       batch_buckets=(32,))
    np_params = init_model_params(m)
    eng = Engine(m, cfg, params=np_params)
    # oracle runs on the engine's own stored values (dequantized export)
    deq_params = export_params(eng)
    b = make_random_batch(m, 32, seed=3)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m, params=deq_params).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


@needs_8
@pytest.mark.parametrize("comm", ["all_to_all", "psum"])
def test_sharded_int8_matches_dequantized_oracle(comm):
    m = make_dlrm_model(4, 2, 2, 2, 1, 4, [8], [16], name=f"qs_{comm}",
                        large_rows=4096)
    cfg = EngineConfig(
        table_dtype="int8", use_pallas=False, mesh_shape=(2, 4),
        shard_rows_above=2048, batch_buckets=(32, 64), shard_comm=comm,
    )
    eng = Engine(m, cfg)
    assert eng._sharded_gids
    deq_params = export_params(eng)
    b = make_random_batch(m, 32, seed=5)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m, params=deq_params).forward(b)
    for c, r in ref["pooled"].items():
        if comm == "all_to_all":
            np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)
        else:
            np.testing.assert_allclose(
                out["pooled"][c], r, atol=1e-6, rtol=1e-6, err_msg=c
            )


def test_trainer_rejects_quantized_tables():
    m = make_dlrm_model(2, 1, 1, 0, 0, 2, [4], [8, 1], name="qtr")
    from recom_tpu.train import Trainer

    with pytest.raises(ValueError, match="float32"):
        Trainer(m, EngineConfig(table_dtype="int8"))

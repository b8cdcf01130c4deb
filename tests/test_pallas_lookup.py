"""Pallas one-hot megakernel tests (interpret mode on CPU; the real-TPU
bit-exactness drive lives in the verify recipe and bench gate)."""

import numpy as np

import jax
import jax.numpy as jnp

from recom_tpu import Engine, EngineConfig
from recom_tpu.models import make_microbenchmark_model, make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.ops.lookup_pallas import group_pooled_onehot, onehot_lookup
from recom_tpu.oracle import OracleModel


def test_onehot_lookup_interpret_bitexact():
    rng = np.random.default_rng(0)
    C, V, d, B = 16, 256, 8, 64
    table3 = rng.standard_normal((C, V, d)).astype(np.float32)
    ids = rng.integers(0, V, (B, C)).astype(np.int32)
    ids[rng.random((B, C)) < 0.2] = -1
    rows = onehot_lookup(
        jnp.asarray(table3), jnp.asarray(ids.T), 128, 8, 512, True
    )
    ref = np.zeros((C, B, d), np.float32)
    for c in range(C):
        for b in range(B):
            if ids[b, c] >= 0:
                ref[c, b] = table3[c, ids[b, c]]
    np.testing.assert_array_equal(np.asarray(rows), ref)


def test_group_pooled_onehot_combiners():
    rng = np.random.default_rng(1)
    C, V, d, B = 8, 128, 4, 32
    table3 = rng.standard_normal((C, V, d)).astype(np.float32)
    ids = rng.integers(0, V, (B, C, 1)).astype(np.int32)
    ids[rng.random((B, C, 1)) < 0.3] = -1
    code = np.array([0, 1, 2, 0, 1, 2, 0, 1], np.int32)
    out = group_pooled_onehot(
        jnp.asarray(table3), jnp.asarray(ids), code, C, interpret=True
    )
    ref = np.zeros((B, C, d), np.float32)
    for b in range(B):
        for c in range(C):
            i = ids[b, c, 0]
            if i >= 0:
                ref[b, c] = table3[c, i]  # count==1: all combiners identical
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_engine_pallas_path_matches_oracle():
    m = make_dlrm_model(6, 2, 2, 2, 1, 4, [8], [16], name="plcpu",
                        large_rows=20_000)
    b = make_random_batch(m, 70, seed=2)
    eng = Engine(m, EngineConfig(use_pallas=True, interpret=True))
    pallas_groups = [g for g in eng.compiled.groups if g.pallas_vocab]
    assert pallas_groups, "expected pallas-eligible groups"
    # V=101 and V=100 merge into one 128-padded group
    assert len(pallas_groups) == 1 and pallas_groups[0].num_columns == 8
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)


def test_pallas_checkpoint_export_roundtrip(tmp_path):
    from recom_tpu.runtime.checkpoint import export_params
    from recom_tpu.utils.params import init_model_params

    m = make_microbenchmark_model(5)
    np_params = init_model_params(m)
    eng = Engine(m, EngineConfig(use_pallas=True, interpret=True),
                 params=np_params)
    exported = export_params(eng)
    for t, arr in np_params["tables"].items():
        np.testing.assert_array_equal(exported["tables"][t], arr)


def test_onehot_lookup_grad_matches_gather():
    """custom VJP: d(table) must equal the XLA gather formulation's grad."""
    import jax

    rng = np.random.default_rng(3)
    C, V, d, B = 4, 128, 8, 32
    table3 = jnp.asarray(rng.standard_normal((C, V, d)).astype(np.float32))
    ids = rng.integers(0, V, (C, B)).astype(np.int32)
    ids[rng.random((C, B)) < 0.2] = -1
    ids_t = jnp.asarray(ids)
    g = jnp.asarray(rng.standard_normal((C, B, d)).astype(np.float32))

    def loss_pallas(t):
        rows = onehot_lookup(t, ids_t, 128, 4, 128, True)
        return (rows * g).sum()

    def loss_gather(t):
        mask = ids_t >= 0
        safe = jnp.where(mask, ids_t, 0)
        rows = jnp.take_along_axis(t, safe[:, :, None], axis=1)
        rows = rows * mask[:, :, None]
        return (rows * g).sum()

    gp = jax.grad(loss_pallas)(table3)
    gg = jax.grad(loss_gather)(table3)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gg), atol=1e-5)


def test_trainer_through_pallas_path():
    from recom_tpu import EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.train import Trainer

    m = make_dlrm_model(4, 2, 2, 0, 0, 2, [4], [8, 1], name="ptr")
    tr = Trainer(
        m, EngineConfig(use_pallas=True, interpret=True, batch_buckets=(16,))
    )
    assert any(
        g.pallas_vocab is not None for g in tr.engine.compiled.groups
    ), "expected a pallas-eligible group"
    b = make_random_batch(m, 16, seed=1)
    labels = np.random.default_rng(0).integers(0, 2, 16)
    losses = [tr.step(b, labels) for _ in range(4)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fused_bucketize_onehot_matches_oracle_including_specials():
    """Fused bucketize+one-hot kernel: raw floats (incl. NaN, +/-inf,
    exact boundary values) one-hot directly against interval pairs;
    bit-exact vs the oracle id path."""
    import numpy as np

    from recom_tpu.ops.lookup_pallas import (
        bucket_bounds,
        onehot_bucketize_lookup,
    )
    from recom_tpu.ops import lookup_xla

    rng = np.random.default_rng(0)
    C, B = 5, 64
    kmax = 9
    bmat = np.full((C, kmax), np.inf, np.float32)
    cnts = np.zeros((C,), np.int32)
    for i in range(C):
        k = int(rng.integers(1, kmax + 1))
        bmat[i, :k] = np.sort(rng.uniform(-10, 10, k)).astype(np.float32)
        cnts[i] = k
    v_pad, c_pad = 128, 8
    d = 8
    table3 = rng.standard_normal((c_pad, v_pad, d)).astype(np.float32)

    raw = rng.uniform(-15, 15, (C, B)).astype(np.float32)
    # specials + exact boundary hits
    raw[0, 0] = np.nan
    raw[1, 1] = np.inf
    raw[2, 2] = -np.inf
    raw[3, 3] = bmat[3, 0]
    raw_pad = np.zeros((c_pad, B), np.float32)
    raw_pad[:C] = raw

    lo, hi, counts = bucket_bounds(bmat, cnts, v_pad, c_pad)
    rows = onehot_bucketize_lookup(
        jnp.asarray(table3), jnp.asarray(raw_pad), jnp.asarray(lo),
        jnp.asarray(hi), jnp.asarray(counts), interpret=True,
    )

    # reference: XLA bucketize ids then direct indexing
    ids = np.asarray(
        lookup_xla.device_bucketize(
            jnp.asarray(raw.T), jnp.asarray(bmat), jnp.asarray(cnts)
        )
    )                                                   # [B, C]
    ref = np.zeros((c_pad, B, d), np.float32)
    for c in range(C):
        for b in range(B):
            ref[c, b] = table3[c, ids[b, c]]
    np.testing.assert_array_equal(np.asarray(rows), ref)


def test_fused_bucketize_engine_and_grad():
    import numpy as np

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_microbenchmark_model
    from recom_tpu.oracle import OracleModel
    from recom_tpu.train import Trainer

    m = make_microbenchmark_model(6)
    eng = Engine(m, EngineConfig(use_pallas=True, interpret=True,
                                 batch_buckets=(64,)))
    # pure-bucketize group must take the fused path (no ids anywhere)
    g = eng.compiled.groups[0]
    assert g.n_bucketize == g.num_columns and g.pallas_vocab is not None
    b = make_random_batch(m, 64, seed=4)
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r, err_msg=c)

    # trainable through the fused kernel's custom VJP
    from recom_tpu.models.synthetic import make_dlrm_model

    m2 = make_dlrm_model(4, 0, 0, 0, 0, 2, [4], [8, 1], name="bztr")
    tr = Trainer(m2, EngineConfig(use_pallas=True, interpret=True,
                                  batch_buckets=(16,)))
    b2 = make_random_batch(m2, 16, seed=5)
    labels = np.random.default_rng(0).integers(0, 2, 16)
    losses = [tr.step(b2, labels) for _ in range(4)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

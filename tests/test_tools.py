"""Measurement-tool correctness (round-3 tools review)."""

import numpy as np


def test_auc_midranks_match_brute_force_u():
    """Mann-Whitney AUC with ties must use midranks: saturated f32
    sigmoids tie many scores at exactly 0.0/1.0, and order-based ranks
    shift the statistic by up to the tied mass (corrupting the parity
    gate).  Compare against the brute-force U on heavily tied data."""
    from recom_tpu.tools.auc_parity import auc

    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(5, 60))
        y = rng.integers(0, 2, n)
        s = rng.choice([0.0, 0.25, 0.5, 1.0], n)
        pos, neg = s[y == 1], s[y == 0]
        if len(pos) and len(neg):
            u = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
            want = u / (len(pos) * len(neg))
        else:
            want = 0.5
        assert abs(auc(y, s) - want) < 1e-12

    # all-tied scores = chance, exactly
    assert auc(np.array([1, 0, 1, 0]), np.zeros(4)) == 0.5


def test_weighted_scalar_batch_generation():
    """make_random_batch must produce the flat [B] weight form for
    weighted SINGLE-VALUE columns (it crashed on them before)."""
    from recom_tpu.ir.spec import (
        Combiner, FeatureColumn, FeatureKind, FeatureSource, HashBucket,
        LookupSpec, ModelSpec, TableSpec, TowerSpec,
    )
    from recom_tpu.models import make_random_batch

    m = ModelSpec(
        "ws", {"t": TableSpec("t", 32, 4)},
        [FeatureColumn("c", FeatureSource("x", FeatureKind.DENSE_INT),
                       (HashBucket(32),),
                       LookupSpec("t", Combiner.SUM, weight_field="w"))],
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    b = make_random_batch(m, 16, seed=1)
    w = np.asarray(b["w"])
    assert w.shape == (16,) and w.dtype == np.float32


def test_plot_ae_renders_artifacts(tmp_path):
    """tools/plot_ae must render latency/speedup/throughput PNGs from the
    artifact JSON shapes (incl. the metadata rows without 'batch')."""
    import json
    import subprocess
    import sys

    sweep = {
        "sweep": [
            {"model": "E", "engine_build_s": 1.0},  # metadata row
            *[
                {"model": "E", "batch": b, "examples_per_s": b * 10.0,
                 "request_ms_async": b / 100.0, "tf_cpu_ms": b / 2.0,
                 "vs_tf_cpu": 50.0}
                for b in (32, 128, 512)
            ],
        ]
    }
    thr = {
        "throughput_sweep": [
            {"serve_workers": w, "examples_per_s": 1000.0 * w,
             "request_ms": 1.0}
            for w in (2, 4, 8)
        ]
    }
    sp = tmp_path / "AE_SWEEP_test.json"
    tp = tmp_path / "THROUGHPUT_test.json"
    sp.write_text(json.dumps(sweep))
    tp.write_text(json.dumps(thr))
    out = subprocess.run(
        [sys.executable, "-m", "recom_tpu.tools.plot_ae",
         "--sweep", str(sp), "--throughput", str(tp),
         "--out-dir", str(tmp_path), "--tag", "t"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    for f in ("latency_t.png", "speedup_t.png", "throughput_t.png"):
        p = tmp_path / f
        assert p.exists() and p.stat().st_size > 1000, f


def test_naive_device_fn_fresh_content_and_e2e_agreement():
    """The naive-TPU baseline arm (tools/naive_tpu.py): the device-step
    variant must produce finite sigmoid outputs, DIFFERENT content per
    seed (the fresh-content guarantee that defeats the transport's
    execution cache), and the shared forward must agree with the engine
    (the e2e sanity contract) on host-prepared arrays."""
    import numpy as np

    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_dlrm_model, make_random_batch
    from recom_tpu.tools.naive_tpu import (
        build_naive_device_fn, build_naive_fn, naive_prepare,
    )
    from recom_tpu.utils.params import init_model_params

    m = make_dlrm_model(3, 2, 3, 2, 1, 2, [8], [16], name="naive_t",
                        small_rows=40, mid_rows=300, large_rows=1 << 14)
    np_params = init_model_params(m)
    tables = {k: np.asarray(v, np.float32)
              for k, v in np_params["tables"].items()}
    tower = np_params["tower"]

    dev_fn = build_naive_device_fn(m, 32)
    o1 = np.asarray(dev_fn(tables, tower, 1))
    o2 = np.asarray(dev_fn(tables, tower, 2))
    assert o1.shape == (32, 1) and np.isfinite(o1).all()
    assert (o1 > 0).all() and (o1 < 1).all()   # sigmoid range
    assert not np.array_equal(o1, o2), "seeds must yield fresh content"

    # e2e naive forward vs the framework engine on the same batch
    b = make_random_batch(m, 32, seed=5)
    arrays = naive_prepare(m, b, 32)
    naive_out = np.asarray(build_naive_fn(m)(tables, tower, arrays))
    eng_out = np.asarray(
        Engine(m, EngineConfig(interpret=True),
               params=np_params).predict(b)["output"]
    )
    np.testing.assert_allclose(naive_out, eng_out, atol=1e-4)

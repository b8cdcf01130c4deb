"""ServingPipeline: pipelined host-prep/device overlap must preserve
per-request results exactly (same outputs as sequential Engine.predict)."""

import numpy as np

from recom_tpu import Engine, EngineConfig
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.runtime.server import ServingPipeline, throughput_under_sla


def _small_model():
    return make_dlrm_model(6, 2, 2, 2, 1, 4, [8], [16, 1], name="srv",
                           large_rows=2048)


def test_pipeline_matches_sequential_predict():
    m = _small_model()
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32,)))
    batches = [make_random_batch(m, 32, seed=100 + i) for i in range(6)]
    want = [eng.predict(b)["output"] for b in batches]
    with ServingPipeline(eng, prep_workers=3, max_inflight=3) as pipe:
        got = pipe.map_stream(batches)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert pipe.stats["completed"] == len(batches)


def test_pipeline_mixed_batch_sizes_and_signatures():
    m = _small_model()
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(16, 32)))
    batches = [
        make_random_batch(m, bs, seed=i)
        for i, bs in enumerate([16, 32, 25, 16, 30])
    ]
    with ServingPipeline(eng, prep_workers=2, max_inflight=2) as pipe:
        outs = pipe.map_stream(batches)
    for b, o in zip([16, 32, 25, 16, 30], outs):
        assert o.shape[0] == b
        assert np.isfinite(o).all()


def test_throughput_under_sla_reports_ladder():
    m = _small_model()
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32,)))
    batches = [make_random_batch(m, 32, seed=i) for i in range(2)]
    rep = throughput_under_sla(
        eng, batches, sla_ms=10_000.0, num_iterations=3,
        worker_ladder=(1, 2),
    )
    assert rep["best_under_sla"] is not None
    assert rep["best_under_sla"]["workers"] == 2
    assert all(r["meets_sla"] for r in rep["ladder"])
    # an impossible SLA stops the ladder at the first rung
    rep2 = throughput_under_sla(
        eng, batches, sla_ms=0.0, num_iterations=2, worker_ladder=(1, 2),
    )
    assert rep2["best_under_sla"] is None
    assert len(rep2["ladder"]) == 1


def test_pipeline_retries_transient_failures():
    m = _small_model()
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32,)))
    b = make_random_batch(m, 32, seed=1)
    want = eng.predict(b)["output"]

    calls = {"n": 0}
    orig = ServingPipeline._dispatch

    def flaky(self, batch, batch_size):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return orig(self, batch, batch_size)

    ServingPipeline._dispatch = flaky
    try:
        with ServingPipeline(eng, retries=1) as pipe:
            out = pipe.submit(b).result()
            assert pipe.stats["retries"] == 1
        np.testing.assert_array_equal(out, want)
        # retries=0: the exception surfaces
        calls["n"] = 0
        with ServingPipeline(eng, retries=0) as pipe:
            fut = pipe.submit(b)
            try:
                fut.result()
                assert False, "expected failure"
            except RuntimeError:
                pass
    finally:
        ServingPipeline._dispatch = orig


def test_prep_admission_cap():
    """ServingPipeline bounds concurrent host preps at cores + 1: beyond
    that, extra prep threads on a saturated host degrade EACH OTHER
    (THROUGHPUT_r03: 4 -> 8 workers collapsed 23.2k -> 6.8k; r04: even 3
    preps on 1 core ran 2-3x slower than 2).  Submissions past the cap
    queue instead of thrashing."""
    import os

    from recom_tpu.runtime.server import ServingPipeline

    m = _small_model()
    eng = Engine(m, EngineConfig(use_pallas=False, batch_buckets=(32,)))
    cores = len(os.sched_getaffinity(0)) or (os.cpu_count() or 1)
    with ServingPipeline(eng, prep_workers=64, max_inflight=64) as pipe:
        assert pipe.effective_prep_workers == min(64, cores + 1)
        assert pipe._pool._max_workers == pipe.effective_prep_workers
        # the pipeline still serves correctly at over-subscribed offered load
        batches = [make_random_batch(m, 32, seed=500 + i) for i in range(6)]
        outs = [pipe.submit(b) for b in batches]
        for f in outs:
            assert f.result() is not None
    with ServingPipeline(eng, prep_workers=2, max_inflight=2) as pipe:
        assert pipe.effective_prep_workers == 2   # explicit small asks hold

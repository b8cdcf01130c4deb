"""Dynamic micro-batching (runtime/batcher.py): coalesced requests serve
bit-exactly what each request would get alone, under real threading."""

import numpy as np
import pytest

from recom_tpu import Engine, EngineConfig
from recom_tpu.models import make_random_batch
from recom_tpu.models.synthetic import make_dlrm_model
from recom_tpu.runtime.batcher import MicroBatcher, merge_requests


def _engine(name, buckets=(32,)):
    m = make_dlrm_model(2, 1, 1, 1, 0, 2, [4], [8, 1], name=name)
    return m, Engine(
        m, EngineConfig(use_pallas=False, batch_buckets=buckets)
    )


def test_microbatch_bitexact_vs_individual():
    m, eng = _engine("mb")
    rng = np.random.default_rng(0)
    reqs = [
        make_random_batch(m, int(rng.integers(1, 9)), seed=100 + i)
        for i in range(7)
    ]
    want = [np.asarray(eng.predict(r)["output"]) for r in reqs]

    with MicroBatcher(eng, max_delay_ms=30.0) as mb:
        futs = [mb.submit(r) for r in reqs]
        got = [f.result(timeout=120) for f in futs]
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w, err_msg=f"request {i}")
    # the whole burst coalesced into fewer device calls than requests
    assert mb.stats["flushes"] < len(reqs)
    assert mb.stats["requests"] == len(reqs)


def test_microbatch_flushes_on_max_batch():
    m, eng = _engine("mb_split", buckets=(8, 32))
    reqs = [make_random_batch(m, 5, seed=200 + i) for i in range(5)]
    want = [np.asarray(eng.predict(r)["output"]) for r in reqs]
    with MicroBatcher(eng, max_batch=8, max_delay_ms=50.0) as mb:
        futs = [mb.submit(r) for r in reqs]
        got = [f.result(timeout=120) for f in futs]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # 5 x 5 rows with an 8-row threshold: greedy whole-request groups of
    # one or two requests each -> at least 3 flushes
    assert mb.stats["flushes"] >= 3


def test_microbatch_field_mismatch_fails_group():
    m, eng = _engine("mb_err")
    good = make_random_batch(m, 4, seed=300)
    bad = dict(make_random_batch(m, 4, seed=301))
    bad.pop(sorted(bad)[0])
    with MicroBatcher(eng, max_delay_ms=20.0) as mb:
        f1 = mb.submit(good)
        f2 = mb.submit(bad)
        # the bad request must fail loudly: ValueError when it coalesced
        # with the good one (field-set check), KeyError if timing served
        # it alone (prepare missing the field) — never silent zeros
        with pytest.raises((ValueError, KeyError)):
            f2.result(timeout=120)
        try:
            f1.result(timeout=120)   # good request: served or group error
        except ValueError:
            pass


def test_microbatch_close_flushes_pending():
    m, eng = _engine("mb_close")
    r = make_random_batch(m, 3, seed=400)
    want = np.asarray(eng.predict(r)["output"])
    mb = MicroBatcher(eng, max_delay_ms=60_000.0)  # would wait a minute
    fut = mb.submit(r)
    mb.close()                                     # close must flush
    np.testing.assert_array_equal(fut.result(timeout=5), want)


def test_merge_requests_rejects_field_mismatch():
    with pytest.raises(ValueError):
        merge_requests([{"a": np.zeros(2)}, {"b": np.zeros(2)}])

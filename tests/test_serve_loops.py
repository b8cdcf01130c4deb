"""Protocol tests for the shared serving loop (tools/serve_loops)."""

import numpy as np


class FakeEngine:
    """Counts prepares/dispatches; fabricates signatures."""

    def __init__(self):
        self.prepared = []
        self.executed = []
        self.device_params = {}

    def prepare(self, b):
        self.prepared.append(b)

        class P:
            signature = ("sig",)
            arrays = b

        return P()

    def _get_jitted(self, sig):
        def fn(params, arrays):
            self.executed.append(arrays)
            return {"output": np.zeros(1)}

        return fn


def test_loop_windows_serves_each_batch_exactly_once():
    from recom_tpu.tools.serve_loops import loop_windows

    eng = FakeEngine()
    warm = ["w0", "w1"]
    bats = [f"b{i}" for i in range(23)]
    med, win_ms, req_ms = loop_windows(eng, warm, bats, confirm_every=4,
                                       windows=5)
    # warm batches execute but are NOT timed; each timed batch exactly once
    assert eng.executed[:2] == warm
    served = eng.executed[2:]
    # windows=5 over 23: EVERY batch served exactly once (near-equal
    # windows of 4/5/4/5/5 — no floor-division tail drop)
    assert served == bats
    assert len(served) == len(set(served))
    assert len(win_ms) == 5 and len(req_ms) == 23
    assert med > 0


def test_loop_windows_sync_mode_returns_per_request_latencies():
    from recom_tpu.tools.serve_loops import loop_windows

    eng = FakeEngine()
    bats = [f"s{i}" for i in range(7)]
    med, win_ms, req_ms = loop_windows(eng, [], bats, confirm_every=1,
                                       windows=1)
    assert eng.executed == bats
    assert len(req_ms) == 7 and len(win_ms) == 1


def test_serde_roundtrip_kitchen_sink_with_new_column_types():
    """The full serde round-trip covers SOFTMAX combiners and width-k
    dense sources (via the wire kitchen-sink model) and reproduces the
    oracle bitwise."""
    import numpy as np

    from recom_tpu.ir.serde import model_from_dict, model_to_dict
    from recom_tpu.models import make_random_batch
    from recom_tpu.oracle import OracleModel
    from recom_tpu.utils.params import init_model_params
    from tests.test_wire import make_kitchen_sink

    model = make_kitchen_sink()
    rt = model_from_dict(model_to_dict(model))
    assert rt.spec_hash() == model.spec_hash()
    params = init_model_params(model)
    batch = make_random_batch(model, 9, seed=4)
    a = OracleModel(model, params=params).forward(batch)
    b = OracleModel(rt, params=params).forward(batch)
    np.testing.assert_array_equal(a["concat"], b["concat"])

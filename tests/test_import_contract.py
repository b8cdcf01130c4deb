"""docs/IMPORT_CONTRACT.md is a CONTRACT: it must list exactly the op
vocabulary the importer enforces, and an out-of-contract graph must fail
with the documented diagnostic (VERDICT r04 item 9 — the explicit
alternative to the reference's silent serve-anything-on-TF-CPU fallback,
cuda_emitter.cc:192-211)."""

import os

import pytest

from recom_tpu.importers import tf_graph as tg

_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "IMPORT_CONTRACT.md",
)


def _doc_text() -> str:
    with open(_DOC) as f:
        return f.read()


def test_contract_doc_lists_every_common_op():
    doc = _doc_text()
    missing = [op for op in tg._SLOT_OPS_COMMON if op not in doc]
    assert not missing, (
        f"docs/IMPORT_CONTRACT.md is stale: common ops {missing} are "
        "enforced by the importer but undocumented"
    )


def test_contract_doc_lists_every_hosteval_op():
    doc = _doc_text()
    ops = set(tg._HOSTEVAL_BINOPS) | set(tg._HOSTEVAL_UNOPS)
    missing = [op for op in ops if f"`{op}`" not in doc]
    assert not missing, f"host-eval ops {missing} undocumented"


def test_contract_doc_lists_idiom_vocabularies():
    doc = _doc_text()
    for anchor, ops in tg._SLOT_OPS_BY_ANCHOR.items():
        assert anchor in doc, f"idiom {anchor!r} undocumented"
    for op in ("SegmentSum", "SparseSoftmax", "OneHot"):
        assert op in doc


def test_out_of_contract_graph_fails_with_documented_diagnostic():
    """A REAL TF 2.21 frozen graph whose feature column carries an op
    outside the contract (Sin on the id path) must fail strict import
    naming the op, an example node, and the contract doc — and import
    the recognized part under strict=False."""
    tf = pytest.importorskip("tensorflow")

    import numpy as np

    @tf.function
    def model_fn(x):
        # bucketized column idiom ... with a smuggled Sin on the raw path
        xs = tf.sin(x)                       # OUT of contract
        ids = tf.raw_ops.Bucketize(
            input=xs, boundaries=[0.0, 0.5, 1.0]
        )
        table = tf.constant(
            np.arange(16, dtype=np.float32).reshape(4, 4)
        )
        e = tf.gather(table, ids)
        return tf.concat([e, e], axis=1)

    conc = model_fn.get_concrete_function(
        tf.TensorSpec([None], tf.float32, name="feat")
    )
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    frozen = convert_variables_to_constants_v2(conc)
    gd = frozen.graph.as_graph_def()

    with pytest.raises(ValueError) as ei:
        tg.import_tf_graphdef(gd.SerializeToString(), strict=True)
    msg = str(ei.value)
    assert "Sin" in msg, msg
    assert "IMPORT_CONTRACT" in msg, msg

    # non-strict serves the recognized part and records the warning
    model, _ = tg.import_tf_graphdef(
        gd.SerializeToString(), strict=False
    )
    assert any("Sin" in w for w in model.import_warnings), (
        model.import_warnings
    )

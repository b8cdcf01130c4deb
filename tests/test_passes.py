"""Compiler-pass property tests: every pass preserves oracle semantics on
randomized transform chains (the executable form of the reference's
graceful-degradation contract, SURVEY.md section 4)."""

import numpy as np
import pytest

from recom_tpu.compiler import passes
from recom_tpu.config import EngineConfig
from recom_tpu.compiler.pipeline import run_passes
from recom_tpu.ir.intervals import IntervalSet
from recom_tpu.ir.spec import (
    Bucketize,
    Cast,
    Combiner,
    FeatureColumn,
    FeatureKind,
    FeatureSource,
    FilterRange,
    HashBucket,
    IdentityTransform,
    LookupSpec,
    Mod,
    ModelSpec,
    NumToId,
    SelectRange,
    TableSpec,
    TowerSpec,
)
from recom_tpu.oracle import OracleModel


def _random_chain(rng, vocab):
    """Random transform chain over an INT_LIST source ending in-range."""
    chain = [NumToId(10**6)]
    r_lo, r_hi = 0, 10**6 - 1
    for _ in range(int(rng.integers(0, 4))):
        kind = rng.choice(["filter", "select", "keep", "mod"])
        lo = int(rng.integers(0, 1000))
        hi = lo + int(rng.integers(1, 5000))
        if kind == "filter":
            chain.append(FilterRange(IntervalSet.closed(lo, hi)))
        elif kind == "select":
            sub = int(rng.integers(0, 100))
            chain.append(SelectRange(IntervalSet.closed(lo, hi), sub))
        elif kind == "keep":
            chain.append(Cast("int64") if rng.random() < 0.5
                         else IdentityTransform())
        else:
            chain.append(Mod(int(rng.integers(50, 2000))))
    chain.append(Mod(vocab))  # land in table range
    return tuple(chain)


def _oracle_out(model, batch):
    out = OracleModel(model).forward(batch)
    return out["pooled"]


@pytest.mark.parametrize("seed", range(8))
def test_pipeline_preserves_semantics_random_chains(seed):
    rng = np.random.default_rng(seed)
    vocab = 97
    tables = {"t": TableSpec("t", vocab, 4)}
    cols = [
        FeatureColumn(
            f"c{i}",
            FeatureSource("x", FeatureKind.INT_LIST),
            _random_chain(rng, vocab),
            LookupSpec("t", Combiner.MEAN),
        )
        for i in range(3)
    ]
    model = ModelSpec(
        "prop", tables, cols,
        TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
    )
    batch = {
        "x": [list(rng.integers(0, 10**6, size=int(n)))
              for n in rng.integers(0, 6, 40)]
    }
    before = _oracle_out(model, batch)
    optimized, report = run_passes(model, EngineConfig())
    after = _oracle_out(optimized, batch)
    for c in before:
        np.testing.assert_array_equal(before[c], after[c], err_msg=c)


def test_filter_merging():
    chain = (
        NumToId(1000),
        FilterRange(IntervalSet.closed(0, 500)),
        FilterRange(IntervalSet.closed(100, 900)),
    )
    out, dropped = passes._simplify_chain(chain, IntervalSet.all())
    filters = [t for t in out if isinstance(t, FilterRange)]
    assert len(filters) == 1
    assert filters[0].keep == IntervalSet.closed(100, 500)
    assert dropped == 1


def test_redundant_filter_dropped_after_map():
    # Bucketize establishes [0, K]; a filter keeping [0, 10**6] is useless
    chain = (
        Bucketize([1.0, 2.0, 3.0]),
        FilterRange(IntervalSet.closed(0, 10**6)),
    )
    out, dropped = passes._simplify_chain(chain, IntervalSet.all())
    assert dropped == 1
    assert len(out) == 1 and isinstance(out[0], Bucketize)


def test_redundant_select_dropped():
    chain = (
        HashBucket(100),
        SelectRange(IntervalSet.closed(0, 99), 0),   # can never substitute
    )
    out, dropped = passes._simplify_chain(chain, IntervalSet.all())
    assert dropped == 1 and len(out) == 1


def test_select_then_filter_fusion():
    # Select(k, s) then Filter(f) with s not in f == Filter(k & f)
    chain = (
        NumToId(1000),
        SelectRange(IntervalSet.closed(10, 50), substitute=500),
        FilterRange(IntervalSet.closed(0, 100)),
    )
    out, dropped = passes._simplify_chain(chain, IntervalSet.all())
    filters = [t for t in out if isinstance(t, FilterRange)]
    selects = [t for t in out if isinstance(t, SelectRange)]
    assert len(selects) == 0 and len(filters) == 1
    assert filters[0].keep == IntervalSet.closed(10, 50)


def test_canonicalize_overflow_chain_warns_by_default_raises_in_strict():
    """Reference contract: leave-the-graph-unchanged on a range surprise
    (serve with runtime clamp/mask); the hard rejection is opt-in via
    strict_id_ranges (VERDICT r01 weak #4)."""
    tables = {"t": TableSpec("t", 10, 4)}
    cols = [
        FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST),
            (Mod(100),),  # range [0, 99] but vocab is 10
            LookupSpec("t", Combiner.SUM),
        )
    ]
    model = ModelSpec("bad", tables, cols,
                      TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    out, info = passes.canonicalize_lookup(model)
    assert info["range_warnings"] == 1
    with pytest.raises(ValueError, match="can produce id"):
        passes.canonicalize_lookup(model, strict=True)


def test_prune_useless_removes_identity_and_cast():
    tables = {"t": TableSpec("t", 100, 4)}
    cols = [
        FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST),
            (IdentityTransform(), NumToId(100), Cast("int32")),
            LookupSpec("t", Combiner.SUM),
        )
    ]
    model = ModelSpec("p", tables, cols,
                      TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    out, info = passes.prune_useless(model)
    assert info["removed_transforms"] == 2
    assert len(out.columns[0].transforms) == 1


def test_declared_int_range_enables_pre_lookup_simplification():
    """FeatureSource.int_range seeds interval analysis (VERDICT r01 weak
    #6): a filter that cannot shrink the declared range is dropped before
    any Map transform; one that can shrink it survives."""
    from recom_tpu.ir.spec import NumToId

    tables = {"t": TableSpec("t", 100, 4)}

    def mk(int_range, keep):
        cols = [
            FeatureColumn(
                "c",
                FeatureSource("x", FeatureKind.INT_LIST,
                              int_range=int_range),
                (FilterRange(IntervalSet.closed(*keep)), NumToId(100)),
                LookupSpec("t", Combiner.SUM),
            )
        ]
        m = ModelSpec("ir", tables, cols,
                      TowerSpec(arch="mlp", top_mlp=(),
                                final_activation=None))
        out, info = passes.simplify_pre_lookup(m)
        return out.columns[0].transforms, info

    # declared [0, 50], filter keeps [0, 80]: provably a no-op -> dropped
    tf_out, info = mk((0, 50), (0, 80))
    assert not any(isinstance(t, FilterRange) for t in tf_out)
    assert info["dropped_transforms"] == 1
    # declared [0, 50], filter keeps [10, 20]: shrinks -> kept
    tf_out, info = mk((0, 50), (10, 20))
    assert any(isinstance(t, FilterRange) for t in tf_out)
    # no declared range: the same no-op filter cannot be proven -> kept
    tf_out, info = mk(None, (0, 80))
    assert any(isinstance(t, FilterRange) for t in tf_out)


def test_numtoid_rejects_out_of_range_default():
    """Round-3 compiler review: TF's identity column requires
    default_value in [0, num_buckets); an out-of-range default would also
    make NumToId.out_range's [0, num_ids) claim unsound and let
    simplify_pre_lookup drop a downstream Select that still had work."""
    with pytest.raises(ValueError, match="default_id"):
        NumToId(10, default_id=99)
    with pytest.raises(ValueError, match="default_id"):
        NumToId(10, default_id=-1)
    NumToId(10, default_id=9)           # boundary is valid


def test_strict_id_ranges_rejects_unconstrained_chain():
    """strict_id_ranges must fail the build for UNCONSTRAINED chains too
    (previously the is_all() early-continue bypassed the strict raise for
    exactly the chains most likely to exceed the vocab); the default mode
    serves them silently with the always-on runtime clamp (the normal
    identity-column shape — no warning spam)."""
    tables = {"t": TableSpec("t", 10, 4)}
    cols = [
        FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST),
            (NumToId(10),),             # keep-kind: no range established
            LookupSpec("t", Combiner.SUM),
        )
    ]
    model = ModelSpec("unc", tables, cols,
                      TowerSpec(arch="mlp", top_mlp=(), final_activation=None))
    out, info = passes.canonicalize_lookup(model)
    assert info["range_warnings"] == 0   # unconstrained is not warn-worthy
    with pytest.raises(ValueError, match="unconstrained"):
        passes.canonicalize_lookup(model, strict=True)
    # a DECLARED in-range source satisfies strict
    cols2 = [
        FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST,
                               int_range=(0, 9)),
            (NumToId(10),),
            LookupSpec("t", Combiner.SUM),
        )
    ]
    model2 = ModelSpec("dec", tables, cols2,
                       TowerSpec(arch="mlp", top_mlp=(),
                                 final_activation=None))
    passes.canonicalize_lookup(model2, strict=True)


def test_spec_hash_covers_post_in_concat_int_range():
    """spec_hash is the compile-cache key: models lowering to different
    programs must hash differently (post chains change concat widths,
    in_concat changes slot membership, int_range changes which transforms
    simplify away)."""
    from recom_tpu.ir.spec import PostPool

    def base(**kw):
        col = FeatureColumn(
            "c", FeatureSource("x", FeatureKind.INT_LIST,
                               int_range=kw.get("int_range")),
            (NumToId(10),),
            LookupSpec("t", Combiner.SUM),
            post=kw.get("post", ()),
            in_concat=kw.get("in_concat", True),
        )
        extra = FeatureColumn(
            "d", FeatureSource("y", FeatureKind.INT_LIST),
            (NumToId(10),),
            LookupSpec("t", Combiner.SUM),
            post=(PostPool("mul_column", other="c"),),
        )
        return ModelSpec(
            "hh", {"t": TableSpec("t", 10, 4)}, [col, extra],
            TowerSpec(arch="mlp", top_mlp=(), final_activation=None),
        )

    h0 = base().spec_hash()
    assert base(post=(PostPool("reduce_sum"),)).spec_hash() != h0
    assert base(in_concat=False).spec_hash() != h0
    assert base(int_range=(0, 9)).spec_hash() != h0
    assert base().spec_hash() == h0      # stable for equal specs


def test_vocab_cache_key_distinguishes_int_and_str_vocab():
    """host_prep memoizes chain evaluation by cache_key: an int vocab
    (1, 2) and a string vocab ("1", "2") have different semantics (the
    oracle's dict lookup misses across types) and must not share a slot."""
    from recom_tpu.ir.spec import VocabLookup

    a = VocabLookup([1, 2], num_oov=1)
    b = VocabLookup(["1", "2"], num_oov=1)
    assert a.cache_key() != b.cache_key()


def test_dedup_aliases_duplicate_columns_on_device():
    """dedup_subcolumns=True (default) must DEDUPE DEVICE WORK, not just
    report: duplicated (chain, table, combiner) columns alias to one group
    member, so the wire shrinks and the [B, C, L] id plane narrows, while
    model-order outputs stay bit-identical to the oracle and to the
    dedup-off engine (VERDICT r04 item 4)."""
    from recom_tpu import Engine
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.models import make_random_batch
    from recom_tpu.utils.params import init_model_params
    import dataclasses as _dc

    base = make_dlrm_model(4, 2, 3, 2, 0, 2, [8], [16],
                           name="dup", small_rows=50)
    # duplicate several columns verbatim under new names (same source
    # field, same transforms, same table -> device-identical)
    dup_cols = []
    for col in base.columns:
        dup_cols.append(col)
        if col.lookup is not None and col.name in (
            "bucketize0", "categ_hashbucket0", "categ_hashbucket_sparse0",
        ):
            dup_cols.append(_dc.replace(col, name=col.name + "_dup"))
    model = _dc.replace(base, columns=tuple(dup_cols))
    params = init_model_params(model)
    batch = make_random_batch(model, 32, seed=9)

    engines = {}
    for label, dd in (("on", True), ("off", False)):
        engines[label] = Engine(
            model, EngineConfig(dedup_subcolumns=dd), params=params
        )
    on, off = engines["on"], engines["off"]
    n_on = sum(len(g.members) for g in on.compiled.groups)
    n_off = sum(len(g.members) for g in off.compiled.groups)
    assert n_on == n_off - 3, (n_on, n_off)
    w_on = on.prepare(batch).arrays["blob"].nbytes
    w_off = off.prepare(batch).arrays["blob"].nbytes
    assert w_on < w_off, (w_on, w_off)

    out_on = on.predict(batch, return_pooled=True, return_concat=True)
    out_off = off.predict(batch, return_pooled=True, return_concat=True)
    # the tower folds aliased slots' weight rows into one (x*(w1+w2) vs
    # x*w1 + x*w2): same math, different float summation — allclose for
    # the tower output, BIT-exact for the lookup artifacts (the contract)
    np.testing.assert_allclose(
        out_on["output"], out_off["output"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(out_on["concat"], out_off["concat"])
    ref = OracleModel(model, params=params).pooled_outputs(batch)
    for name, want in ref.items():
        np.testing.assert_array_equal(
            np.asarray(out_on["pooled"][name]), want, err_msg=name
        )
    # duplicate and original resolve to the SAME group slot
    assert on.compiled.column_slot["bucketize0"] == (
        on.compiled.column_slot["bucketize0_dup"]
    )

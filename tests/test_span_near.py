"""Ordered span-near (NearSpansOrdered.java:40): docs holding occurrences
p_1 < ... < p_k with total gap p_k - p_1 - (k-1) <= slop."""

import numpy as np

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              SpanNearQuery, TermQuery)

DOCS = [["a", "x", "b", "y", "c"],   # widths: a..c chain 0,2,4 -> gap 2
        ["a", "b", "c"],             # adjacent -> gap 0
        ["c", "b", "a"],             # wrong order
        ["a", "x", "x", "x", "b", "c"],  # 0,4,5 -> gap 3
        ["a", "b"]]


def _eng():
    return oracle.OracleEngine(*oracle.index_token_lists(DOCS))


def test_ordered_width_thresholds():
    eng = _eng()
    q = lambda s: SpanNearQuery(["a", "b", "c"], slop=s)
    assert eng.matches(q(0)).docids.tolist() == [1]
    assert eng.matches(q(1)).docids.tolist() == [1]
    assert eng.matches(q(2)).docids.tolist() == [0, 1]
    assert eng.matches(q(3)).docids.tolist() == [0, 1, 3]


def test_order_is_required():
    eng = _eng()
    # doc 2 has c..b..a but never a..b in order within any slop
    assert 2 not in eng.matches(
        SpanNearQuery(["a", "b"], slop=100)).docids.tolist()


def test_spans_compose_with_boolean():
    eng = _eng()
    m = eng.matches(BooleanQuery(
        [(Occur.MUST, SpanNearQuery(["a", "b"], slop=0)),
         (Occur.MUST_NOT, TermQuery("c"))]))
    assert m.docids.tolist() == [4]


def test_missing_term_matches_nothing():
    eng = _eng()
    assert len(eng.matches(SpanNearQuery(["a", "zz"], slop=9)).docids) == 0


def test_repeated_anchor_uses_best_chain():
    # two 'a' anchors; only the later one admits a tight chain
    docs = [["a", "x", "x", "x", "x", "a", "b"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    assert eng.matches(
        SpanNearQuery(["a", "b"], slop=0)).docids.tolist() == [0]


def test_unordered_any_order_and_width():
    docs = [["b", "x", "a"], ["a", "b"], ["a", "x", "x", "b"],
            ["c", "a", "x", "b"], ["a", "x", "b", "x", "c"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    u = lambda ts, s: SpanNearQuery(ts, slop=s, in_order=False)
    assert eng.matches(u(["a", "b"], 0)).docids.tolist() == [1]
    assert eng.matches(u(["a", "b"], 1)).docids.tolist() == [0, 1, 3, 4]
    # k=3 heap-walk path
    assert eng.matches(u(["a", "b", "c"], 1)).docids.tolist() == [3]
    assert eng.matches(u(["a", "b", "c"], 2)).docids.tolist() == [3, 4]


def test_unordered_rejects_repeats():
    import pytest
    with pytest.raises(NotImplementedError):
        SpanNearQuery(["a", "a"], slop=2, in_order=False)

"""Surround query language (queryparser/surround: QueryParser.jj,
DistanceQuery/OrQuery/SrndTermQuery roles) parsed onto the intervals
module."""

import pytest

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.operators.executor import evaluate
from lucene_7_x_9_x_spark.plans import query as Q
from lucene_7_x_9_x_spark.plans.surround import (SurroundParseError,
                                                 parse_surround)


def test_prefix_distance_ops():
    q = parse_surround("3W(a, b, c)")
    assert isinstance(q, Q.IntervalQuery)
    s = q.source
    assert isinstance(s, Q.IntervalOrdered) and s.max_gaps == 2
    assert [x.term for x in s.sources] == ["a", "b", "c"]
    q = parse_surround("N(a, b)")  # bare N = within 1 (adjacent)
    assert isinstance(q.source, Q.IntervalUnordered)
    assert q.source.max_gaps == 0


def test_infix_and_nesting():
    q = parse_surround("spark 2N scan")
    assert isinstance(q.source, Q.IntervalUnordered)
    assert q.source.max_gaps == 1
    q = parse_surround("5N(spark, OR(scan, jo*))")
    inner = q.source.sources[1]
    assert isinstance(inner, Q.IntervalOr)
    assert isinstance(inner.sources[1], Q.IntervalPrefix)
    assert inner.sources[1].prefix == "jo"
    # wildcard leaf (SrndTruncQuery)
    q = parse_surround("W(a?c, b)")
    assert isinstance(q.source.sources[0], Q.IntervalWildcard)


def test_boolean_composition():
    q = parse_surround("AND(2N(filter, join), NOT(window))")
    assert isinstance(q, Q.BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [Q.Occur.MUST, Q.Occur.MUST_NOT]
    q = parse_surround("filter AND join OR scan")  # left-assoc chain
    assert isinstance(q, Q.BooleanQuery)
    # top-level term / prefix / wildcard leaves
    assert isinstance(parse_surround("scan"), Q.TermQuery)
    assert isinstance(parse_surround("sc*"), Q.PrefixQuery)
    assert isinstance(parse_surround("s?an"), Q.WildcardQuery)


def test_guards():
    with pytest.raises(SurroundParseError, match="not allowed inside"):
        parse_surround("3W(AND(a, b), c)")
    with pytest.raises(SurroundParseError):
        parse_surround("NOT(a)")  # NOT needs a positive side
    with pytest.raises(SurroundParseError):
        parse_surround("3W(a)")  # distance op needs >= 2 args
    with pytest.raises(SurroundParseError):
        parse_surround("0W(a, b)")


def test_end_to_end_matching_semantics():
    docs = [
        "filter then join now".split(),      # gap 1 ordered
        "join filter".split(),               # adjacent, wrong order
        "filter x y z join".split(),         # too far for 2N
        "window filter join".split(),        # excluded by NOT
        "nothing relevant".split(),
    ]
    reader, stats = oracle.index_token_lists(docs)
    eng = oracle.OracleEngine(reader, stats)
    q = eng.rewrite(parse_surround("AND(2N(filter, join), NOT(window))"))
    got = sorted(evaluate(reader, stats, q, 1.0, False).docids.tolist())
    assert got == [0, 1]  # unordered: doc 1 matches; 2 too far; 3 NOT'd
    q = eng.rewrite(parse_surround("2W(filter, join)"))
    got = sorted(evaluate(reader, stats, q, 1.0, False).docids.tolist())
    assert got == [0, 3]  # ordered drops doc 1; no NOT here, 3 is back

"""SimpleQueryParser transcription: tree shapes, right-to-left precedence,
negation wrapping, lenient degradation, end-to-end search parity."""

import pytest

from lucene_7_x_9_x_spark.plans import query as Q
from lucene_7_x_9_x_spark.plans.simple_parser import parse_simple

S, M, N = Q.Occur.SHOULD, Q.Occur.MUST, Q.Occur.MUST_NOT


def occs(q):
    return [c.occur for c in q.clauses]


def test_default_or_and_explicit_ops():
    q = parse_simple("a b")
    assert occs(q) == [S, S]
    q = parse_simple("a + b")
    assert occs(q) == [M, M]
    q = parse_simple("a | b")
    assert occs(q) == [S, S]


def test_right_to_left_precedence_wraps_on_operator_change():
    # "a | b + c" == (a OR b) AND c (class javadoc example)
    q = parse_simple("a | b + c")
    assert occs(q) == [M, M]
    inner = q.clauses[0].query
    assert isinstance(inner, Q.BooleanQuery) and occs(inner) == [S, S]
    assert q.clauses[1].query == Q.TermQuery("c")


def test_negation_wraps_with_matchall():
    q = parse_simple("a + -b")
    assert occs(q) == [M, M]
    neg = q.clauses[1].query
    assert isinstance(neg, Q.BooleanQuery)
    assert occs(neg) == [N, S]
    assert isinstance(neg.clauses[1].query, Q.MatchAllDocsQuery)
    # double negation cancels
    q2 = parse_simple("a + --b")
    assert q2.clauses[1].query == Q.TermQuery("b")


def test_phrase_prefix_fuzzy_and_near():
    q = parse_simple('"x y z"')
    assert q == Q.PhraseQuery(["x", "y", "z"], slop=0)
    q = parse_simple('"x y"~3')
    assert q == Q.PhraseQuery(["x", "y"], slop=3)
    assert parse_simple("abc*") == Q.PrefixQuery("abc")
    assert parse_simple("abc~1") == Q.FuzzyQuery("abc", max_edits=1)
    assert parse_simple("abc~") == Q.FuzzyQuery("abc", max_edits=2)
    assert parse_simple("abc~0") == Q.TermQuery("abc")  # fuzz 0 -> term
    assert parse_simple("abc~9") == Q.FuzzyQuery("abc", max_edits=2)


def test_lenient_degradation_never_raises():
    assert isinstance(parse_simple("*"), Q.MatchAllDocsQuery)
    assert isinstance(parse_simple(""), Q.MatchNoDocsQuery)
    assert isinstance(parse_simple(")("), Q.MatchNoDocsQuery)
    # unterminated quote: the '"' is extraneous, terms still parse
    q = parse_simple('"a b')
    assert occs(q) == [S, S]
    # unterminated paren likewise
    q = parse_simple("(a b")
    assert occs(q) == [S, S]
    # parens group: "(a | b) + c"
    q = parse_simple("(a | b) + c")
    assert occs(q) == [M, M]
    # escaped operators are literal (and vanish in analysis if symbolic)
    assert parse_simple(r"term\*") == Q.TermQuery("term")


def test_simple_parser_end_to_end(spark):
    import os
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    import tempfile
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(spark, docs, tempfile.mkdtemp() + "/i",
                      id_cols=["doc_id"], text_col="text", num_segments=2)
    s = Searcher(idx)
    got = s.search(parse_simple("filter | join + window"), 10).toPandas()
    want = s.search(
        Q.BooleanQuery([
            (M, Q.BooleanQuery([(S, Q.TermQuery("filter")),
                                (S, Q.TermQuery("join"))])),
            (M, Q.TermQuery("window"))]), 10).toPandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.score.tolist() == want.score.tolist()


def test_simple_parser_never_crashes_fuzz():
    # the module's contract: NO input errors — every string produces a
    # Query (hypothesis-style fuzz with a fixed corpus of nasty strings
    # plus random operator soup)
    import random
    nasty = ['', '*', '**', '"', '""', '(', ')', '((', '))', '+', '|',
             '-', '--', '~', '~~', '\\', 'a\\', '"a', 'a"b"c', '(a))(b',
             '+|-', 'a~x', 'a~-1', '"a b"~x', '-(-a)', 'a* b*~2',
             '\\(\\)\\"', 'a | | b', '+ + a', '()()', '"("', '")"']
    for s in nasty:
        q = parse_simple(s)
        assert isinstance(q, Q.Query), s
    rng = random.Random(42)
    alphabet = 'ab c()"+|-~*\\'
    for _ in range(500):
        s = ''.join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 30)))
        q = parse_simple(s)
        assert isinstance(q, Q.Query), repr(s)

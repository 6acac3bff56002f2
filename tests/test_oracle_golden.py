"""Golden tests transcribed from the reference's hand-computed fixtures:
TestWANDScorer.testBasics corpus + expectations
(solr-8.4.0/lucene/core/src/test/org/apache/lucene/search/TestWANDScorer.java:65-208)
plus BM25 value checks pinned to the float32 kernel."""

import math

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.functions import bm25
from lucene_7_x_9_x_spark.functions.smallfloat import byte4_to_int, int_to_byte4
from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.plans.query import (
    BooleanQuery, BoostQuery, ConstantScoreQuery, MatchAllDocsQuery,
    MatchNoDocsQuery, Occur, PhraseQuery, PrefixQuery, SynonymQuery,
    TermInSetQuery, TermQuery, TermRangeQuery, WildcardQuery, rewrite)

# F2 — the 6-doc corpus of TestWANDScorer.java:88-101
F2_DOCS = [["a", "b"], ["a"], [], ["a", "b", "c"], ["b"], ["b", "c"]]


def _f2_engine():
    reader, stats = oracle.index_token_lists(F2_DOCS)
    return oracle.OracleEngine(reader, stats)


def _const(term, boost):
    return BoostQuery(ConstantScoreQuery(TermQuery(term)), boost)


def test_wand_basics_disjunction():
    eng = _f2_engine()
    q = BooleanQuery([(Occur.SHOULD, _const("a", 2)),
                      (Occur.SHOULD, _const("b", 1)),
                      (Occur.SHOULD, _const("c", 3))])
    res = eng.search(q, 10)
    got = list(zip(res.docid.tolist(), res.score.tolist()))
    # expectations from TestWANDScorer.java:98-137: scores doc0=3 doc1=2
    # doc3=6 doc4=1 doc5=4, ordered score desc then docid asc
    assert got == [(3, 6.0), (5, 4.0), (0, 3.0), (1, 2.0), (4, 1.0)]


def test_wand_basics_min_competitive_threshold():
    eng = _f2_engine()
    q = BooleanQuery([(Occur.SHOULD, _const("a", 2)),
                      (Occur.SHOULD, _const("b", 1)),
                      (Occur.SHOULD, _const("c", 3))])
    res = eng.search(q, 2)  # top-2 == the >=4 set from the reference test
    got = list(zip(res.docid.tolist(), res.score.tolist()))
    assert got == [(3, 6.0), (5, 4.0)]


def test_wand_basics_filter():
    eng = _f2_engine()
    q = BooleanQuery([
        (Occur.MUST, BooleanQuery([(Occur.SHOULD, _const("a", 2)),
                                   (Occur.SHOULD, _const("b", 1))])),
        (Occur.FILTER, TermQuery("c"))])
    res = eng.search(q, 10)
    got = list(zip(res.docid.tolist(), res.score.tolist()))
    assert got == [(3, 3.0), (5, 1.0)]


def test_wand_basics_must_not():
    eng = _f2_engine()
    q = BooleanQuery([(Occur.SHOULD, _const("a", 2)),
                      (Occur.SHOULD, _const("b", 1)),
                      (Occur.MUST_NOT, TermQuery("c"))])
    res = eng.search(q, 10)
    got = list(zip(res.docid.tolist(), res.score.tolist()))
    assert got == [(0, 3.0), (1, 2.0), (4, 1.0)]


def test_min_should_match_2():
    # pattern of LuceneDemo9.10.0/src/main/java/org/example/TestWANDScore.java:42-72
    eng = _f2_engine()
    q = BooleanQuery([(Occur.SHOULD, _const("a", 2)),
                      (Occur.SHOULD, _const("b", 1)),
                      (Occur.SHOULD, _const("c", 3))],
                     minimum_should_match=2)
    res = eng.search(q, 10)
    assert res.docid.tolist() == [3, 5, 0]  # docs with >=2 matching terms
    assert res.score.tolist() == [6.0, 4.0, 3.0]


def test_bm25_hand_computed_single_term():
    """One-term BM25 against the closed-form float32 formula."""
    docs = [["x", "x", "y"], ["x"], ["y", "y", "y"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    res = eng.search(TermQuery("x"), 10)
    N, df = 3, 2
    idf = np.float32(math.log(1 + (N - df + 0.5) / (df + 0.5)))
    avgdl = np.float32(7 / 3)
    for docid, dl, tf in [(0, 3, 2), (1, 1, 1)]:
        qdl = np.float32(byte4_to_int(int_to_byte4(np.array([dl])))[0])
        cache = np.float32(1.0) / (np.float32(1.2) * (
            (np.float32(1) - np.float32(0.75))
            + (np.float32(0.75) * qdl) / avgdl))
        expected = idf - idf / (np.float32(1) + np.float32(tf) * cache)
        got = res[res.docid == docid].score.iloc[0]
        assert np.float32(got) == expected
    assert res.docid.tolist() == [1, 0]  # shorter doc outranks despite tf


def test_bm25_norm_quantization_ties():
    """Docs whose lengths quantize to the same norm byte tie exactly and
    order by docid (HitQueue.java:76-81)."""
    docs = [["t"] + ["pad"] * 41, ["t"] + ["pad"] * 42]  # 42,43 -> same bucket
    n = int_to_byte4(np.array([42, 43]))
    assert n[0] == n[1]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    res = eng.search(TermQuery("t"), 10)
    assert res.docid.tolist() == [0, 1]
    assert res.score.iloc[0] == res.score.iloc[1]


def test_phrase_query():
    docs = [["ably", "lily", "baby", "andy", "lucy", "ably"],
            ["lily", "ably", "baby"],
            ["baby", "lily"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    m = eng.matches(PhraseQuery(["lily", "baby"]))
    assert m.docids.tolist() == [0]
    m2 = eng.matches(PhraseQuery(["lily", "baby"], slop=1))
    assert m2.docids.tolist() == [0, 1]
    # repeated term tf>1
    m3 = eng.matches(TermQuery("ably"))
    assert m3.docids.tolist() == [0, 1]


def test_synonym_query_sums_freqs():
    docs = [["u", "v"], ["u", "u"], ["v"], ["w"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    res = eng.matches(SynonymQuery(["u", "v"]))
    assert res.docids.tolist() == [0, 1, 2]
    # doc0 freq 2, doc1 freq 2, doc2 freq 1, same dl=2 for 0,1 -> equal scores
    assert res.scores[0] == res.scores[1]


def test_multi_term_rewrites():
    docs = [["apple", "apply"], ["banana"], ["appoint"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    assert eng.matches(PrefixQuery("app")).docids.tolist() == [0, 2]
    assert eng.matches(WildcardQuery("app?y")).docids.tolist() == [0]
    assert eng.matches(TermRangeQuery("apple", "banana",
                                      include_upper=False)).docids.tolist() == [0, 2]
    assert eng.matches(TermInSetQuery(["banana", "nope"])).docids.tolist() == [1]


def test_boolean_rewrite_rules():
    # BooleanQuery.java:235-335 behaviors
    assert isinstance(rewrite(BooleanQuery([])), MatchNoDocsQuery)
    t = TermQuery("x")
    assert rewrite(BooleanQuery([(Occur.SHOULD, t)])) == t
    assert isinstance(
        rewrite(BooleanQuery([(Occur.MUST_NOT, t)])), MatchNoDocsQuery)
    assert isinstance(
        rewrite(BooleanQuery([(Occur.MUST, t), (Occur.MUST_NOT, t)])),
        MatchNoDocsQuery)
    assert isinstance(
        rewrite(BooleanQuery([(Occur.SHOULD, t),
                              (Occur.MUST_NOT, MatchAllDocsQuery())])),
        MatchNoDocsQuery)


def test_corpus_index_matches_token_lists():
    df = pd.DataFrame({"content": ["The quick fox", "quick-quick fox!", ""]})
    eng = oracle.OracleEngine(*oracle.index_corpus(df))
    m = eng.matches(TermQuery("quick"))
    assert m.docids.tolist() == [0, 1]
    assert eng.stats.doc_count == 2  # empty doc has no terms
    assert eng.stats.sum_total_term_freq == 6

"""Analyzer-chain synonyms — the SynonymGraphFilter capability
(solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymGraphFilter.java): query-time expansion into SynonymQuery /
graph boolean groups (QueryBuilder.analyzeGraphBoolean), and index-time
posIncr-0 injection with unchanged norms (BM25 discountOverlaps)."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import (AnalyzerConfig,
                                                     canon_synonyms,
                                                     tokenize_to_flat)
from lucene_7_x_9_x_spark.operators.build import invert_segment
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              PhraseQuery, SynonymQuery,
                                              TermQuery)

SYN = canon_synonyms({"quick": ("fast",), "rapid": ("fast", "speedy")})
IDX_CFG = AnalyzerConfig(synonyms=SYN, synonyms_at="index")


def test_canon_synonyms():
    assert canon_synonyms({"b": "a", "a": ("c", "b", "a")}) == (
        ("a", ("b", "c")), ("b", ("a",)))
    # lhs-only rules vanish
    assert canon_synonyms({"x": ("x",)}) == ()


def test_index_injection_stream():
    ri, pos, flat, dl = tokenize_to_flat(
        pd.Series(["the quick brown fox", "rapid dogs", "fast cats"]),
        IDX_CFG)
    # dl is pre-injection (discountOverlaps): 4, 2, 2
    assert dl.tolist() == [4, 2, 2]
    rows = sorted(zip(ri.tolist(), pos.tolist(), flat.tolist()))
    # doc 0: 'fast' injected at quick's position 1
    assert (0, 1, "fast") in rows and (0, 1, "quick") in rows
    # doc 1: BOTH alternatives injected at rapid's position 0
    assert (1, 0, "fast") in rows and (1, 0, "speedy") in rows
    # doc 2 untouched beyond its own tokens
    assert [r for r in rows if r[0] == 2] == [(2, 0, "fast"), (2, 1, "cats")]
    # stream stays (row, pos)-sorted for the delta encoders
    keys = list(zip(ri.tolist(), pos.tolist()))
    assert keys == sorted(keys)


def test_index_injection_postings_and_norms():
    pdf = pd.DataFrame({
        "id": ["d0", "d1", "d2"],
        "content": ["the quick brown fox", "rapid dogs run fast",
                    "slow snails"]})
    post_syn, dm_syn = invert_segment(
        pdf.copy(), segment=0, id_cols=["id"], text_col="content",
        cfg=IDX_CFG)
    post_plain, dm_plain = invert_segment(
        pdf.copy(), segment=0, id_cols=["id"], text_col="content",
        cfg=AnalyzerConfig())
    # norms identical: injected tokens are posIncr-0 overlaps
    assert dm_syn["norm"].tolist() == dm_plain["norm"].tolist()
    assert dm_syn["dl"].tolist() == dm_plain["dl"].tolist()
    fast_syn = post_syn[post_syn["term"] == "fast"].iloc[0]
    fast_plain = post_plain[post_plain["term"] == "fast"].iloc[0]
    # 'fast' gains quick's (d0) and rapid's (d1) occurrences:
    # df 1 -> 2 docs, ttf 1 -> 3 (d1 holds natural + injected)
    assert int(fast_plain["doc_freq"]) == 1
    assert int(fast_syn["doc_freq"]) == 2
    assert int(fast_syn["total_term_freq"]) == 3
    # natural terms untouched
    q = post_syn[post_syn["term"] == "quick"].iloc[0]
    assert int(q["doc_freq"]) == 1


def test_index_injection_phrase_across_synonym(spark, tmp_index_dir):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "the quick fox jumped"), (1, "a fast fox ran"),
         (2, "the rapid dog"), (3, "quick thinking wins")],
        "doc_id long, text string")
    idx = build_index(spark, docs, tmp_index_dir, id_cols=["doc_id"],
                      text_col="text", num_segments=2,
                      analyzer=IDX_CFG)
    s = Searcher(idx)
    # posIncr-0 injection: 'fast fox' phrase-matches the 'quick fox' doc
    got = {r["doc_id"] for r in
           s.search(PhraseQuery(["fast", "fox"]), 10).collect()}
    assert got == {0, 1}
    # plain term reaches every injected doc
    got = {r["doc_id"] for r in s.search(TermQuery("fast"), 10).collect()}
    assert got == {0, 1, 2, 3}
    # manifest roundtrip: the snapshot reconstructs the exact chain
    assert idx.analyzer.synonyms == SYN
    assert idx.analyzer.synonyms_at == "index"
    # and query-time expansion is OFF for index-time rules
    tq = s.text_query("quick fox")
    assert isinstance(tq, BooleanQuery)
    kinds = [type(c.query) for c in tq.clauses]
    assert kinds == [TermQuery, TermQuery]


def test_index_time_multiword_raises():
    cfg = AnalyzerConfig(synonyms=canon_synonyms({"new york": ("ny",)}),
                         synonyms_at="index")
    with pytest.raises(ValueError, match="single-word"):
        tokenize_to_flat(pd.Series(["new york pizza"]), cfg)


def test_query_time_expansion(spark, tmp_index_dir):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "the quick fox"), (1, "a fast fox"), (2, "new york pizza"),
         (3, "ny bagels"), (4, "plain bread")],
        "doc_id long, text string")
    cfg = AnalyzerConfig(synonyms=canon_synonyms(
        {"quick": ("fast",), "new york": ("ny",)}), synonyms_at="query")
    idx = build_index(spark, docs, tmp_index_dir, id_cols=["doc_id"],
                      text_col="text", num_segments=2, analyzer=cfg)
    s = Searcher(idx)
    # single-word group -> SynonymQuery (freqs summed, union df)
    q = s.text_query("quick fox")
    assert isinstance(q, BooleanQuery)
    syn = q.clauses[0].query
    assert isinstance(syn, SynonymQuery) and set(syn.terms) == {
        "quick", "fast"}
    # identical scores to the hand-assembled SynonymQuery
    want = s.search(BooleanQuery(
        [(Occur.SHOULD, SynonymQuery(["fast", "quick"])),
         (Occur.SHOULD, TermQuery("fox"))]), 10).collect()
    got = s.search(q, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]
    # multi-word lhs -> graph boolean group: phrase OR term
    q2 = s.text_query("new york pizza")
    grp = q2.clauses[0].query
    assert isinstance(grp, BooleanQuery)
    subs = {type(c.query) for c in grp.clauses}
    assert subs == {PhraseQuery, TermQuery}
    got2 = {r["doc_id"] for r in s.search(q2, 10).collect()}
    assert {2, 3}.issubset(got2)
    # longest-match consumed both tokens: 'york' is not a bare clause
    assert all(not (isinstance(c.query, TermQuery)
                    and c.query.term == "york") for c in q2.clauses)


def test_phrase_query_graph_builds_multi_phrase(spark, tmp_index_dir):
    # QueryBuilder.analyzeGraphPhrase role: a quoted phrase whose token
    # has single-word synonym alternatives becomes a MultiPhraseQuery
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.plans.query import MultiPhraseQuery
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "the quick fox jumps"), (1, "a fast fox naps"),
         (2, "quick brown fox"), (3, "fox quick")],
        "doc_id long, text string")
    cfg = AnalyzerConfig(synonyms=canon_synonyms(
        {"quick": ("fast",), "new york": ("ny",)}), synonyms_at="query")
    idx = build_index(spark, docs, str(tmp_index_dir) + "_pq",
                      id_cols=["doc_id"], text_col="text",
                      num_segments=2, analyzer=cfg)
    s = Searcher(idx)
    q = s.phrase_query("quick fox")
    assert isinstance(q, MultiPhraseQuery)
    assert q.term_arrays == (("fast", "quick"), ("fox",))
    got = s.search(q, 10).collect()
    # docs 0 and 1 match via the two alternatives; 2 and 3 are not
    # consecutive in order
    assert sorted(r["doc_id"] for r in got) == [0, 1]
    # no applicable rule -> plain PhraseQuery
    assert isinstance(s.phrase_query("brown fox"), PhraseQuery)

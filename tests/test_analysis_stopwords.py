"""StopFilter semantics: dropped stopwords leave position HOLES so phrase
positions skip them (solr-8.4.0/lucene/core/src/java/org/apache/lucene/
analysis/StopFilter.java:28,104 via FilteringTokenFilter)."""

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.functions.analysis import (AnalyzerConfig,
                                                     tokenize_to_flat)
from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.plans.query import PhraseQuery, TermQuery


def test_stopword_holes_preserve_positions():
    cfg = AnalyzerConfig(stopwords=frozenset({"the", "of"}))
    s = pd.Series(["queen the of england"])
    row, pos, terms, dl = tokenize_to_flat(s, cfg)
    assert list(terms) == ["queen", "england"]
    assert list(pos) == [0, 3]  # holes at 1,2 preserved, not renumbered
    assert dl.tolist() == [2]   # length discounts dropped stopwords


def test_phrase_across_stopword_hole_does_not_match_exact():
    cfg = AnalyzerConfig(stopwords=frozenset({"the"}))
    df = pd.DataFrame({"content": ["queen the england", "queen england"]})
    eng = oracle.OracleEngine(*oracle.index_corpus(df, "content", cfg))
    # exact phrase requires consecutive positions: doc0 has a hole
    m = eng.matches(PhraseQuery(["queen", "england"]))
    assert m.docids.tolist() == [1]
    # slop 1 bridges the single-stopword hole
    m2 = eng.matches(PhraseQuery(["queen", "england"], slop=1))
    assert m2.docids.tolist() == [0, 1]
    # stopword itself is not indexed
    assert eng.count(TermQuery("the")) == 0


def test_max_token_length_split():
    cfg = AnalyzerConfig(max_token_length=5)
    s = pd.Series(["abcdefghij xy"])
    row, pos, terms, dl = tokenize_to_flat(s, cfg)
    assert list(terms) == ["abcde", "fghij", "xy"]


def test_analyzer_config_travels_through_spark_index(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    cfg = AnalyzerConfig(stopwords=frozenset({"the"}))
    pdf = pd.DataFrame({"id": ["a", "b"],
                        "content": ["the quick fox", "quick the the fox"]})
    idx = build_index(spark, spark.createDataFrame(pdf), str(tmp_path / "i"),
                      id_cols=["id"], text_col="content", num_segments=1,
                      analyzer=cfg)
    # stopwords persisted in the manifest and excluded from the index
    idx2 = IndexSnapshot(spark, str(tmp_path / "i"))
    assert set(idx2.analyzer.stopwords) == {"the"}
    s = Searcher(idx2)
    assert s.count(TermQuery("the")) == 0
    assert s.count(TermQuery("quick")) == 2
    assert idx2.stats["sum_total_term_freq"] == 4  # 'the' discounted

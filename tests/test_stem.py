"""Porter stemmer (PorterStemFilter capability): full-pipeline behavior
pinned against the published algorithm's example vectors, chain order
(stopword holes before stemming), and end-to-end engine/oracle parity on
a stemmed index."""

import os

import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import AnalyzerConfig, \
    tokenize_series
from lucene_7_x_9_x_spark.functions.stem import porter_stem
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              TermQuery)

# full-pipeline outputs for examples drawn from M.F. Porter (1980),
# "An algorithm for suffix stripping" (incl. the famous
# GENERALIZATIONS -> GENER and OSCILLATORS -> OSCIL)
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "generalizations": "gener",
    "oscillators": "oscil", "relational": "relat", "rational": "ration",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "replacement": "replac", "adoption": "adopt", "adjustable": "adjust",
    "formative": "form", "formalize": "formal", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controlling": "control",
    "rolled": "roll", "running": "run", "runs": "run",
    "easily": "easili", "itemization": "item", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    "having": "have", "stating": "state", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "meetings": "meet",
}


def test_published_vectors():
    bad = {w: (porter_stem(w), want) for w, want in VECTORS.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_short_words_unchanged_and_idempotent_on_vocab():
    assert porter_stem("at") == "at"
    assert porter_stem("by") == "by"
    for w in VECTORS:
        s = porter_stem(w)
        assert isinstance(s, str) and s


def test_chain_order_stopwords_then_stem():
    # stopword holes are carved BEFORE stemming (Lucene's EnglishAnalyzer
    # order); the stopword is matched on the unstemmed token
    cfg = AnalyzerConfig(stopwords=frozenset({"running"}),
                         stemmer="porter")
    toks = tokenize_series(pd.Series(["the running runner"]), cfg)
    assert list(toks[0]) == ["the", None, "runner"]


def test_engine_stemmed_search_matches_oracle(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark import oracle
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    import numpy as np
    texts = ["the runner was running", "connections connected",
             "relational arguments", "run fast", "argue the argument",
             "generalizations oscillators"] * 4
    cfg = AnalyzerConfig(stemmer="porter")
    out = str(tmp_path_factory.mktemp("stem_idx"))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string").repartitionByRange(2, "doc_id")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input", analyzer=cfg)
    assert "run" in {r.term for r in idx.terms().collect()}
    assert "running" not in {r.term for r in idx.terms().collect()}
    # snapshot round-trips the stemmer through the manifest
    from lucene_7_x_9_x_spark.index import IndexSnapshot
    assert IndexSnapshot(spark, out).analyzer.stemmer == "porter"
    s = Searcher(idx)
    eng = oracle.OracleEngine(*oracle.index_corpus(
        pd.DataFrame({"text": texts}), text_col="text", cfg=cfg))
    for q in [TermQuery("run"),
              BooleanQuery([(Occur.SHOULD, TermQuery("connect")),
                            (Occur.SHOULD, TermQuery("argu"))])]:
        got = s.search(q, 10).toPandas()
        want = eng.search(q, 10)
        assert [int(x) for x in got.doc_id] == \
            [int(d) for d in want.docid], q
        np.testing.assert_array_equal(
            got.score.to_numpy(np.float32),
            want.score.to_numpy(np.float32), str(q))


def test_searcher_analyze_uses_index_analyzer(spark, tmp_path_factory):
    # query text analyzed with the index's OWN chain (stemming included):
    # the QueryParser-shares-the-Analyzer discipline
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("an_idx"))
    df = spark.createDataFrame(
        [(0, "the runner was running"), (1, "nothing here")],
        "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input",
                      analyzer=AnalyzerConfig(stemmer="porter"))
    s = Searcher(idx)
    assert s.analyze("Running Connections!") == ["run", "connect"]
    got = s.search(s.text_query("running runners"), 5).toPandas()
    assert list(got.doc_id) == [0]


def test_stemmed_index_offsets_highlight_surface_forms(spark,
                                                       tmp_path_factory):
    # stemmed term + stored offsets = the UnifiedHighlighter-with-
    # EnglishAnalyzer behavior: querying the stem highlights the original
    # inflected surface spans (offsets keep the pre-stem char ranges)
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("stemoff_idx"))
    texts = ["He runs fast and keeps running daily", "nothing to see"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input", with_offsets=True,
                      analyzer=AnalyzerConfig(stemmer="porter"))
    s = Searcher(idx)
    rows = s.term_offsets("run").collect()
    assert len(rows) == 1
    r = rows[0]
    spans = [texts[0][a:b] for a, b in zip(r.starts, r.ends)]
    assert spans == ["runs", "running"]

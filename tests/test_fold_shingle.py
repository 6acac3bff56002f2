"""ASCIIFoldingFilter + ShingleFilter analyzer stages.

References (behavior, not code):
  solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
    miscellaneous/ASCIIFoldingFilter.java — accented Latin folds to ASCII.
  solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
    shingle/ShingleFilter.java — token n-grams emitted alongside unigrams
    (outputUnigrams=true), dl/norms unchanged (overlap tokens).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import (
    UNICODE_TOKEN_REGEX, AnalyzerConfig, fold_ascii, fold_sql,
    tokenize_to_flat, tokenize_to_flat_with_offsets, unicode_analyzer)


def test_fold_basic():
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("zürich") == "zurich"
    assert fold_ascii("naïve") == "naive"
    assert fold_ascii("straße") == "strasse"
    assert fold_ascii("œuvre") == "oeuvre"
    assert fold_ascii("encyclopædia") == "encyclopaedia"
    assert fold_ascii("þorn") == "thorn"
    assert fold_ascii("łódź") == "lodz"
    assert fold_ascii("ascii_only") == "ascii_only"


def test_fold_sql_matches_python():
    # the DuckDB expression generated from the SAME tables reproduces the
    # Python fold bit-for-bit over every mapped character
    from lucene_7_x_9_x_spark.functions.analysis import (_FOLD_1TO1,
                                                         _FOLD_MULTI)
    toks = ["café", "zürich", "straße", "œuf", "ĳs", "þing", "señor",
            "plain", "ångström", "ŉx"]
    toks += [c for srcs in _FOLD_1TO1 for c in srcs]
    toks += list(_FOLD_MULTI)
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + fold_sql("t") + " FROM (SELECT unnest(?) AS t)",
        [toks]).fetchall()
    assert [g[0] for g in got] == [fold_ascii(t) for t in toks]


def test_fold_in_chain_before_stop_and_stem():
    cfg = AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX, ascii_fold=True,
                         stopwords=frozenset({"uber"}), stemmer="porter")
    ri, pos, flat, dl = tokenize_to_flat(
        pd.Series(["über Cafés running"]), cfg)
    # über folds to uber then stops (hole at position 0); cafés folds then
    # stems (cafe -> cafe); running stems to run
    assert flat.tolist() == ["cafe", "run"]
    assert pos.tolist() == [1, 2]
    assert dl.tolist() == [2]


def test_fold_offsets_path_parity():
    cfg = unicode_analyzer()
    cfg = AnalyzerConfig(token_regex=cfg.token_regex, ascii_fold=True)
    txt = pd.Series(["Zürich Straße café", "plain ascii"])
    ri, pos, flat, dl = tokenize_to_flat(txt, cfg)
    ri2, pos2, flat2, dl2, st, en = tokenize_to_flat_with_offsets(txt, cfg)
    assert flat.tolist() == flat2.tolist() == [
        "zurich", "strasse", "cafe", "plain", "ascii"]
    assert pos.tolist() == pos2.tolist()
    # offsets index the ORIGINAL text spans
    assert txt[0][st[0]:en[0]] == "Zürich"
    assert txt[0][st[1]:en[1]] == "Straße"


def test_shingle_stream():
    cfg = AnalyzerConfig(shingles=(2,))
    ri, pos, flat, dl = tokenize_to_flat(
        pd.Series(["the quick brown fox", "one"]), cfg)
    rows = list(zip(ri.tolist(), pos.tolist(), flat.tolist()))
    # dl counts unigrams only (overlap discount)
    assert dl.tolist() == [4, 1]
    assert (0, 0, "the quick") in rows
    assert (0, 1, "quick brown") in rows
    assert (0, 2, "brown fox") in rows
    assert (0, 3, "fox") in rows
    assert [r for r in rows if r[0] == 1] == [(1, 0, "one")]
    # stream stays (row, pos)-sorted
    keys = list(zip(ri.tolist(), pos.tolist()))
    assert keys == sorted(keys)


def test_shingle_sizes_2_3():
    cfg = AnalyzerConfig(shingles=(2, 3))
    ri, pos, flat, dl = tokenize_to_flat(pd.Series(["a b c d"]), cfg)
    terms = set(flat.tolist())
    assert {"a b", "b c", "c d", "a b c", "b c d"} <= terms
    assert dl.tolist() == [4]


def test_shingle_stopword_hole_breaks():
    cfg = AnalyzerConfig(shingles=(2,), stopwords=frozenset({"the"}))
    ri, pos, flat, dl = tokenize_to_flat(
        pd.Series(["quick the brown fox"]), cfg)
    terms = flat.tolist()
    # no shingle across the hole (positions 0 and 2 are not consecutive)
    assert "quick brown" not in terms
    assert "brown fox" in terms


def test_shingle_offsets_span():
    cfg = AnalyzerConfig(shingles=(2,))
    txt = pd.Series(["alpha beta gamma"])
    ri, pos, flat, dl, st, en = tokenize_to_flat_with_offsets(txt, cfg)
    i = flat.tolist().index("alpha beta")
    assert txt[0][st[i]:en[i]] == "alpha beta"
    i = flat.tolist().index("beta gamma")
    assert txt[0][st[i]:en[i]] == "beta gamma"


def test_shingle_index_end_to_end(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.plans.query import TermQuery
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["the fast fox jumps", "a fast dog", "the fast the fast",
                 "fast the fast", "nothing here", "the end"]})
    df = spark.createDataFrame(pdf).repartition(2, "doc_id")
    idx = build_index(spark, df, str(tmp_path / "idx"), id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      analyzer=AnalyzerConfig(shingles=(2,)))
    s = Searcher(idx)
    got = {r["doc_id"] for r in
           s.search(TermQuery("the fast"), 10).collect()}
    assert got == {0, 2, 3}
    # norms match an unshingled build (overlap tokens don't count)
    idx2 = build_index(spark, df, str(tmp_path / "idx2"),
                       id_cols=["doc_id"], text_col="text",
                       segment_by="input")
    n1 = {r["doc_id"]: r["norm"] for r in idx.docmap().collect()}
    n2 = {r["doc_id"]: r["norm"] for r in idx2.docmap().collect()}
    assert n1 == n2


def test_fold_index_end_to_end(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf = pd.DataFrame({
        "doc_id": list(range(4)),
        "text": ["le café de Zürich", "the cafe in town",
                 "straße und weg", "unrelated words"]})
    df = spark.createDataFrame(pdf).repartition(2, "doc_id")
    cfg = AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX, ascii_fold=True)
    idx = build_index(spark, df, str(tmp_path / "idx"), id_cols=["doc_id"],
                      text_col="text", segment_by="input", analyzer=cfg)
    s = Searcher(idx)
    got = {r["doc_id"] for r in s.search(TermQuery("cafe"), 10).collect()}
    assert got == {0, 1}
    got = {r["doc_id"] for r in
           s.search(TermQuery("strasse"), 10).collect()}
    assert got == {2}
    # manifest round-trips the new chain stages
    from lucene_7_x_9_x_spark.index import IndexSnapshot
    snap = IndexSnapshot(spark, str(tmp_path / "idx"))
    assert snap.analyzer.ascii_fold is True
    assert snap.analyzer.shingles == ()

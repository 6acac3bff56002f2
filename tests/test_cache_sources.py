"""LRU query cache (filter-cache analogue) and multi-format corpus
ingestion: jsonl/csv/text corpora build indexes identical to parquet."""

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.index import build_index
from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery
from lucene_7_x_9_x_spark.sources.ingest import read_corpus
from tests.test_search import _random_corpus


def test_query_cache_hits_and_eviction(spark, tmp_path):
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(31)
    pdf = _random_corpus(rng, n_docs=150)
    idx = build_index(spark, spark.createDataFrame(pdf), str(tmp_path / "i"),
                      id_cols=["id"], text_col="content", num_segments=2)
    s = Searcher(idx)
    s.query_cache.max_entries = 2
    q1 = TermQuery("h0")
    a = s.cached_matches(q1)
    b = s.cached_matches(q1)
    assert a is b and a.is_cached
    assert s.query_cache.hits == 1 and s.query_cache.misses == 1
    # results equal to the uncached path
    want = set(map(tuple, s.matches(q1).select("segment", "docid")
                   .collect()))
    got = set(map(tuple, a.collect()))
    assert got == want
    # rewritten-tree keying: an equivalent 1-clause boolean hits the cache
    assert s.cached_matches(
        BooleanQuery([(Occur.SHOULD, TermQuery("h0"))])) is a
    # eviction unpersists LRU
    s.cached_matches(TermQuery("h1"))
    s.cached_matches(TermQuery("h2"))  # evicts q1
    assert not a.is_cached
    assert len(s.query_cache._entries) == 2


def _expected_hits(spark, docs_pdf, tmp_path, name):
    out = str(tmp_path / name)
    idx = build_index(spark, spark.createDataFrame(docs_pdf), out,
                      id_cols=["id"], text_col="content", num_segments=2)
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(idx)
    return set(s.search(TermQuery("h0"), 10, with_ids=True)
               .toPandas()["id"])


def test_jsonl_and_csv_corpus_build_matches_parquet(spark, tmp_path):
    rng = np.random.RandomState(32)
    pdf = _random_corpus(rng, n_docs=120)
    pq = str(tmp_path / "c.parquet")
    spark.createDataFrame(pdf).write.parquet(pq)
    want = _expected_hits(
        spark, pd.DataFrame(read_corpus(spark, pq, "parquet",
                                        text_col="content",
                                        id_cols=["id"]).toPandas()),
        tmp_path, "ipq")

    jl = str(tmp_path / "c.jsonl")
    spark.createDataFrame(pdf).write.json(jl)
    got_j = _expected_hits(
        spark, read_corpus(spark, jl, "jsonl", text_col="content",
                           id_cols=["id"]).toPandas(), tmp_path, "ijl")
    assert got_j == want

    cs = str(tmp_path / "c.csv")
    spark.createDataFrame(pdf).write.option("header", "true").csv(cs)
    got_c = _expected_hits(
        spark, read_corpus(spark, cs, "csv", text_col="content",
                           id_cols=["id"]).toPandas(), tmp_path, "icsv")
    assert got_c == want


def test_text_corpus_stable_ids(spark, tmp_path):
    src = tmp_path / "lines"
    src.mkdir()
    (src / "a.txt").write_text("alpha beta\ngamma delta\n")
    (src / "b.txt").write_text("epsilon zeta\n")
    df1 = read_corpus(spark, str(src), "text").toPandas()
    df2 = read_corpus(spark, str(src), "text").toPandas()
    assert sorted(df1.doc_uri) == sorted(df2.doc_uri)  # deterministic
    assert len(set(df1.doc_uri)) == 3
    assert set(df1.text) == {"alpha beta", "gamma delta", "epsilon zeta"}


def test_read_corpus_validates_columns(spark, tmp_path):
    import pytest
    pq = str(tmp_path / "v.parquet")
    spark.createDataFrame(pd.DataFrame({"x": [1]})).write.parquet(pq)
    with pytest.raises(ValueError, match="missing columns"):
        read_corpus(spark, pq, "parquet", text_col="content")

"""End-to-end user journey: ingest a jsonl corpus, build, parse a query
string, search, highlight, facet, delete a hit, compact, search again —
every stage through the public API, the way a reference user would drive
the engine after switching."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.functions.facets import range_facets
from lucene_7_x_9_x_spark.functions.highlight import highlight_snippets
from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.deletes import (compact_index,
                                                    delete_by_ids)
from lucene_7_x_9_x_spark.plans.parser import parse
from lucene_7_x_9_x_spark.searcher import Searcher
from lucene_7_x_9_x_spark.sources.ingest import read_corpus
from tests.test_search import _random_corpus


def test_full_user_journey(spark, tmp_path):
    rng = np.random.RandomState(99)
    pdf = _random_corpus(rng, n_docs=200)
    jl = str(tmp_path / "corpus.jsonl")
    spark.createDataFrame(pdf).write.json(jl)

    # ingest -> build
    corpus = read_corpus(spark, jl, "jsonl", text_col="content",
                         id_cols=["id"])
    out = str(tmp_path / "idx")
    idx = build_index(spark, corpus, out, id_cols=["id"],
                      text_col="content", num_segments=3)
    s = Searcher(idx)

    # parse + search
    q = parse("h0 AND h1 OR h2")
    top = s.search(q, 10, with_ids=True).toPandas()
    assert len(top) == 10
    assert top["rank"].tolist() == list(range(1, 11))

    # highlight the hits
    hits = spark.createDataFrame(pdf[pdf["id"].isin(top["id"])])
    snips = highlight_snippets(hits, ["h0", "h1"], text_col="content",
                               id_col="id").toPandas()
    assert len(snips) == 10 and all("<b>" in x for x in snips.snippet)

    # range facets over the match set
    m = s.matches(q)
    fr = range_facets(m, s.index.docmap(), "dl",
                      [("short", 0, 10), ("long", 10, 10**9)]).toPandas()
    assert fr.cnt.sum() == s.count(q)

    # delete the top hit; a reloaded searcher refills k from below
    victim = top["id"].iloc[0]
    assert delete_by_ids(spark, out, spark.createDataFrame(
        pd.DataFrame({"id": [victim]}))) == 1
    s2 = Searcher(IndexSnapshot(spark, out))
    top2 = s2.search(q, 10, with_ids=True).toPandas()
    assert victim not in set(top2["id"]) and len(top2) == 10
    assert top2["id"].tolist() == top["id"].iloc[1:].tolist() + \
        [top2["id"].iloc[-1]]

    # compact and verify the tombstone is applied physically
    compacted = compact_index(spark, IndexSnapshot(spark, out),
                              str(tmp_path / "cidx"))
    s3 = Searcher(compacted)
    top3 = s3.search(q, 10, with_ids=True).toPandas()
    assert top3["id"].tolist() == top2["id"].tolist()
    assert compacted.deletes() is None


def test_round3_surface_journey(spark, tmp_path):
    """The round-3 API surface in one scenario: sorted build, simple-syntax
    query, spell correction, function score, block join, percolation,
    structural check, replication."""
    from lucene_7_x_9_x_spark.plans.simple_parser import parse_simple
    from lucene_7_x_9_x_spark.plans.query import TermQuery
    from lucene_7_x_9_x_spark.index import check_index, replicate
    from lucene_7_x_9_x_spark.streaming.monitor import (percolate,
                                                        register_queries,
                                                        percolate_indexed)
    rng = np.random.RandomState(7)
    pdf = _random_corpus(rng, n_docs=150)
    corpus = spark.createDataFrame(pdf).withColumn(
        "n_chars", F.length("content"))
    out = str(tmp_path / "idx")
    idx = build_index(spark, corpus, out, id_cols=["id"],
                      text_col="content", num_segments=3,
                      sort_by="n_chars")
    s = Searcher(idx)

    # simple-syntax query end-to-end
    top = s.search(parse_simple("h0 | h1 + h2"), 5).toPandas()
    assert len(top) == 5

    # sorted top-k = global shortest docs
    st = s.sorted_topk(5).toPandas()
    want = corpus.orderBy("n_chars", "id").limit(5).toPandas()
    assert st.n_chars.tolist() == want.n_chars.tolist()

    # spelling correction from the index's own dictionary
    assert any(x["term"] == "h0" for x in s.spell_correct("h0x"))

    # function-scored and parent-rolled variants run end-to-end
    assert len(s.function_score(TermQuery("h0"), "dl", "multiply",
                                5).collect()) == 5
    assert len(s.to_parent_join(TermQuery("h0"), F.expr("docid DIV 8"),
                                "max", 5).collect()) == 5

    # percolate the corpus against registered queries, both shapes agree
    qs = {"a": TermQuery("h0"), "b": parse_simple("h1 + h2")}
    got_b = {(r["query_id"], r["id"]) for r in
             percolate(corpus, qs, id_col="id",
                       text_col="content").collect()}
    qt, qd, ma = register_queries(spark, qs)
    got_i = {(r["query_id"], r["id"]) for r in
             percolate_indexed(corpus, qt, qd, ma, id_col="id",
                               text_col="content").collect()}
    assert got_b == got_i and got_b

    # structural check + replication round-trip
    assert check_index(spark, idx)["clean"]
    rep = replicate(spark, idx, str(tmp_path / "replica"))
    assert (Searcher(rep).search(TermQuery("h0"), 5).toPandas().id.tolist()
            == s.search(TermQuery("h0"), 5).toPandas().id.tolist())

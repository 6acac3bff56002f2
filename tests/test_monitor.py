"""Percolation (the monitor module's Monitor.match capability): registered
queries vs streamed documents, batch == streaming, presearcher skip
correctness."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.streaming.monitor import percolate
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery,
                                              MatchAllDocsQuery, Occur,
                                              PhraseQuery, SpanNearQuery,
                                              TermQuery)

SF = "/root/testdata/sf0.001"

QUERIES = {
    "q_term": TermQuery("filter"),
    "q_conj": BooleanQuery([(Occur.MUST, TermQuery("group")),
                            (Occur.MUST, TermQuery("query"))]),
    "q_phrase": PhraseQuery(["the", "fast"]),
    "q_not": BooleanQuery([(Occur.MUST, MatchAllDocsQuery()),
                           (Occur.MUST_NOT, TermQuery("the"))]),
    "q_span": SpanNearQuery(("key", "hash"), slop=3),
}


def _expected(docs_pdf):
    import re
    out = set()
    for r in docs_pdf.itertuples():
        toks = [t for t in re.split(r"[^a-z0-9_]+", r.text.lower()) if t]
        s = set(toks)
        if "filter" in s:
            out.add(("q_term", r.doc_id))
        if "group" in s and "query" in s:
            out.add(("q_conj", r.doc_id))
        if any(a == "the" and b == "fast"
               for a, b in zip(toks, toks[1:])):
            out.add(("q_phrase", r.doc_id))
        if "the" not in s:
            out.add(("q_not", r.doc_id))
        pk = [i for i, t in enumerate(toks) if t == "key"]
        ph = [i for i, t in enumerate(toks) if t == "hash"]
        if any(0 < h - k <= 4 for k in pk for h in ph):
            out.add(("q_span", r.doc_id))
    return out


def test_percolate_matches_bruteforce(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(docs, QUERIES).collect()}
    want = _expected(docs.select("doc_id", "text").toPandas())
    assert got == want


def test_percolate_presearcher_skips_but_stays_exact(spark):
    # a query whose vocabulary is absent from the corpus is skipped by the
    # prefilter and (equivalently) matches nothing
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    qs = {"gone": TermQuery("zzqqxxnotaterm"), "there": TermQuery("filter")}
    got = percolate(docs, qs).groupBy("query_id").count().collect()
    counts = {r["query_id"]: r["count"] for r in got}
    assert "gone" not in counts and counts["there"] > 0


def test_percolate_rejects_unrewritten_queries(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    from lucene_7_x_9_x_spark.plans.query import PrefixQuery
    with pytest.raises(ValueError, match="rewrite"):
        percolate(docs, {"p": PrefixQuery("fil")})


def test_percolate_streaming_equals_batch(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema).parquet(src))
    out = percolate(stream, QUERIES)
    q = (out.writeStream.format("memory").queryName("perc")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["query_id"], r["doc_id"])
           for r in spark.sql("SELECT * FROM perc").collect()}
    want = {(r["query_id"], r["doc_id"])
            for r in percolate(docs, QUERIES).collect()}
    assert got == want


def test_presearcher_never_skips_negated_matchall(spark):
    # MUST(MatchAll) + MUST_NOT(absent-term) matches EVERY doc of a batch
    # that lacks the term — the prefilter must not skip it (MUST_NOT terms
    # are not match requirements)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n = docs.count()
    q = {"neg": BooleanQuery([(Occur.MUST, MatchAllDocsQuery()),
                              (Occur.MUST_NOT,
                               TermQuery("zzqqabsenteverywhere"))])}
    assert percolate(docs, q).count() == n


def test_percolate_indexed_parity_with_broadcast(spark):
    from lucene_7_x_9_x_spark.streaming.monitor import (percolate_indexed,
                                                        register_queries)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    qt, qd, ma = register_queries(spark, QUERIES)
    got = {(r["query_id"], r["doc_id"])
           for r in percolate_indexed(docs, qt, qd, ma).collect()}
    want = {(r["query_id"], r["doc_id"])
            for r in percolate(docs, QUERIES).collect()}
    assert got == want


def test_percolate_indexed_matchall_bypass(spark):
    from lucene_7_x_9_x_spark.streaming.monitor import (percolate_indexed,
                                                        register_queries)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n = docs.count()
    qs = {"neg": BooleanQuery([(Occur.MUST, MatchAllDocsQuery()),
                               (Occur.MUST_NOT,
                                TermQuery("zzqqabsenteverywhere"))])}
    qt, qd, ma = register_queries(spark, qs)
    assert ma == ["neg"]
    assert percolate_indexed(docs, qt, qd, ma).count() == n


def test_percolate_rejects_unregistered_field_queries(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    fieldq = {"f": TermQuery("fast", field="head")}
    with pytest.raises(ValueError, match="field-scoped"):
        percolate(docs, fieldq)  # 'head' not passed via extra_fields


def _field_docs(spark):
    rows = [(0, "alpha beta gamma", "news flash"),
            (1, "delta alpha", "sports update"),
            (2, "omega", "news roundup")]
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, head string")


FIELD_QUERIES = {
    "q_head": TermQuery("news", field="head"),
    "q_mixed": BooleanQuery([(Occur.MUST, TermQuery("alpha")),
                             (Occur.MUST,
                              TermQuery("update", field="head"))]),
    "q_body": TermQuery("omega"),
}
FIELD_WANT = {("q_head", 0), ("q_head", 2), ("q_mixed", 1), ("q_body", 2)}


def test_percolate_field_scoped(spark):
    # multi-field memory index (MemoryIndex.addField per field)
    docs = _field_docs(spark)
    got = {(r.query_id, r.doc_id)
           for r in percolate(docs, FIELD_QUERIES,
                              extra_fields=[("head", "head")]).collect()}
    assert got == FIELD_WANT


def test_percolate_indexed_field_scoped(spark):
    from lucene_7_x_9_x_spark.streaming.monitor import (percolate_indexed,
                                                        register_queries)
    docs = _field_docs(spark)
    qt, qd, ma = register_queries(spark, FIELD_QUERIES)
    # field-scoped covering terms carry the field name
    rows = {(r.query_id, r.field, r.term) for r in qt.collect()}
    assert ("q_head", "head", "news") in rows
    got = {(r.query_id, r.doc_id)
           for r in percolate_indexed(
               docs, qt, qd, ma,
               extra_fields=[("head", "head")]).collect()}
    assert got == FIELD_WANT


def test_presearcher_indexes_only_most_selective_conjunct(spark):
    # TermFilteredPresearcher weighting: a conjunction containing a
    # stop-term must index ONLY its rare term — indexing 'the' would pair
    # the query with nearly every doc in the candidate join (the skew that
    # kills indexed percolation at scale)
    from lucene_7_x_9_x_spark.streaming.monitor import register_queries
    qs = {"q": BooleanQuery([(Occur.MUST, TermQuery("the")),
                             (Occur.MUST, TermQuery("paradoxically"))])}
    # token-length heuristic (no df stats)
    qt, _, ma = register_queries(spark, qs)
    assert ma == []
    assert [(r.query_id, r.term) for r in qt.collect()] == \
        [("q", "paradoxically")]
    # df-weighted: explicit stats override the length proxy
    qt2, _, _ = register_queries(
        spark, {"q": BooleanQuery([(Occur.MUST, TermQuery("zz")),
                                   (Occur.MUST, TermQuery("longcommon"))])},
        term_df={"longcommon": 50_000, "zz": 3})
    assert [(r.query_id, r.term) for r in qt2.collect()] == [("q", "zz")]


def test_presearcher_disjunction_keeps_every_branch(spark):
    # a disjunct can match on its own, so no branch may be dropped; a
    # phrase (conjunction of its terms) contributes only its rarest term
    from lucene_7_x_9_x_spark.streaming.monitor import register_queries
    qs = {"q": BooleanQuery([(Occur.SHOULD, TermQuery("alpha")),
                             (Occur.SHOULD,
                              PhraseQuery(["the", "excellent"]))])}
    qt, _, _ = register_queries(spark, qs)
    assert {r.term for r in qt.collect()} == {"alpha", "excellent"}


def test_percolate_indexed_skewed_corpus_stop_conjunction(spark):
    # end-to-end on a skewed corpus: every doc holds 'the'; the stop-term
    # conjunction query must produce candidates ONLY for docs holding the
    # rare term (candidate pairs stay bounded by the rare term's df, not
    # the corpus size), and the result must equal broadcast percolation
    from lucene_7_x_9_x_spark.streaming.monitor import (percolate_indexed,
                                                        register_queries)
    rows = [(i, "the common filler text row number %d" % i)
            for i in range(400)]
    rows += [(1000 + i, "the raremarker appears here %d" % i)
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = {"q": BooleanQuery([(Occur.MUST, TermQuery("the")),
                             (Occur.MUST, TermQuery("raremarker"))])}
    qt, qd, ma = register_queries(spark, qs)
    # the presearcher table holds only the rare term -> the candidate join
    # touches 5 docs, not 405
    from pyspark.sql import functions as FF
    from lucene_7_x_9_x_spark.pipeline.dedup import TOKEN_SPLIT
    toks = FF.array_distinct(FF.filter(
        FF.split(FF.lower(FF.col("text")), TOKEN_SPLIT),
        lambda x: x != ""))
    cand_pairs = (docs.select("doc_id", FF.explode(toks).alias("term"))
                  .join(qt, "term").count())
    assert cand_pairs == 5
    got = {(r.query_id, r.doc_id)
           for r in percolate_indexed(docs, qt, qd, ma).collect()}
    want = {(r.query_id, r.doc_id)
            for r in percolate(docs, qs).collect()}
    assert got == want and len(got) == 5

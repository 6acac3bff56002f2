"""Searcher.explain parity: per-term contributions must sum (float64 acc,
float32 cast — the disjunction accumulation rule) to the search score."""

import numpy as np

from lucene_7_x_9_x_spark.index import build_index
from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery
from tests.test_search import _random_corpus


def test_explain_sums_to_score(spark, tmp_path):
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(3)
    pdf = _random_corpus(rng, n_docs=200)
    idx = build_index(spark, spark.createDataFrame(pdf), str(tmp_path / "i"),
                      id_cols=["id"], text_col="content", num_segments=2)
    s = Searcher(idx)
    q = BooleanQuery([(Occur.SHOULD, TermQuery("h0")),
                      (Occur.SHOULD, TermQuery("h1")),
                      (Occur.SHOULD, TermQuery("h2"))])
    top = s.search(q, 3, with_ids=False).toPandas()
    for r in top.itertuples():
        ex = s.explain(q, int(r.segment), int(r.docid))
        assert ex, "explain returned no contributions for a hit"
        total = np.float32(sum(np.float64(np.float32(e["score"]))
                               for e in ex))
        assert total == np.float32(r.score), (r, ex)
        for e in ex:
            assert e["tf"] >= 1 and e["doc_freq"] >= 1
            assert 0 < e["idf"]


def test_explain_spans_and_intervals(spark, tmp_path_factory):
    # span/interval explain: sloppy_freq + per-term idf inputs + a score
    # that float32-reconstructs the hit's actual score
    import numpy as np
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    from lucene_7_x_9_x_spark.plans.query import (IntervalOr,
                                                  IntervalOrdered,
                                                  IntervalQuery,
                                                  IntervalTerm,
                                                  SpanNearQuery)
    out = str(tmp_path_factory.mktemp("exp_idx"))
    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, out, id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    s = Searcher(idx)
    for q in [SpanNearQuery(("key", "hash"), slop=3),
              IntervalQuery(IntervalOrdered(
                  (IntervalTerm("key"),
                   IntervalOr((IntervalTerm("hash"),
                               IntervalTerm("row")))), max_gaps=4))]:
        hits = s.search(q, 3).collect()
        assert hits, q
        h = hits[0]
        rows = s.explain(q, int(h.segment), int(h.docid))
        assert rows and "sloppy_freq" in rows[0]
        assert rows[0]["sloppy_freq"] > 0
        assert np.float32(rows[0]["score"]) == np.float32(h.score)
        assert any("idf" in r for r in rows[1:])

"""Deletes / updates: liveDocs-style tombstones filter results (before
top-k), stats stay unchanged until refresh (Lucene docFreq-with-deletes
behavior), merge remaps tombstones, update replaces content."""

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids, update_docs
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              TermQuery)
from tests.test_search import _random_corpus


def _ids(spark, vals):
    return spark.createDataFrame([(str(v),) for v in vals], "id string")


def test_delete_filters_matches_and_topk(spark, tmp_path):
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(11)
    pdf = _random_corpus(rng, n_docs=300)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=3)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h0")
    before = s0.search(q, 5, with_ids=True).toPandas()
    assert len(before) == 5
    victims = before["id"].tolist()[:2]
    n = delete_by_ids(spark, out, _ids(spark, victims))
    assert n == 2
    # snapshot isolation: the already-open searcher still sees them
    assert set(victims) <= set(
        s0.search(q, 5, with_ids=True).toPandas()["id"])
    s1 = Searcher(IndexSnapshot(spark, out))
    after = s1.search(q, 5, with_ids=True).toPandas()
    assert len(after) == 5  # k is refilled from below, not truncated
    assert not set(victims) & set(after["id"])
    assert s1.count(q) == s0.count(q) - 2
    # stats unchanged until refresh (docFreq includes deleted docs)
    assert s1.index.stats == s0.index.stats
    # batched path honors tombstones too
    sm = s1.search_many({"a": q}, 5).toPandas()
    dm = s1.index.docmap().select("segment", "docid", "id").toPandas()
    got_ids = sm.merge(dm, on=["segment", "docid"])["id"]
    assert not set(victims) & set(got_ids)


def test_merge_remaps_tombstones(spark, tmp_path):
    from lucene_7_x_9_x_spark.operators.merge import merge_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(12)
    pdf = _random_corpus(rng, n_docs=200)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=4)
    s = Searcher(IndexSnapshot(spark, out))
    victims = s.search(TermQuery("h1"), 3, with_ids=True).toPandas()[
        "id"].tolist()
    delete_by_ids(spark, out, _ids(spark, victims))
    merged = merge_index(spark, IndexSnapshot(spark, out),
                         str(tmp_path / "m"), target_segments=2, salt=2)
    sm = Searcher(merged)
    res = sm.search(TermQuery("h1"), 200, with_ids=True).toPandas()
    assert not set(victims) & set(res["id"])


def test_compact_applies_deletes_physically(spark, tmp_path):
    from lucene_7_x_9_x_spark.operators.deletes import compact_index
    from lucene_7_x_9_x_spark.plans.query import PhraseQuery
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(14)
    pdf = _random_corpus(rng, n_docs=250)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=3)
    s0 = Searcher(IndexSnapshot(spark, out))
    victims = s0.search(TermQuery("h0"), 4, with_ids=True).toPandas()[
        "id"].tolist()
    delete_by_ids(spark, out, _ids(spark, victims))
    live = Searcher(IndexSnapshot(spark, out))  # tombstone view
    compacted = compact_index(spark, IndexSnapshot(spark, out),
                              str(tmp_path / "c"))
    sc = Searcher(compacted)
    # no tombstones remain; docids are dense per segment
    assert compacted.deletes() is None
    dm = compacted.docmap().select("segment", "docid").toPandas()
    for seg, g in dm.groupby("segment"):
        assert sorted(g.docid) == list(range(len(g)))
    # identical result SETS (by stable id) for several query shapes,
    # identical float32 scores for term queries
    for q in [TermQuery("h0"), TermQuery("h3"),
              BooleanQuery([(Occur.MUST, TermQuery("h0")),
                            (Occur.MUST_NOT, TermQuery("h1"))]),
              PhraseQuery(["h0", "h1"], slop=1)]:
        a = (live.matches(q).join(live.index.docmap()
             .select("segment", "docid", "id"), ["segment", "docid"])
             .select("id", "score").toPandas())
        b = (sc.matches(q).join(sc.index.docmap()
             .select("segment", "docid", "id"), ["segment", "docid"])
             .select("id", "score").toPandas())
        assert sorted(a.id) == sorted(b.id), q
    # stats now exclude deleted docs (docFreq drops post-merge)
    assert compacted.stats["doc_count"] == s0.index.stats["doc_count"] - 4
    # integrity: rebuilt postings still answer top-k correctly vs tombstone
    ta = live.search(TermQuery("h2"), 10, with_ids=True).toPandas()
    tb = sc.search(TermQuery("h2"), 10, with_ids=True).toPandas()
    assert ta["id"].tolist() == tb["id"].tolist()


def test_update_docs_replaces_content(spark, tmp_path):
    from lucene_7_x_9_x_spark.searcher import Searcher
    rng = np.random.RandomState(13)
    pdf = _random_corpus(rng, n_docs=100)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=2)
    s = Searcher(IndexSnapshot(spark, out))
    doc_id = str(s.search(TermQuery("h2"), 1, with_ids=True)
                 .toPandas()["id"].iloc[0])
    new = spark.createDataFrame(
        pd.DataFrame({"id": [doc_id],
                      "content": ["zebrazebra only content now"]}))
    update_docs(spark, out, new)
    s2 = Searcher(IndexSnapshot(spark, out))
    ids_h2 = set(s2.matches(TermQuery("h2")).join(
        s2.index.docmap().select("segment", "docid", "id"),
        ["segment", "docid"]).toPandas()["id"])
    assert doc_id not in ids_h2
    ids_z = set(s2.matches(TermQuery("zebrazebra")).join(
        s2.index.docmap().select("segment", "docid", "id"),
        ["segment", "docid"]).toPandas()["id"])
    assert ids_z == {doc_id}

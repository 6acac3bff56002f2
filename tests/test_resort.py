"""resort_index (Sorter/SortingCodecReader capability): docid
permutation of an existing index into index-sort order — postings,
positions, offsets and impacts all survive; merge + resort = the
sort-aware merge path."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.plans.query import PhraseQuery, TermQuery

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.operators.merge import resort_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    base = str(tmp_path_factory.mktemp("rs_base"))
    out = str(tmp_path_factory.mktemp("rs_sorted"))
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, base, id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      with_offsets=True)
    assert idx.manifest.get("index_sort") is None
    ridx = resort_index(spark, idx, out, "n_chars",
                        attrs=docs.select("doc_id", "n_chars"))
    return docs, Searcher(idx), Searcher(ridx)


def test_resorted_index_is_clean_and_sorted(spark, pair):
    from lucene_7_x_9_x_spark.index import check_index
    docs, s0, s1 = pair
    rep = check_index(spark, s1.index)
    assert rep["clean"], rep
    assert s1.index.manifest["index_sort"] == "n_chars"
    # docids ascend with n_chars within every segment
    dm = s1.index.docmap().select("segment", "docid", "n_chars").toPandas()
    for _, g in dm.groupby("segment"):
        g = g.sort_values("docid")
        assert (np.diff(g.n_chars.to_numpy()) >= 0).all()


def test_resort_preserves_search_results(pair):
    docs, s0, s1 = pair
    for q in [TermQuery("filter"), PhraseQuery(["the", "fast"])]:
        a = (s0.search(q, 1000).toPandas()
             .set_index("doc_id").score.sort_index())
        b = (s1.search(q, 1000).toPandas()
             .set_index("doc_id").score.sort_index())
        assert list(a.index) == list(b.index), q
        np.testing.assert_array_equal(a.to_numpy(np.float32),
                                      b.to_numpy(np.float32), str(q))


def test_resort_preserves_offsets(pair):
    docs, s0, s1 = pair
    dm0 = s0.index.docmap().select("segment", "docid", "doc_id")
    dm1 = s1.index.docmap().select("segment", "docid", "doc_id")
    a = {int(r.doc_id): (list(r.starts), list(r.ends))
         for r in s0.term_offsets("filter")
         .join(dm0, ["segment", "docid"]).collect()}
    b = {int(r.doc_id): (list(r.starts), list(r.ends))
         for r in s1.term_offsets("filter")
         .join(dm1, ["segment", "docid"]).collect()}
    assert a == b and a


def test_resort_enables_early_terminating_topk(pair):
    docs, s0, s1 = pair
    got = s1.sorted_topk(5).toPandas()
    want = (docs.select("doc_id", "n_chars").toPandas()
            .sort_values(["n_chars", "doc_id"]).head(5))
    assert list(got.n_chars) == list(want.n_chars)
    with pytest.raises(ValueError):
        s0.sorted_topk(5)
    # the early-termination predicate reaches the docmap scan
    plan = (s1.index.docmap().where(F.col("docid") < 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LessThan(docid,5)" in plan


def test_merge_then_resort_restores_index_sort(spark, pair,
                                               tmp_path_factory):
    from lucene_7_x_9_x_spark.operators.merge import (merge_index,
                                                      resort_index)
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs, s0, s1 = pair
    mdir = str(tmp_path_factory.mktemp("rs_merged"))
    rdir = str(tmp_path_factory.mktemp("rs_remerged"))
    merged = merge_index(spark, s1.index, mdir, target_segments=2)
    assert merged.manifest["index_sort"] is None  # merge clears it
    again = resort_index(spark, merged, rdir, "n_chars")
    s2 = Searcher(again)
    got = s2.sorted_topk(5).toPandas()
    assert list(got.n_chars) == list(s1.sorted_topk(5).toPandas().n_chars)
    q = TermQuery("filter")
    a = (s1.search(q, 1000).toPandas()
         .set_index("doc_id").score.sort_index())
    c = (s2.search(q, 1000).toPandas()
         .set_index("doc_id").score.sort_index())
    assert list(a.index) == list(c.index)
    np.testing.assert_array_equal(a.to_numpy(np.float32),
                                  c.to_numpy(np.float32))

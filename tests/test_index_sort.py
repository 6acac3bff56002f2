"""Index-time sort (IndexWriterConfig.setIndexSort analogue) and the
early-terminating sorted top-k (TopFieldCollector early termination)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index import build_index, IndexSnapshot
from lucene_7_x_9_x_spark.searcher import Searcher
from lucene_7_x_9_x_spark.plans.query import TermQuery

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_searcher(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("isort")
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, str(tmp / "i"), id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      sort_by="n_chars")
    return Searcher(idx), docs


def test_sorted_topk_matches_full_sort(sorted_searcher):
    s, docs = sorted_searcher
    got = [(r["rank"], r["doc_id"], r["n_chars"])
           for r in s.sorted_topk(10).collect()]
    want = [(i + 1, r["doc_id"], r["n_chars"])
            for i, r in enumerate(
                docs.orderBy("n_chars", "doc_id").limit(10).collect())]
    assert got == want


def test_sorted_topk_prunes_scan(sorted_searcher):
    s, _ = sorted_searcher
    plan = s.sorted_topk(10)._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(docid,10)" in plan.replace(" ", "")


def test_sorted_topk_descending_full_scan(sorted_searcher):
    s, docs = sorted_searcher
    got = [(r["doc_id"], r["n_chars"])
           for r in s.sorted_topk(5, ascending=False).collect()]
    want = [(r["doc_id"], r["n_chars"]) for r in
            docs.orderBy(F.desc("n_chars"), "doc_id").limit(5).collect()]
    assert got == want


def test_sorted_index_still_searches_and_ranks(sorted_searcher, spark):
    # docids are sort-order now, NOT doc_id-order: BM25 results must agree
    # with an unsorted index on the returned id SET and scores
    s, docs = sorted_searcher
    got = {(r["doc_id"], float(r["score"]))
           for r in s.search(TermQuery("filter"), 10).collect()}
    import tempfile
    plain = build_index(spark, docs, tempfile.mkdtemp() + "/p",
                        id_cols=["doc_id"], text_col="text",
                        segment_by="input")
    want = {(r["doc_id"], float(r["score"]))
            for r in Searcher(plain).search(TermQuery("filter"),
                                            10).collect()}
    assert {d for d, _ in got} == {d for d, _ in want}
    assert dict(got) == dict(want)


def test_sorted_topk_with_deletes_is_exact(sorted_searcher, spark,
                                           tmp_path):
    import shutil
    from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids
    s, docs = sorted_searcher
    work = str(tmp_path / "w")
    shutil.copytree(s.index.root, work)
    # delete several of the overall-smallest docs: the first k docids of
    # some segment are now partly dead — the full-scan fallback must
    # still return the true live top-k
    smallest = docs.orderBy("n_chars", "doc_id").limit(15) \
        .select("doc_id")
    delete_by_ids(spark, work, smallest)
    sd = Searcher(IndexSnapshot(spark, work))
    got = [(r["doc_id"], r["n_chars"]) for r in sd.sorted_topk(10).collect()]
    kept = docs.join(smallest, "doc_id", "left_anti")
    want = [(r["doc_id"], r["n_chars"]) for r in
            kept.orderBy("n_chars", "doc_id").limit(10).collect()]
    assert got == want


def test_streaming_append_rejected_on_sorted_index(sorted_searcher, spark):
    from lucene_7_x_9_x_spark.streaming.incremental import append_batch
    s, docs = sorted_searcher
    with pytest.raises(ValueError, match="sort_by"):
        append_batch(spark, docs.limit(1), s.index.root)


def test_merge_clears_index_sort(sorted_searcher, spark, tmp_path):
    # merging concatenates segments, destroying the per-segment sort —
    # the merged manifest must drop index_sort so sorted_topk cannot
    # early-terminate incorrectly
    from lucene_7_x_9_x_spark.operators.merge import merge_index
    s, _ = sorted_searcher
    merged = merge_index(spark, s.index, str(tmp_path / "m"),
                         target_segments=2)
    assert merged.manifest.get("index_sort") is None
    with pytest.raises(ValueError, match="sort_by"):
        Searcher(merged).sorted_topk(5)

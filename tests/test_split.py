"""Index splitting (PKIndexSplitter): the two halves partition the live
corpus, each half is a complete standalone index whose stats count only
its own docs (scores equal a fresh build from the filtered corpus), and
source tombstones appear in neither half."""

import os

import pytest

from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.split import split_index
from lucene_7_x_9_x_spark.plans.query import TermQuery
from lucene_7_x_9_x_spark.searcher import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))


@pytest.fixture(scope="module")
def halves(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("split_base"))
    idx = build_index(spark, docs, base, id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    om = str(tmp_path_factory.mktemp("split_m"))
    orr = str(tmp_path_factory.mktemp("split_r"))
    a, b = split_index(spark, idx, TermQuery("filter"), om, orr)
    return idx, a, b


def test_halves_partition_live_docs(spark, halves):
    idx, a, b = halves
    all_ids = {r.doc_id for r in idx.docmap().select("doc_id").collect()}
    ids_a = {r.doc_id for r in a.docmap().select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.docmap().select("doc_id").collect()}
    assert ids_a | ids_b == all_ids
    assert not (ids_a & ids_b)
    # the match half holds exactly the query's matches
    sm = Searcher(idx)
    match_ids = {r.doc_id for r in
                 sm.matches(TermQuery("filter"))
                 .join(idx.docmap().select("segment", "docid", "doc_id"),
                       ["segment", "docid"]).collect()}
    assert ids_a == match_ids
    assert Searcher(b).count(TermQuery("filter")) == 0


def test_half_equals_fresh_build(spark, docs, halves, tmp_path_factory):
    _, a, _ = halves
    ids_a = [r.doc_id for r in a.docmap().select("doc_id").collect()]
    fresh_dir = str(tmp_path_factory.mktemp("fresh"))
    sub = (docs.where(docs.doc_id.isin(ids_a))
           .repartitionByRange(2, "doc_id"))
    fresh = build_index(spark, sub, fresh_dir, id_cols=["doc_id"],
                        text_col="text", segment_by="input")
    q = TermQuery("join")
    got = (Searcher(a).search(q, 1000).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (Searcher(fresh).search(q, 1000).toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got.doc_id) == list(want.doc_id)
    # stats were re-finalized: float32 scores equal the fresh build's
    assert list(got.score) == list(want.score)


def test_tombstones_in_neither_half(spark, docs, tmp_path_factory):
    from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids
    base = str(tmp_path_factory.mktemp("split_del_base"))
    idx = build_index(spark, docs, base, id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    some = [r.doc_id for r in
            idx.docmap().select("doc_id").orderBy("doc_id")
            .limit(5).collect()]
    delete_by_ids(spark, base,
                  spark.createDataFrame([(i,) for i in some],
                                        "doc_id long"))
    idx = IndexSnapshot(spark, base)
    om = str(tmp_path_factory.mktemp("sd_m"))
    orr = str(tmp_path_factory.mktemp("sd_r"))
    a, b = split_index(spark, idx, TermQuery("filter"), om, orr)
    ids = {r.doc_id for r in a.docmap().select("doc_id").collect()} \
        | {r.doc_id for r in b.docmap().select("doc_id").collect()}
    assert not (ids & set(some))
    n_live = idx.docmap().count() - 5
    assert len(ids) == n_live

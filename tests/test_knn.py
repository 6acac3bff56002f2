"""Searcher-level KNN query (KnnFloatVectorQuery capability with docid
tie-break, LuceneDemo9.1.0 TestKNNQuery/TieBreakDocIdKNNQuery): exact
filtered path vs a numpy reference, tie ordering, and ANN routing."""

import os

import numpy as np
import pytest

from lucene_7_x_9_x_spark.plans.query import TermQuery

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher_and_vecs(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("knn_idx"))
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, out, id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    return Searcher(idx), emb


def _numpy_reference(emb_pdf, qv, match_ids, k):
    sub = emb_pdf[emb_pdf.vec_id.isin(match_ids)]
    qv = np.asarray(qv, dtype=np.float64)
    out = []
    for r in sub.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        out.append((float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))),
                    int(r.vec_id)))
    out.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in out[:k]]


def test_knn_filtered_matches_numpy_reference(spark, searcher_and_vecs):
    s, emb = searcher_and_vecs
    emb_pdf = emb.toPandas()
    qv = [float(x) for x in emb_pdf.iloc[0].embedding]
    # match set from the engine itself (the filter is an engine query)
    match_ids = {int(r.doc_id) for r in
                 s.matches(TermQuery("filter"))
                 .join(s.index.docmap().select("segment", "docid",
                                               "doc_id"),
                       ["segment", "docid"]).collect()}
    got = s.knn(qv, 10, filter=TermQuery("filter"), vectors=emb).toPandas()
    assert list(got.vec_id) == _numpy_reference(emb_pdf, qv, match_ids, 10)
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    # every returned id satisfies the filter (pre-filter, not post-filter)
    assert set(got.vec_id) <= match_ids


def test_knn_tie_breaks_by_id_asc(spark):
    from lucene_7_x_9_x_spark.pipeline.similarity import \
        cosine_topk_bruteforce
    # identical vectors -> identical cosine -> id asc order
    rows = [(9, [1.0, 0.0]), (3, [1.0, 0.0]), (7, [1.0, 0.0]),
            (1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_topk_bruteforce(df, [1.0, 0.0], "vec_id", "embedding", 3)
    assert [int(r.vec_id) for r in got.collect()] == [3, 7, 9]


def test_knn_requires_vectors(searcher_and_vecs):
    s, _ = searcher_and_vecs
    with pytest.raises(ValueError, match="vectors"):
        s.knn([1.0, 2.0], 5)


def test_knn_ann_routes(spark, searcher_and_vecs):
    from lucene_7_x_9_x_spark.pipeline.similarity import (build_lsh_index,
                                                          cosine_topk_lsh)
    s, emb = searcher_and_vecs
    qv = [float(x) for x in emb.first()["embedding"]]
    dim = len(qv)
    b = build_lsh_index(emb, dim, n_planes=6)
    got = s.knn(qv, 5, vectors=emb, bucketed=b, n_planes=6).toPandas()
    want = cosine_topk_lsh(emb, qv, dim, "vec_id", "embedding", 5,
                           n_planes=6, bucketed=b).toPandas()
    assert list(got.vec_id) == list(want.vec_id)
    b.unpersist()


def test_knn_many_matches_per_query(spark, searcher_and_vecs):
    s, emb = searcher_and_vecs
    pdf = emb.toPandas()
    qs = {f"q{i}": [float(x) for x in pdf.iloc[i].embedding]
          for i in range(4)}
    batch = s.knn_many(qs, 5, filter=TermQuery("filter"),
                       vectors=emb).toPandas()
    for qid, qv in qs.items():
        one = s.knn(qv, 5, filter=TermQuery("filter"),
                    vectors=emb).toPandas()
        sub = batch[batch.qid == qid].sort_values("rank")
        assert list(sub.vec_id) == list(one.vec_id), qid
    # unfiltered LSH routing parity with the batch API
    from lucene_7_x_9_x_spark.pipeline.similarity import (
        build_lsh_index, cosine_topk_lsh_many)
    b = build_lsh_index(emb, 64, n_planes=6)
    got = s.knn_many(qs, 5, bucketed=b, n_planes=6).toPandas()
    want = cosine_topk_lsh_many(b, qs, 64, k=5, n_planes=6).toPandas()
    key = ["qid", "rank"]
    assert got.sort_values(key).vec_id.tolist() == \
        want.sort_values(key).vec_id.tolist()
    b.unpersist()


def test_sparse_vector_field_skips_null_rows(spark, searcher_and_vecs):
    # TestSparseKNN semantics: docs lacking the vector field are not KNN
    # candidates and don't count in KnnVectorFieldExistsQuery
    from pyspark.sql import functions as F
    s, emb = searcher_and_vecs
    sparse = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 3 != 0, F.col("embedding")))
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 1).first()["embedding"]]
    got = s.knn(qv, 10, vectors=sparse).toPandas()
    assert len(got) == 10
    assert all(int(v) % 3 != 0 for v in got.vec_id)
    # exists-count equals the number of non-null rows
    n_total = emb.count()
    n = s.vector_exists_count(sparse).first()["n_vectors"]
    assert n == sparse.where(F.col("embedding").isNotNull()).count()
    assert n < n_total
    # IsNotNull reaches the planned scan/filter (vectorless majority is
    # pruned before scoring at scale)
    plan = s.knn(qv, 10, vectors=sparse)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "isnotnull" in plan.lower()

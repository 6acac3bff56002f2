"""Persisted LSH bucket index + batched multi-query search: results must
match the one-shot per-query path exactly (same buckets, same fold-order
cosines)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline.similarity import (build_lsh_index,
                                                      cosine_topk_lsh,
                                                      cosine_topk_lsh_many)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    return e.withColumn("embedding",
                        F.transform("embedding", lambda x: x.cast("double")))


def test_batch_matches_one_shot(emb):
    qvecs = {f"v{r['vec_id']}": [float(x) for x in r["embedding"]]
             for r in emb.where(F.col("vec_id") < 4).collect()}
    corpus = emb.where(F.col("vec_id") >= 4)
    idx = build_lsh_index(corpus, dim=64)
    try:
        batched = cosine_topk_lsh_many(idx, qvecs, dim=64, k=5).collect()
        by_qid: dict = {}
        for r in batched:
            by_qid.setdefault(r["qid"], []).append(
                (r["rank"], r["vec_id"], float(r["cosine"])))
        for qid, qv in qvecs.items():
            one = [(r["rank"], r["vec_id"], float(r["cosine"]))
                   for r in cosine_topk_lsh(corpus, qv, dim=64, k=5)
                   .collect()]
            assert sorted(by_qid.get(qid, [])) == sorted(one), qid
    finally:
        idx.unpersist()


def test_prebuilt_index_equals_rebucketing(emb):
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    idx = build_lsh_index(corpus, dim=64)
    try:
        hot = cosine_topk_lsh(None, qv, dim=64, k=10,
                              bucketed=idx).collect()
        cold = cosine_topk_lsh(corpus, qv, dim=64, k=10).collect()
        assert ([(r["rank"], r["vec_id"]) for r in hot]
                == [(r["rank"], r["vec_id"]) for r in cold])
    finally:
        idx.unpersist()


def test_lsh_disk_layout_prunes_partitions(emb, spark, tmp_path):
    from lucene_7_x_9_x_spark.pipeline.similarity import (hyperplane_bucket,
                                                          lsh_topk_from_disk,
                                                          lsh_write)
    import numpy as np
    path = str(tmp_path / "lsh")
    lsh_write(hyperplane_bucket(emb, dim=64), path)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]]
    got = lsh_topk_from_disk(spark, path, qv, dim=64, k=10).toPandas()
    want = cosine_topk_lsh(emb, qv, dim=64, k=10).toPandas()
    assert got.vec_id.tolist() == want.vec_id.tolist()
    assert np.allclose(got.cosine, want.cosine)
    # probed buckets must be PARTITION filters (planning-time pruning)
    plan = (lsh_topk_from_disk(spark, path, qv, dim=64, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters")[1][:120]


def test_auto_n_planes_scales_with_corpus():
    from lucene_7_x_9_x_spark.pipeline.similarity import auto_n_planes
    assert auto_n_planes(500) == 2
    assert auto_n_planes(128 * 1024) == 10
    assert auto_n_planes(128 * 2**20) == 20
    # monotone non-decreasing in corpus size
    last = 0
    for n in [10**3, 10**5, 10**7, 10**9, 10**12]:
        v = auto_n_planes(n)
        assert v >= last
        last = v

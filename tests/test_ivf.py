"""IVF ANN: deterministic k-means training, exact assignment parity with a
numpy replica, and recall guarantees (nprobe=all == brute force)."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .withColumn("embedding",
                        F.transform("embedding", lambda x: x.cast("double"))))


def test_ivf_assignment_matches_numpy(spark):
    from lucene_7_x_9_x_spark.pipeline.similarity import (ivf_assign,
                                                          ivf_train)
    emb = _emb(spark)
    cent = ivf_train(emb, dim=64, n_centroids=8, n_iters=4)
    got = {r.vec_id: r.list_id
           for r in ivf_assign(emb, cent).select("vec_id",
                                                 "list_id").collect()}
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([[float(v) for v in r.embedding] for r in rows])
    ids = [r.vec_id for r in rows]
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    # no near-ties at fold-vs-pairwise rounding scale
    srt = np.sort(d2, axis=1)
    assert (srt[:, 1] - srt[:, 0] > 1e-9).all()
    want = np.argmin(d2, axis=1)
    assert all(got[i] == int(w) for i, w in zip(ids, want))
    # training is deterministic
    cent2 = ivf_train(emb, dim=64, n_centroids=8, n_iters=4)
    assert np.array_equal(cent, cent2)


def test_ivf_full_probe_equals_bruteforce(spark):
    from lucene_7_x_9_x_spark.pipeline.similarity import (
        cosine_topk_bruteforce, ivf_assign, ivf_topk, ivf_train)
    emb = _emb(spark)
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0)
          .collect()[0]["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    cent = ivf_train(emb, dim=64, n_centroids=8, n_iters=4)
    assigned = ivf_assign(corpus, cent)
    exact = cosine_topk_bruteforce(corpus, qv, k=10).collect()
    full = ivf_topk(assigned, cent, qv, k=10, nprobe=8).collect()
    assert [(r.rank, r.vec_id) for r in full] == \
        [(r.rank, r.vec_id) for r in exact]
    # partial probe: results come only from probed lists, ranked correctly
    part = ivf_topk(assigned, cent, qv, k=10, nprobe=2).toPandas()
    probed = set(part.vec_id)
    lists = {r.vec_id: r.list_id for r in
             assigned.select("vec_id", "list_id").collect()}
    d2 = ((cent - np.asarray(qv)) ** 2).sum(1)
    allowed = set(int(j) for j in np.argsort(d2, kind="stable")[:2])
    assert all(lists[v] in allowed for v in probed)
    assert part["rank"].tolist() == list(range(1, len(part) + 1))


def test_ivf_disk_layout_prunes_partitions(spark, tmp_path):
    from lucene_7_x_9_x_spark.pipeline.similarity import (
        ivf_assign, ivf_topk, ivf_topk_from_disk, ivf_train, ivf_write)
    emb = _emb(spark)
    cent = ivf_train(emb, dim=64, n_centroids=8, n_iters=4)
    assigned = ivf_assign(emb, cent)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, path)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]]
    got = ivf_topk_from_disk(spark, path, cent, qv, k=10,
                             nprobe=3).toPandas()
    want = ivf_topk(assigned, cent, qv, k=10, nprobe=3).toPandas()
    assert got.vec_id.tolist() == want.vec_id.tolist()
    assert np.allclose(got.cosine, want.cosine)
    # partition pruning: the probed list_ids appear as PARTITION filters
    # (pruned at planning), not data filters
    plan = (ivf_topk_from_disk(spark, path, cent, qv, k=10, nprobe=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "list_id" in plan.split(
        "PartitionFilters")[1][:120]

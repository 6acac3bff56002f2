"""Product quantization (Jégou et al. 2011): Lloyd codebook training
determinism, encode == numpy argmin reference, ADC ranking == a Python
asymmetric-distance reference, and nontrivial recall of the exact
neighbors on real embeddings."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline.similarity import (
    _sub_sqdist, pq_adc_topk, pq_encode, pq_train)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
            .withColumn("embedding",
                        F.transform("embedding",
                                    lambda x: x.cast("double"))))


@pytest.fixture(scope="module")
def books(spark, emb):
    return pq_train(emb, dim=64, m=8, ksub=16, sample_size=256)


def test_train_shapes_and_determinism(spark, emb, books):
    assert books.shape == (8, 16, 8)
    again = pq_train(emb, dim=64, m=8, ksub=16, sample_size=256)
    assert np.array_equal(books, again)
    with pytest.raises(ValueError):
        pq_train(emb, dim=64, m=7)


def test_encode_matches_numpy(spark, emb, books):
    pdf = emb.toPandas()
    got = pq_encode(emb, books).toPandas().set_index("vec_id")
    x = np.array([list(v) for v in pdf.embedding], dtype=np.float64)
    for s in range(8):
        d = _sub_sqdist(x[:, s * 8:(s + 1) * 8], books[s])
        want = np.argmin(d, axis=1)
        for vid, w in zip(pdf.vec_id, want):
            assert got.loc[vid, "codes"][s] == w


def test_adc_matches_python_reference(spark, emb, books):
    pdf = emb.toPandas()
    qv = np.array(list(pdf.iloc[0].embedding), dtype=np.float64)
    codes = pq_encode(emb, books)
    got = pq_adc_topk(codes, books, [float(v) for v in qv], k=10) \
        .toPandas()
    # python ADC: same luts, same left-assoc sum
    luts = [_sub_sqdist(qv[None, s * 8:(s + 1) * 8], books[s])[0]
            for s in range(8)]
    cd = pq_encode(emb, books).toPandas()
    ref = []
    for r in cd.itertuples():
        d = luts[0][r.codes[0]]
        for s in range(1, 8):
            d = d + luts[s][r.codes[s]]
        ref.append((d, int(r.vec_id)))
    ref.sort()
    assert [v for _, v in ref[:10]] == list(got.vec_id)
    assert list(got["rank"]) == list(range(1, 11))
    for (d, _), g in zip(ref[:10], got.adist):
        assert g == d                      # bit-exact fold parity


def test_adc_recall_nontrivial(spark, emb, books):
    pdf = emb.toPandas()
    qv = np.array(list(pdf.iloc[0].embedding), dtype=np.float64)
    x = np.array([list(v) for v in pdf.embedding], dtype=np.float64)
    exact = [int(v) for v in
             pdf.vec_id.values[np.argsort(((x - qv) ** 2).sum(1))][:10]]
    codes = pq_encode(emb, books)
    got = set(pq_adc_topk(codes, books, [float(v) for v in qv], k=10)
              .toPandas().vec_id)
    # quantized distance keeps a meaningful share of the exact top-10
    assert len(got & set(exact)) >= 3


def test_ivfpq_degenerates_to_exact(spark, emb, books):
    from lucene_7_x_9_x_spark.pipeline.similarity import (
        cosine_topk_bruteforce, ivf_assign, ivf_train, ivfpq_topk)
    pdf = emb.toPandas()
    qv = [float(v) for v in pdf.iloc[0].embedding]
    cents = ivf_train(emb, dim=64, n_centroids=4, sample_size=128)
    coded = pq_encode(ivf_assign(emb, cents), books,
                      extra_cols=("list_id",))
    # probe every cell and re-rank everything -> exact brute force
    got = ivfpq_topk(coded, cents, books, qv, k=10, nprobe=4,
                     rerank=emb.count(), vectors=emb).toPandas()
    want = cosine_topk_bruteforce(emb, qv, k=10).toPandas()
    assert list(got.vec_id) == list(want.vec_id)
    assert list(got.score) == list(want.cosine)


def test_ivfpq_rerank0_matches_adc_on_probed(spark, emb, books):
    import numpy as np
    from lucene_7_x_9_x_spark.pipeline.similarity import (
        ivf_assign, ivf_train, ivfpq_topk)
    pdf = emb.toPandas()
    qv = [float(v) for v in pdf.iloc[0].embedding]
    cents = ivf_train(emb, dim=64, n_centroids=4, sample_size=128)
    assigned = ivf_assign(emb, cents)
    coded = pq_encode(assigned, books, extra_cols=("list_id",))
    got = ivfpq_topk(coded, cents, books, qv, k=10, nprobe=2,
                     rerank=0).toPandas()
    # reference: ADC over rows whose list is probed
    d2 = ((cents - np.asarray(qv)) ** 2).sum(1)
    probes = set(int(j) for j in np.argsort(d2, kind="stable")[:2])
    probed_ids = {r.vec_id for r in assigned.collect()
                  if r.list_id in probes}
    ref = pq_adc_topk(coded.where(coded.vec_id.isin(list(probed_ids))),
                      books, qv, k=10).toPandas()
    assert list(got.vec_id) == list(ref.vec_id)
    assert list(got.score) == list(ref.adist)
    with pytest.raises(ValueError):
        ivfpq_topk(coded, cents, books, qv, rerank=5)  # needs vectors

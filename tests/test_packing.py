"""Concat-and-chop sequence packing: per-bucket streams are contiguous
and gap-free, window indices match a Python reference, empty docs drop,
and the layout is stable under input repartitioning (the md5 bucket and
intra-bucket order are pure functions of the doc id)."""

import pytest

from lucene_7_x_9_x_spark.pipeline.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "tok " * (i % 7) ) for i in range(50)]  # some empty
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streams_contiguous_and_windows_correct(spark, docs):
    ctx = 5
    out = pack_sequences(docs, "doc_id", ctx, n_buckets=4,
                         text_col="text").toPandas()
    # empty docs (i % 7 == 0) are dropped
    assert set(out.doc_id) == {i for i in range(50) if i % 7 != 0}
    for b, grp in out.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        off = 0
        for r in grp.itertuples():
            assert r.start_off == off          # gap-free concatenation
            assert r.first_seq == off // ctx
            assert r.last_seq == (off + r.n_tokens - 1) // ctx
            assert r.n_seqs == r.last_seq - r.first_seq + 1
            off += r.n_tokens


def test_repartition_stable(spark, docs):
    a = pack_sequences(docs, "doc_id", 8, n_buckets=4,
                       text_col="text").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(docs.repartition(7), "doc_id", 8, n_buckets=4,
                       text_col="text").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_count_col_form_matches_text_form(spark, docs):
    from pyspark.sql import functions as F
    from lucene_7_x_9_x_spark.pipeline.dedup import tokens_col
    counted = docs.withColumn("ntok", F.size(tokens_col("text")))
    a = pack_sequences(docs, "doc_id", 16, n_buckets=2,
                       text_col="text").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(counted, "doc_id", 16, n_buckets=2,
                       count_col="ntok").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", 8)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", 8, text_col="text",
                       count_col="x")

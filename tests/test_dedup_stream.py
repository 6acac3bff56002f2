"""Streaming exact dedup: the availableNow stream's surviving set equals
the batch first-wins oracle, duplicates across micro-batch files are
dropped, and resuming from the checkpoint never re-emits a seen hash."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.streaming.dedup_stream import (dedup_batch,
                                                         run_dedup_stream)

SCHEMA = "doc_id long, text string, ts timestamp"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"))


def _rows(i0, texts, day=1):
    import datetime
    return [(i0 + j, t,
             datetime.datetime(2024, 1, day, 10, 0, j))
            for j, t in enumerate(texts)]


def test_stream_equals_batch_first_wins(spark, dirs):
    src, out, ckpt = dirs
    batch1 = _rows(0, ["aa", "bb", "aa", "cc"])
    _write(spark, src, batch1)
    run_dedup_stream(spark, src, out, ckpt, schema=SCHEMA)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    want = {r.doc_id for r in
            dedup_batch(spark.createDataFrame(batch1, SCHEMA),
                        "doc_id", "text").collect()}
    assert got == want == {0, 1, 3}


def test_resume_drops_cross_batch_duplicates(spark, dirs):
    src, out, ckpt = dirs
    _write(spark, src, _rows(0, ["aa", "bb"]))
    run_dedup_stream(spark, src, out, ckpt, schema=SCHEMA)
    # second wave: one duplicate of a PREVIOUS batch, one fresh
    _write(spark, src, _rows(10, ["aa", "dd"]))
    run_dedup_stream(spark, src, out, ckpt, schema=SCHEMA)
    got = spark.read.parquet(out)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {0, 1, 11}          # 10 ("aa") was dropped as seen
    # the sink is append-only: no id emitted twice
    assert got.count() == got.select("doc_id").distinct().count()


def test_batch_oracle_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        _rows(0, ["x", "x", "y", "x", "y"]), SCHEMA)
    kept = dedup_batch(df, "doc_id", "text").select("doc_id").collect()
    assert {r.doc_id for r in kept} == {0, 2}

"""Multimodal plumbing: Arrow batch shapes, schema contracts, and
deterministic fake codecs for extract / resize / frame-sample."""

import numpy as np
from pyspark.sql import functions as F


def _media(spark, n=40):
    return spark.range(n).select(
        F.col("id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")),
                 "utf-8").alias("payload"),
        F.lit(16).alias("width"), F.lit(9).alias("height"),
        F.lit(0).alias("sample_rate"))


def test_extract_features_schema_and_determinism(spark):
    from lucene_7_x_9_x_spark.pipeline.multimodal import extract_features
    m = _media(spark)
    a = extract_features(m).orderBy("id").toPandas()
    b = extract_features(m).orderBy("id").toPandas()
    assert list(a.columns) == ["id", "media_type", "n_bytes", "feat",
                               "sha256"]
    assert all(len(f) == 8 for f in a.feat)
    assert (a.sha256 == b.sha256).all()
    assert [list(x) for x in a.feat] == [list(x) for x in b.feat]


def test_resize_images_rewrites_payload_and_metadata(spark):
    from lucene_7_x_9_x_spark.pipeline.multimodal import (fake_resize,
                                                          resize_images)
    m = _media(spark)
    out = resize_images(m, 8, 4).orderBy("id").toPandas()
    assert (out.width == 8).all() and (out.height == 4).all()
    assert all(len(p) == 32 for p in out.payload)
    # deterministic: matches the local fake on the same bytes
    src = m.orderBy("id").toPandas()
    want = [fake_resize(bytes(p), 8, 4) for p in src.payload]
    assert [bytes(p) for p in out.payload] == want


def test_frame_sample_plan_counts(spark):
    from lucene_7_x_9_x_spark.pipeline.multimodal import frame_sample_plan
    big = spark.range(3).select(
        F.col("id"),
        F.lit("video/fake").alias("media_type"),
        F.encode(F.repeat(F.lit("x"), 5 * 1024), "utf-8").alias("payload"))
    plan = frame_sample_plan(big, every_n=2).toPandas()
    # 5 fake frames per doc, sampled every 2 -> idx 0,2,4
    assert sorted(plan[plan.id == 0].frame_idx) == [0, 2, 4]
    assert len(plan) == 9

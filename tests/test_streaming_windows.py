"""Streaming windowed aggregation == batch aggregation on the same events
(the SURVEY.md §2.9 Structured Streaming surface, driven availableNow)."""

import os

from pyspark.sql import functions as F


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from lucene_7_x_9_x_spark.streaming.windows import (run_windowed_counts,
                                                        windowed_aggregate)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    events.write.parquet(src)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = run_windowed_counts(spark, src, schema, str(tmp_path / "ck"),
                              query_name="win_test").toPandas()
    want = windowed_aggregate(
        spark.read.parquet(src)).toPandas()
    key = ["win_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got.cnt.tolist() == want.cnt.tolist()
    assert got.win_start.tolist() == want.win_start.tolist()
    # sums agree to float64 printing precision
    assert [round(x, 6) for x in got.sum_value] == \
        [round(x, 6) for x in want.sum_value]


def test_streaming_sink_is_on_disk_and_upserts(spark, tmp_path):
    # the sink lives on disk partitioned by window start (no driver-side
    # state); a second availableNow pass over MORE data upserts the
    # touched windows in place
    from lucene_7_x_9_x_spark.streaming.windows import (run_windowed_counts,
                                                        windowed_aggregate)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half = events.where(F.col("event_id") % 2 == 0)
    src = str(tmp_path / "events2")
    half.write.parquet(src)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sink = str(tmp_path / "sink")
    got1 = run_windowed_counts(spark, src, schema, str(tmp_path / "ck2"),
                               sink_dir=sink).toPandas()
    import os
    assert any(d.startswith("win_start=") for d in os.listdir(sink))
    want1 = windowed_aggregate(spark.read.parquet(src)).toPandas()
    assert len(got1) == len(want1) > 0
    # second pass: the other half arrives; upsert must replace counts
    events.where(F.col("event_id") % 2 == 1).write.mode("append") \
        .parquet(src)
    got2 = run_windowed_counts(spark, src, schema, str(tmp_path / "ck3"),
                               sink_dir=sink).toPandas()
    want2 = windowed_aggregate(spark.read.parquet(src)).toPandas()
    key = ["win_start", "event_type"]
    got2 = got2.sort_values(key).reset_index(drop=True)
    want2 = want2.sort_values(key).reset_index(drop=True)
    assert got2.cnt.tolist() == want2.cnt.tolist()

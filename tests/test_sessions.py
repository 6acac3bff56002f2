"""Stateful streaming sessionization (applyInPandasWithState) emits exactly
the CLOSED sessions of the batch reference — every batch session except
each user's final (still-open) one."""

import pandas as pd


def test_stream_sessions_match_batch_closed(spark, tmp_path):
    from lucene_7_x_9_x_spark.streaming.sessions import (sessionize_batch,
                                                         sessionize_stream)
    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .orderBy("ts"))
    src = str(tmp_path / "ev")
    events.coalesce(1).write.parquet(src)  # one file, event-time order

    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = sessionize_stream(spark, src, schema, str(tmp_path / "ck"),
                            gap_minutes=30,
                            query_name="sess_test").toPandas()
    batch = sessionize_batch(spark.read.parquet(src)).toPandas()
    # closed = all batch sessions except each user's last
    last = (batch.sort_values("session_start")
            .groupby("user_id").tail(1))
    closed = (pd.concat([batch, last]).drop_duplicates(keep=False)
              .sort_values(["user_id", "session_start"])
              .reset_index(drop=True))
    got = (got.sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        closed[["user_id", "session_start", "session_end", "n_events"]])

"""Gap-based event sessionization — the custom stateful streaming operator
surface (SURVEY §2.9): batch form as pure window expressions, streaming form
via ``applyInPandasWithState`` with per-user open-session state.

A session is a maximal run of one user's events where consecutive gaps are
<= gap_minutes. The batch form is the oracle-checkable reference; the
streaming form emits a session when a later event closes it (gap exceeded),
holding at most ONE open session per user in state — constant state per
key, evicted only by closure (production would add a state TTL/watermark;
the availableNow test drives files in event-time order, which is the
ordering contract of gap sessionization without a watermark).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def sessionize_batch(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_start, session_end, n_events) per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = gap_minutes * 60

    def epoch(c):  # TIMESTAMP_NTZ needs the two-step cast to seconds
        return F.col(c).cast("timestamp").cast("long")

    d = (events
         .withColumn("_prev", F.lag(ts_col).over(w))
         .withColumn("_new", (F.col("_prev").isNull()
                              | (epoch(ts_col) - epoch("_prev") > gap))
                     .cast("int"))
         .withColumn("_sid", F.sum("_new").over(w)))
    return (d.groupBy(user_col, "_sid")
            .agg(F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
                 F.date_format(F.max(ts_col), TS_FMT).alias("session_end"),
                 F.count("*").cast("long").alias("n_events"))
            .drop("_sid"))


def _make_update_fn(gap_seconds: int):
    def update(key, pdfs, state):
        import numpy as np
        ts = []
        for pdf in pdfs:
            ts.append(pdf["ts"].astype("datetime64[s]").astype("int64")
                      .to_numpy())
        t = np.sort(np.concatenate(ts)) if ts else np.zeros(0, "int64")
        if state.exists:
            start, end, n = state.get
        else:
            start = end = n = None
        closed = []
        for x in t.tolist():
            if n is None:
                start, end, n = x, x, 1
            elif x - end > gap_seconds:
                closed.append((start, end, n))
                start, end, n = x, x, 1
            else:
                end, n = x, n + 1
        state.update((start, end, n))
        if closed:
            import datetime as dt

            def fmt(sec):
                return dt.datetime.fromtimestamp(
                    sec, dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
            yield pd.DataFrame({
                "user_id": [int(key[0])] * len(closed),
                "session_start": [fmt(a) for a, _, _ in closed],
                "session_end": [fmt(b) for _, b, _ in closed],
                "n_events": [c for _, _, c in closed]})
    return update


def sessionize_stream(spark: SparkSession, events_glob: str, schema: str,
                      checkpoint_dir: str, gap_minutes: int = 30,
                      query_name: str = "sessions") -> DataFrame:
    """availableNow pass emitting CLOSED sessions (each user's final open
    session stays in state — it is not knowable to be over)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    stream = spark.readStream.schema(schema).parquet(events_glob)
    out = (stream.select("user_id", "ts").groupBy("user_id")
           .applyInPandasWithState(
               _make_update_fn(gap_minutes * 60),
               outputStructType=("user_id long, session_start string, "
                                 "session_end string, n_events long"),
               stateStructType="start long, end long, n long",
               outputMode="append",
               timeoutConf=GroupStateTimeout.NoTimeout))
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)

"""Streaming windowed aggregation over event streams — the Structured
Streaming surface of SURVEY.md §2.9 (the reference is batch-only; this is
the Spark-native capability the brief's `events` table exists for).

``windowed_event_counts`` runs tumbling-window counts/sums with a watermark
for late data; with ``availableNow`` it drains whatever files exist and
stops (the same incremental-batch discipline as streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_aggregate(events: DataFrame, *, window: str = "1 hour",
                       watermark: str = "10 minutes",
                       ts_col: str = "ts", key_col: str = "event_type",
                       value_col: str = "value") -> DataFrame:
    """Watermarked tumbling-window aggregation, usable on both a static
    DataFrame and a streaming one (withWatermark is a no-op on static
    inputs, so batch parity is by construction)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), key_col)
            .agg(F.count("*").alias("cnt"),
                 F.sum(value_col).alias("sum_value"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"),
                    key_col, "cnt", "sum_value"))


def run_windowed_counts(spark: SparkSession, events_glob: str,
                        schema: str, checkpoint_dir: str,
                        query_name: str = "windowed_events",
                        window: str = "1 hour",
                        watermark: str = "10 minutes",
                        sink_dir: str | None = None) -> DataFrame:
    """availableNow streaming pass: aggregate all currently-available event
    files into tumbling windows. Runs in ``update`` output mode so the
    watermark actually finalizes and evicts window state (in ``complete``
    mode the watermark is inert and state grows without bound).

    Each micro-batch's updated windows are MERGE-upserted into a parquet
    sink partitioned by window start: the batch's touched windows are
    partition-pruned out of the sink, merged keyed by (window, key), and
    written back with DYNAMIC partition overwrite — so per-batch work and
    rewrite volume are bounded by the batch's ACTIVE windows, never by
    sink history, and no state accumulates on the driver (a long-running
    high-cardinality stream previously grew a driver dict without bound).
    With a Delta/Iceberg catalog the same upsert is a single MERGE
    statement; this is the plain-parquet equivalent with identical
    bounded-work behavior. sink_dir defaults beside the checkpoint.
    Returns the sink contents as a DataFrame."""
    stream = spark.readStream.schema(schema).parquet(events_glob)
    agg = windowed_aggregate(stream, window=window, watermark=watermark)
    cols = agg.columns  # original order (partitioning reorders on disk)
    key_col = cols[2]
    sink = sink_dir or (checkpoint_dir.rstrip("/") + "_sink")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df
        import os
        if os.path.exists(sink):
            # MERGE: prune the sink scan to the batch's touched windows
            # (partition filters), drop superseded (window, key) rows,
            # union the new rows; dynamic overwrite rewrites ONLY those
            # window partitions
            touched = [r[0] for r in
                       b.select("win_start").distinct().collect()]
            if not touched:
                return
            existing = (spark.read.parquet(sink)
                        .where(F.col("win_start").isin(touched)))
            keep = existing.join(b.select("win_start", key_col),
                                 ["win_start", key_col], "left_anti")
            b = keep.select(*cols).unionByName(b.select(*cols))
        (b.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("win_start").parquet(sink))

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(upsert)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink).select(*cols)

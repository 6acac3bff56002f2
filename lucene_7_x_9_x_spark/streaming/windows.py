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
                        watermark: str = "10 minutes") -> DataFrame:
    """availableNow streaming pass: aggregate all currently-available event
    files into tumbling windows. Runs in ``update`` output mode so the
    watermark actually finalizes and evicts window state (in ``complete``
    mode the watermark is inert and state grows without bound); each
    micro-batch's updated windows are upserted keyed by (window, key) — the
    same discipline as a MERGE into a Delta/parquet sink in production.
    Returns the upserted windows as a DataFrame."""
    stream = spark.readStream.schema(schema).parquet(events_glob)
    agg = windowed_aggregate(stream, window=window, watermark=watermark)
    store: dict = {}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # windows are already aggregated, so a batch carries at most one row
        # per updated (window, key) — bounded by active windows, not events
        for r in batch_df.collect():
            store[(r.win_start, r[2])] = r

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(upsert)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = list(store.values())
    return spark.createDataFrame(rows, schema=agg.schema)

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
    files into tumbling windows; results land in an in-memory sink table
    named ``query_name`` (swap for a Kafka/parquet sink in production).
    Returns the sink contents as a DataFrame."""
    stream = spark.readStream.schema(schema).parquet(events_glob)
    agg = windowed_aggregate(stream, window=window, watermark=watermark)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(query_name)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)

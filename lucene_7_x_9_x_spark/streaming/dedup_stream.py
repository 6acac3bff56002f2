"""Streaming exact deduplication — the streaming half of the dedup
family (SURVEY §2.9 + pipeline/dedup.exact_dup_groups): drop documents
whose content hash was already seen, continuously, with bounded state.

Batch form (`dedup_batch`) is the oracle-checkable reference: keep the
FIRST document (lowest id) per sha256. The streaming form
(`run_dedup_stream`) is `withWatermark + dropDuplicates([hash])` — the
production discipline: Spark keeps one state row per hash inside the
watermark horizon and drops late duplicates; state is evicted once the
watermark passes (bounded by the horizon's distinct-hash count, NOT the
stream length — at 100 TB/day the horizon is the knob that caps state).
First-wins under event-time order matches the batch lowest-id rule when
ids are assigned in arrival order (the test drives files in id order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def content_hash(text_col: str):
    return F.sha2(F.col(text_col), 256)


def dedup_batch(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id doc per exact content hash (the batch oracle
    of the streaming first-wins rule). One hash shuffle on the 64-hex
    key — the exact_dup_groups scale shape."""
    h = df.withColumn("_h", content_hash(text_col))
    w = (h.groupBy("_h")
         .agg(F.min(id_col).alias(id_col)))
    return (df.join(w, id_col, "left_semi"))


def run_dedup_stream(spark: SparkSession, src_dir: str, out_dir: str,
                     checkpoint: str, id_col: str = "doc_id",
                     text_col: str = "text", ts_col: str = "ts",
                     horizon: str = "1 hour",
                     schema: str | None = None) -> None:
    """availableNow file stream -> watermarked dropDuplicates on the
    content hash -> append parquet sink. Exactly-once via checkpoint;
    re-running with new files continues, never re-emitting a hash seen
    inside the watermark horizon."""
    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    stream = (reader.parquet(src_dir)
              .withColumn("_h", content_hash(text_col))
              .withWatermark(ts_col, horizon)
              .dropDuplicates(["_h"])
              .drop("_h"))
    (stream.writeStream.format("parquet")
     .option("path", out_dir)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())

"""Corpus ingestion — the Directory / input-boundary of the reference
re-expressed as Spark source formats (SURVEY §3.1 input stage).

The index builder takes any DataFrame with id columns + a text column;
this module normalizes the common corpus carriers into that shape:

  parquet  — columnar, the preferred 100 TB path (column pruning, row-group
             stats, splittable)
  jsonl    — one JSON doc per line (splittable; schema inference optional —
             pass an explicit DDL schema at scale to skip the inference
             scan)
  csv      — header row or explicit schema
  text     — one document per line; a deterministic id is derived from
             (file, line offset) so re-reads are stable

All formats come back as plain DataFrames, so predicate pushdown and the
zero-shuffle segment_by="input" build path apply uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet", *,
                text_col: str = "text", id_cols: list[str] | None = None,
                schema: str | None = None,
                options: dict | None = None) -> DataFrame:
    """Load a corpus into the builder's shape; validates that the id and
    text columns are present."""
    reader = spark.read
    if options:
        reader = reader.options(**options)
    if schema:
        reader = reader.schema(schema)
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt in ("json", "jsonl"):
        df = reader.json(path)
    elif fmt == "csv":
        df = reader.option("header", "true").csv(path)
    elif fmt == "text":
        # doc identity = (scan partition, ordinal within partition) plus
        # the source file name — deterministic for identical input files +
        # scan config, the same contract as the zero-shuffle
        # segment_by="input" build path
        raw = reader.text(path).select(
            F.col("_metadata.file_name").alias("__file__"), "value")

        def _number(batches):
            from pyspark import TaskContext
            pid = TaskContext.get().partitionId()
            i = 0
            for pdf in batches:
                uri = [f"{f}:{pid}:{j}" for j, f in
                       enumerate(pdf["__file__"], start=i)]
                i += len(pdf)
                out = pdf.rename(columns={"value": text_col})
                out["doc_uri"] = uri
                yield out[["doc_uri", text_col]]

        df = raw.mapInPandas(_number,
                             schema=f"doc_uri string, {text_col} string")
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    need = list(id_cols or []) + [text_col]
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise ValueError(f"corpus at {path} is missing columns {missing}; "
                         f"has {df.columns}")
    return df

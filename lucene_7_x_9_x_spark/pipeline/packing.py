"""Sequence packing for pre-training pipelines: concatenate documents in
a deterministic order and chop the token stream into fixed-length
context windows (the GPT-style "concat and chop" packing; each document
records which windows it lands in and at what offset).

Scale shape: a GLOBAL concatenation order needs a global running sum —
a single-partition window, the classic scale-killer. Instead documents
are bucketed by an md5-derived hash of their id (same cross-engine
determinism as pipeline/sampling.py) and each bucket packs its own
independent token stream: ONE hash shuffle on the bucket key, running
sums windowed per bucket, every bucket a parallel task. At 100 TB the
number of buckets scales with the cluster, not the corpus; the output
is reproducible regardless of input partitioning because both the
bucket AND the intra-bucket order are pure functions of the doc id.

The packed layout per document (all exact integers, float-free):
  bucket      which independent stream the doc joined
  start_off   token offset of the doc's first token in the stream
  first_seq   start_off // ctx_len — the first context window touched
  last_seq    (start_off + n_tokens - 1) // ctx_len (== first_seq - 1
              sentinel never occurs: empty docs are dropped)
  n_seqs      windows spanned
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import md5_hash31, tokens_col


def pack_sequences(df: DataFrame, id_col: str, ctx_len: int,
                   n_buckets: int = 64, text_col: str | None = None,
                   count_col: str | None = None,
                   seed: int = 42) -> DataFrame:
    """Assign each document its place in a packed fixed-length-window
    token stream. Provide either ``text_col`` (tokens counted with the
    standard analyzer) or ``count_col`` (a precomputed token count).
    Empty documents are dropped (they occupy no window)."""
    if (text_col is None) == (count_col is None):
        raise ValueError("provide exactly one of text_col / count_col")
    ntok = (F.size(tokens_col(text_col)) if text_col is not None
            else F.col(count_col)).cast("long")
    base = (df.select(F.col(id_col), ntok.alias("n_tokens"))
            .where(F.col("n_tokens") > 0)
            .withColumn(
                "bucket",
                md5_hash31(F.concat(F.lit(f"{seed}:"),
                                    F.col(id_col).cast("string")))
                % F.lit(n_buckets)))
    w = (Window.partitionBy("bucket").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    out = base.withColumn("start_off", (cum - F.col("n_tokens"))
                          .cast("long"))
    # integer division (Spark `div`), never float: offsets at 100 TB
    # scale exceed double's exact-integer range
    first = F.expr(f"start_off div {int(ctx_len)}")
    last = F.expr(f"(start_off + n_tokens - 1) div {int(ctx_len)}")
    return out.select(
        id_col, "bucket", "n_tokens", "start_off",
        first.alias("first_seq"), last.alias("last_seq"),
        (last - first + 1).cast("long").alias("n_seqs"))

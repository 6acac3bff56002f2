"""Benchmark decontamination and duplicate-span flagging for
training-data pipelines.

Standard LLM-corpus hygiene (the n-gram overlap rules popularized by the
GPT-3 / PaLM training reports, and C4's duplicate-span removal): before
training, (a) drop or flag training documents that share long n-grams
with an evaluation/benchmark set, and (b) flag spans that are duplicated
verbatim across many documents (boilerplate).

Spark-first design, sized for 100 TB:

- Tokenization / shingling reuses the dedup module's JVM-side expressions
  (no Python UDFs anywhere in these paths).
- `contaminated_docs`: the benchmark side is SMALL by definition (eval
  sets are thousands of docs); its distinct n-gram set is broadcast, so
  the 100 TB training side is scan-filtered in place by a
  BroadcastHashJoin — the corpus is never shuffled. Set
  `broadcast_bench=False` for a pathological huge bench set to fall back
  to a shuffle hash join on the n-gram key (uniformly distributed).
- `duplicate_spans`: one hash shuffle keyed on the n-gram string to
  count per-span document frequency (partial aggregation applies), then
  a join back on the same key. Spans duplicated across many docs are
  exactly the hot keys, so the join is left to AQE's skew-join split;
  the count side is pre-aggregated to one row per span so the skew is
  bounded by the fan-out of the probe side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import doc_windows


def _positional_shingles(df: DataFrame, id_col: str, text_col: str,
                         n: int) -> DataFrame:
    """(id, pos, span): every n-token window, positional (NOT distinct —
    a doc repeating a span internally counts each window once). A narrow
    posexplode of dedup.doc_windows — the codegen'd lookahead-regex
    window pass (windows come back in token order, so the posexplode
    index IS the window position; bit-identical to the r5 per-index
    transform, 10x less CPU)."""
    return doc_windows(df, id_col, text_col, n).select(
        F.col(id_col), F.posexplode("ws").alias("pos", "span"))


def contaminated_docs(train: DataFrame, bench: DataFrame,
                      id_col: str, text_col: str,
                      bench_id_col: str, bench_text_col: str,
                      n: int = 5,
                      broadcast_bench: bool = True) -> DataFrame:
    """Flag training docs sharing any n-gram with the benchmark set.

    Returns one row per CONTAMINATED training doc:
      (id_col, n_overlap_ngrams, n_bench_docs)
    where n_overlap_ngrams counts DISTINCT shared n-grams and
    n_bench_docs counts distinct benchmark documents hit.

    Reference role: the eval-overlap decontamination filter of the GPT-3
    appendix C / PaLM sec. 6 methodology (n-gram collision against the
    eval set), expressed as a broadcast semi-structure so the training
    corpus is never shuffled.
    """
    # the TRAIN side is NOT pre-distinct'd: that was a full shuffle of
    # every training n-gram string, yet the final countDistinct dedups
    # (id, span) and (id, bench_id) anyway — the broadcast join filters
    # the raw window stream map-side and only the surviving hits (an
    # output-scale frame) are ever shuffled (guide §2.3)
    t = _positional_shingles(train, id_col, text_col, n) \
        .select(id_col, "span")
    b = (_positional_shingles(bench, bench_id_col, bench_text_col, n)
         .select(F.col(bench_id_col).alias("_bench_id"), "span")
         .distinct())
    if broadcast_bench:
        b = F.broadcast(b)
    hits = t.join(b, "span")
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("span").alias("n_overlap_ngrams"),
                 F.countDistinct("_bench_id").alias("n_bench_docs")))


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    n: int = 8, min_docs: int = 2) -> DataFrame:
    """Per-doc counts of n-gram windows whose span text occurs in at
    least `min_docs` DISTINCT documents (C4-style boilerplate spans).

    Returns one row per doc that has at least one window:
      (id_col, n_windows, n_dup_windows)

    Counting windows positionally (not distinct spans) makes
    n_dup_windows / n_windows the fraction of the doc covered by
    cross-doc boilerplate, which is the quantity the C4 rule thresholds
    on.
    """
    pos = _positional_shingles(df, id_col, text_col, n)
    span_df = (pos.groupBy("span")
               .agg(F.countDistinct(id_col).alias("_span_docs")))
    dup_spans = span_df.where(F.col("_span_docs") >= min_docs) \
                       .select("span")
    flagged = pos.join(dup_spans.withColumn("_dup", F.lit(1)),
                       "span", "left")
    return (flagged.groupBy(id_col)
            .agg(F.count("*").alias("n_windows"),
                 F.count("_dup").alias("n_dup_windows")))


def duplicate_span_ranges(df: DataFrame, id_col: str, text_col: str,
                          n: int = 8, min_docs: int = 2) -> DataFrame:
    """The REMOVAL form of duplicate_spans — per-doc merged token ranges
    covered by cross-doc duplicated windows, the operation that actually
    cuts boilerplate out of a training corpus (the deduplicate-spans step
    of Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better", approximated at n-token window granularity — the
    standard practical substitute for the paper's suffix-array pass, and
    exactly C4's span-removal unit).

    Returns (id_col, span_start, span_end): half-open TOKEN ranges
    [span_start, span_end) such that every n-token window inside a range
    occurs in >= min_docs distinct documents, merged transitively
    (overlapping/adjacent flagged windows coalesce — the gaps-and-islands
    merge).  Ranges are disjoint and maximal per doc.

    Scale shape: the span-df aggregation and join-back are
    duplicate_spans' (one hash shuffle + AQE skew join); the merge is a
    per-DOC window (partitionBy id — parallel across docs, never a
    global window) followed by one hash aggregate."""
    from pyspark.sql import Window
    pos = _positional_shingles(df, id_col, text_col, n)
    span_df = (pos.groupBy("span")
               .agg(F.countDistinct(id_col).alias("_span_docs")))
    dup = (pos.join(span_df.where(F.col("_span_docs") >= min_docs)
                    .select("span"), "span")
           .select(id_col, "pos",
                   (F.col("pos") + F.lit(n)).alias("end")))
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    isl = (dup.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col("pos") > prev_max), 1).otherwise(0))
        .withColumn("_island", F.sum("_new").over(w)))
    return (isl.groupBy(id_col, "_island")
            .agg(F.min("pos").alias("span_start"),
                 F.max("end").alias("span_end"))
            .select(id_col, "span_start", "span_end"))

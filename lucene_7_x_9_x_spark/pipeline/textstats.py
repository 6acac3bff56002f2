"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
JVM-side expressions (whole-stage codegen), no Python UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]

LANG_MARKERS = {
    "py": ["def", "import", "self", "lambda", "elif"],
    "java": ["public", "void", "static", "extends", "implements"],
    "c": ["struct", "typedef", "malloc", "sizeof", "include"],
    "go": ["func", "chan", "defer", "goroutine", "package"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_distinct, n_chars) — the FieldInvertState analogue
    exposed as a pipeline op."""
    ts = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(ts).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ts)).cast("long").alias("n_distinct"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"))


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: stopword count, punctuation count, mean
    token length (as exact rationals: numerator/denominator columns so the
    comparison with SQL oracles is float-free)."""
    ts = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return df.select(
        F.col(id_col),
        F.size(ts).cast("long").alias("n_tokens"),
        F.size(F.filter(ts, lambda t: F.array_contains(stop_arr, t)))
        .cast("long").alias("n_stopwords"),
        (F.length(F.col(text_col))
         - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")))
        .cast("long").alias("n_punct"),
        F.aggregate(ts, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).alias("sum_token_len"))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-keyword language guess. Deterministic tie order: langs in
    sorted key order, first max wins; 'unknown' when no marker hits."""
    ts = tokens_col(text_col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))
            .alias(f"s_{lang}"))
    tmp = df.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier lang wins ties -> apply last first
        pred = F.when((F.col(f"s_{lg}") == best) & (best > 0),
                      F.lit(lg)).otherwise(pred)
    return tmp.select(F.col(id_col), pred.alias("pred_lang"))


def term_vectors(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc term vectors — the reference's term-vectors storage
    (solr-8.4.0/.../index/TermVectorsWriter.java capability, SURVEY §2.8)
    re-expressed as a derived DataFrame: (id, term, tf, positions) with
    0-based positions joined by ','. Pure JVM expressions; at scale this is
    one explode + one (id, term) hash aggregation."""
    # same single-scan-partition guard as dedup.shingles: parallelize the
    # tokenize before the posexplode fan-out (single-file corpora scan as
    # ONE partition)
    toks = (df.select(F.col(id_col), tokens_col(text_col).alias("ts"))
            .repartition(df.sparkSession.sparkContext.defaultParallelism)
            .select(F.col(id_col),
                    F.posexplode("ts").alias("pos", "term")))
    return (toks.groupBy(id_col, "term")
            .agg(F.count("*").cast("long").alias("tf"),
                 F.concat_ws(",", F.sort_array(F.collect_list(
                     F.col("pos").cast("long")))).alias("positions")))


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                n_mins: int = 4) -> DataFrame:
    """Deterministic document fingerprint: the n_mins smallest md5s of the
    token set (winnowing-style min-hash sketch, md5 so SQL oracles agree
    bit-for-bit), joined with '|'."""
    ts = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.concat_ws("|", F.slice(
            F.array_sort(F.transform(F.array_distinct(ts),
                                     lambda t: F.md5(t))),
            1, n_mins)).alias("fp"))

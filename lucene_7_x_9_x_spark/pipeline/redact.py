"""PII redaction for training-data pipelines: regex-driven detection and
masking of emails, IPv4 addresses, SSN-like ids, card-like numbers and
phone-like numbers (the standard pre-training scrub pass, e.g. the
C4/RefinedWeb-style PII rules).

ONE rule table (`PII_RULES`) drives BOTH engines: the Spark operator
applies the rules with JVM-side regexp_replace/regexp_count (whole-stage
codegen — no Python in the hot path), and `redact_sql()` generates the
equivalent DuckDB expressions from the same tuples, so the oracle
reproduces the redaction bit-for-bit. Patterns are therefore restricted
to the Java-regex ∩ RE2 common subset: explicit classes, `\\d`, `\\b`,
non-capturing groups, greedy quantifiers — no lookaround, no backrefs,
no `\\p{...}` (the same tri-runtime discipline as UNICODE_TOKEN_REGEX).

Rules apply IN ORDER and each counts its matches on the text as left by
the previous rule (cards before phones, so a card number is never
double-counted as a phone).

Scale shape: pure per-row scan-stage expressions — no shuffle, no UDF;
at 100 TB this pipelines with the parquet scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (name, pattern, replacement) — order matters; patterns must stay in
#: the Java-regex ∩ RE2 subset and contain no single quotes.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("phone", r"\b\+?\d{3}[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_ssn, n_card, n_phone): masked
    text plus per-kind match counts (counted sequentially, each on the
    previous rule's output)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long")
                      .alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), cur.alias("redacted"), *counts)


def redact_sql(text_expr: str) -> tuple[str, list[str]]:
    """DuckDB equivalents generated from the SAME rule table: returns
    (redacted_sql, [count_sql AS n_<name>, ...]). RE2 evaluates the
    identical patterns; 'g' makes the replace global like Spark's."""
    cur = text_expr
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) "
            f"AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return cur, counts

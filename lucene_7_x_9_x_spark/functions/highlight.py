"""Snippet extraction / term highlighting — the reference highlighter
module's core capability (solr-8.4.0/lucene/highlighter/, SimpleHTMLFormatter
+ Highlighter.getBestFragment) re-expressed as pure JVM-side Catalyst
expressions: no Python in the row path, predicate/projection pushdown
applies, and the same logic is reproducible in any SQL engine (the
correctness-gate oracle runs it in DuckDB).

Fragmenting model: the snippet window starts shortly before the FIRST
occurrence of any query term (deterministic, not tf-scored — the
SimpleFragmenter capability, not the scored FastVectorHighlighter); every
query-term occurrence inside the window is wrapped in pre/post tags with
original case preserved via a capture group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def highlight_snippets(df: DataFrame, terms: list[str],
                       text_col: str = "text", id_col: str = "doc_id",
                       width: int = 80, lead: int = 20,
                       pre: str = "<b>", post: str = "</b>") -> DataFrame:
    """(id, snippet) for docs containing at least one of `terms` (substring
    match on lowercased text). The window is `width` chars starting `lead`
    chars before the first term occurrence; occurrences are wrapped
    pre<term>post case-insensitively."""
    if not terms:
        raise ValueError("terms must be non-empty")
    low = F.lower(F.col(text_col))
    poss = [F.when(F.instr(low, t) > 0, F.instr(low, t)) for t in terms]
    first = poss[0] if len(poss) == 1 else F.least(*poss)
    start = F.greatest(F.lit(1), first - F.lit(lead))
    raw = F.col(text_col).substr(start, F.lit(width))
    pat = "(?i)(" + "|".join(terms) + ")"
    snip = F.regexp_replace(raw, pat, pre + "$1" + post)
    return (df.where(first.isNotNull())
            .select(F.col(id_col), snip.alias("snippet")))

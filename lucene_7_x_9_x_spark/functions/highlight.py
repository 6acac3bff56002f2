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


def highlight_from_index(searcher, source_df: DataFrame, terms: list[str],
                         text_col: str = "text", id_col: str = "doc_id",
                         width: int = 80, lead: int = 20,
                         pre: str = "<b>", post: str = "</b>",
                         field: str | None = None,
                         passages: str = "first") -> DataFrame:
    """Index-offsets highlighter (the unified-highlighter consumption model:
    IndexOptions ..._AND_OFFSETS): occurrence character offsets come from
    the index's stored offset payloads — the documents are NOT re-analyzed
    or regex-scanned at query time; the stored text is only sliced. Window =
    `width` chars starting `lead` before an anchor occurrence; every
    occurrence fully inside the window is wrapped pre..post.

    passages="first" anchors at the first occurrence (fast default);
    passages="best" scores every occurrence-anchored window with the
    PassageScorer formula (solr-8.4.0/.../uhighlight/PassageScorer.java:
    per distinct matched term idf(t) * (k1+1)*tf/(tf+k1), summed) and
    returns the best-scoring window (ties -> earliest), the
    UnifiedHighlighter's passage-selection behavior over offset windows
    instead of BreakIterator sentences.

    field selects which indexed field's offsets to use (None = default);
    text_col must be that field's source text column in source_df."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if passages not in ("first", "best"):
        raise ValueError("passages must be 'first' or 'best'")
    # ONE postings scan + kernel for all query terms
    offs = searcher.terms_offsets(terms, field)
    merged = (offs.select("segment", "docid",
                          F.col("term").alias("t"),
                          F.explode(F.arrays_zip("starts", "ends"))
                          .alias("se"))
              .groupBy("segment", "docid")
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("se.starts").alias("s"),
                           F.col("se.ends").alias("e"),
                           F.col("t")))).alias("occ")))
    dm = searcher.index.docmap().select("segment", "docid", id_col)
    joined = (merged.join(dm, ["segment", "docid"])
              .join(source_df.select(id_col, text_col), id_col))

    if passages == "best":
        from ..plans.query import term_key
        stats = searcher._global_stats(
            {term_key(field, t) for t in terms})
        idf = {t: float(stats.idf(term_key(field, t))) for t in terms}
        k1 = float(searcher.k1)
    else:
        idf, k1 = {}, 0.0

    from pyspark.sql.functions import pandas_udf

    def _snip(text, occ):
        import pandas as pd
        out = []
        for txt, oc in zip(text, occ):
            if passages == "best":
                best_s0, best_score = None, -1.0
                for anchor in oc:
                    s0 = max(0, int(anchor["s"]) - lead)
                    e0 = s0 + width
                    tf: dict = {}
                    for so in oc:
                        if s0 <= int(so["s"]) and int(so["e"]) <= e0:
                            tf[so["t"]] = tf.get(so["t"], 0) + 1
                    score = sum(idf.get(t, 0.0)
                                * (k1 + 1.0) * n / (n + k1)
                                for t, n in tf.items())
                    if score > best_score:
                        best_s0, best_score = s0, score
                s0 = best_s0
            else:
                s0 = max(0, int(oc[0]["s"]) - lead)
            e0 = s0 + width
            parts, cur = [], s0
            for so in oc:
                a, b = int(so["s"]), int(so["e"])
                if a < cur or b > e0:
                    continue
                parts.append(txt[cur:a])
                parts.append(pre + txt[a:b] + post)
                cur = b
            parts.append(txt[cur:e0])
            out.append("".join(parts))
        return pd.Series(out)

    snip_udf = pandas_udf(_snip, "string")
    return joined.select(F.col(id_col),
                         snip_udf(F.col(text_col), F.col("occ"))
                         .alias("snippet"))

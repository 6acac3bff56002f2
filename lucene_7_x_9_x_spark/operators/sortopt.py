"""Sort-optimization operators: stats-pruned numeric top-k.

Plays Lucene 9's sort optimization — the NumericComparator competitive
iterator that intersects the point index with the current top-k bound and
skips non-competitive docs (reference demos
LuceneDemo9.2.0/src/main/java/NumericDocValuesTopNOptimization2.java and
LuceneDemo9.6.0/src/main/java/TestEarlyTerminal.java; engine code
solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/comparators/
NumericComparator.java).

Columnar re-expression: parquet row-group min/max/null-count statistics
(read driver-side from the file footers via pyarrow — the BKD metadata
role, no Spark job) yield a SAFE value cutoff c0 such that the true
top-k all sit on the competitive side of c0. The scan then carries a
pushed-down range predicate, so row groups wholly past the cutoff never
leave the reader — the exact effect of the reference's point-index skip,
expressed as predicate pushdown Catalyst already knows how to exploit.

Safety argument (ascending; descending is the mirror): take row groups
in increasing order of their column MAX and accumulate their non-null
row counts until >= k; let c0 be the last max taken. Every non-null
value in an accumulated group is <= its group max <= c0, so at least k
non-null values satisfy col <= c0 — hence the k-th smallest sort key is
<= c0 and every true top-k row satisfies col <= c0 (or is NULL with a
missing-value substitute <= c0; see pruned_topk). Any row group lacking
stats for the column, or a table with fewer than k non-null values,
disables pruning (returns None) — the caller falls back to the full
sort, which is always correct.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rowgroup_value_stats(paths, col: str) -> list | None:
    """[(vmin, vmax, n_nonnull)] for every row group of every parquet
    file under `paths` (a list of files or directories) — a driver-side
    footer read only. Returns None if any row group lacks min/max stats
    for `col` (pruning would be unsafe without them)."""
    import pyarrow.dataset as pads

    ds = (pads.dataset(list(paths)[0], format="parquet")
          if len(list(paths)) == 1 else
          pads.dataset([pads.dataset(p, format="parquet") for p in paths]))
    out = []
    for frag in ds.get_fragments():
        md = frag.metadata
        if md.num_row_groups == 0:
            continue
        ci = None
        for j in range(md.row_group(0).num_columns):
            if md.row_group(0).column(j).path_in_schema == col:
                ci = j
                break
        if ci is None:
            return None
        # numeric physical types only: BYTE_ARRAY (string) min/max stats
        # may be length-truncated by the writer, and a truncated max
        # UNDERSTATES the true max — the cutoff accumulation would then
        # overcount competitive rows and prune true top-k rows. Strings
        # sort correctly through the un-pruned TakeOrderedAndProject
        # (TermOrdValComparator's role needs no skip to stay k-bounded).
        if md.row_group(0).column(ci).physical_type not in (
                "INT32", "INT64", "FLOAT", "DOUBLE"):
            return None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            nulls = st.null_count if st.has_null_count else 0
            n = rg.num_rows - (nulls or 0)
            if n > 0:
                out.append((st.min, st.max, n))
    return out


def prune_threshold(stats: list | None, k: int, ascending: bool = True):
    """Safe cutoff c0 from row-group stats: at least k non-null values
    are guaranteed on the competitive side (col <= c0 ascending,
    col >= c0 descending). None when stats are unusable or the table
    holds fewer than k non-null values — the caller must full-sort."""
    if stats is None or sum(n for _, _, n in stats) < k:
        return None
    rows = 0
    if ascending:
        for _, vmax, n in sorted(stats, key=lambda s: s[1]):
            rows += n
            if rows >= k:
                return vmax
    else:
        for vmin, _, n in sorted(stats, key=lambda s: s[0], reverse=True):
            rows += n
            if rows >= k:
                return vmin
    return None


def pruned_topk(df: DataFrame, col: str, k: int, *, ascending: bool = True,
                missing=None, cutoff=None, tiebreak=()):
    """Top-k of `df` by `col` with SortField.setMissingValue semantics
    (reference demo LuceneDemo9.0.0/src/main/java/facet/
    MissingValueTest.java: docs without the field sort as the missing
    value; `missing=None` excludes them, the docvalues-iterator view).

    When `cutoff` (from prune_threshold) is given, the competitive-side
    range predicate is applied FIRST — it pushes down to the parquet
    scan and prunes row groups, and the ORDER BY ... LIMIT k then runs
    over the small survivor set (TakeOrderedAndProject). NULL rows stay
    candidates only while the missing substitute is itself competitive
    (missing <= c0 ascending); otherwise at least k non-null competitive
    values already beat them.

    Returns (limited_df, order) — the caller ranks/projects."""
    c = F.col(col)
    if missing is None:
        key = c
        df = df.where(c.isNotNull())
    else:
        key = F.coalesce(c, F.lit(missing))
    if cutoff is not None:
        pred = (c <= cutoff) if ascending else (c >= cutoff)
        if missing is not None and \
                (missing <= cutoff if ascending else missing >= cutoff):
            pred = pred | c.isNull()
        df = df.where(pred)
    order = [key.asc() if ascending else key.desc(), *tiebreak]
    return df.orderBy(*order).limit(k), order

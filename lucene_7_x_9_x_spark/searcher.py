"""Driver-side search API over an IndexSnapshot (IndexSearcher analogue).

Plan shape per query (SURVEY.md §3.2 Spark translation):
  driver:   rewrite -> gather term stats (pruned scan of the terms table)
            -> per-query constants
  executors: cogroup(postings rows of the query terms BY segment,
                     docmap norms BY segment) -> applyInPandas kernel
            -> per-segment top-k
  driver:   ORDER BY score DESC, segment, docid LIMIT k (Catalyst
            TakeOrderedAndProject) == TopDocs.merge tie semantics
            (solr-8.4.0/.../search/TopDocs.java:75,106)

The postings scan carries a pushed-down IN(term, ...) filter; postings files
are written sorted by term, so parquet row-group stats prune the scan — the
BlockTree/FST seek analogue (SURVEY.md §3.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .functions import bm25
from .index import IndexSnapshot
from .operators import executor as ex
from .operators.search import (SparkSegmentReader, blockmax_topk,
                               classify_blockmax)
from .plans import query as Q
from .plans.query import RewriteContext, rewrite as rewrite_query


class Searcher:
    def __init__(self, index: IndexSnapshot, k1: float = bm25.DEFAULT_K1,
                 b: float = bm25.DEFAULT_B, max_expansions: int = 1024):
        self.index = index
        self.k1, self.b = k1, b
        self.max_expansions = max_expansions
        self._ctx = RewriteContext(expand_terms=self._expand,
                                   max_expansions=max_expansions)

    # ---------------- driver-side rewrite/expansion over the terms table
    def _expand(self, q) -> list | None:
        t = self.index.terms()
        c = F.col("term")
        if isinstance(q, Q.PrefixQuery):
            t = t.where(c.startswith(q.prefix))
        elif isinstance(q, Q.WildcardQuery):
            t = t.where(c.rlike(q.to_regex()))
        elif isinstance(q, Q.RegexpQuery):
            t = t.where(c.rlike("^(?:" + q.pattern + ")$"))
        elif isinstance(q, Q.TermRangeQuery):
            if q.lower is not None:
                t = t.where(c >= q.lower if q.include_lower else c > q.lower)
            if q.upper is not None:
                t = t.where(c <= q.upper if q.include_upper else c < q.upper)
        elif isinstance(q, Q.FuzzyQuery):
            t = t.where((F.length(c) >= len(q.term) - q.max_edits)
                        & (F.length(c) <= len(q.term) + q.max_edits)
                        & (F.levenshtein(c, F.lit(q.term)) <= q.max_edits))
        else:
            return None
        rows = (t.select("term").orderBy("term")
                .limit(self.max_expansions).collect())
        return [r.term for r in rows]

    def rewrite(self, query):
        return rewrite_query(query, self._ctx)

    # ---------------- stats gathering (once per query)
    def _global_stats(self, terms: set) -> ex.SegmentStats:
        dfs, ttfs = {}, {}
        if terms:
            rows = (self.index.terms()
                    .where(F.col("term").isin(list(terms)))
                    .collect())
            for r in rows:
                dfs[r.term] = int(r.doc_freq)
                ttfs[r.term] = int(r.total_term_freq)
        s = self.index.stats
        return ex.SegmentStats(
            doc_count=s["doc_count"],
            sum_total_term_freq=s["sum_total_term_freq"],
            doc_freqs=dfs, total_term_freqs=ttfs, k1=self.k1, b=self.b)

    # ---------------- kernels
    def _kernel_frame(self, query, terms: set) -> DataFrame:
        post = self.index.postings()
        if terms:
            post = post.where(F.col("term").isin(list(terms)))
        else:  # match-all style queries need no postings
            post = post.where(F.lit(False))
        dm = self.index.docmap().select("segment", "docid", "norm")
        return post.groupBy("segment").cogroup(dm.groupBy("segment"))

    def _run(self, query, k: int | None, mode: str) -> DataFrame:
        query = self.rewrite(query)
        terms = Q.scoring_terms(query) | _filter_terms(query)
        stats = self._global_stats(terms)
        plan = classify_blockmax(query) if mode in ("auto", "blockmax") else None
        use_blockmax = plan is not None and k is not None and mode != "complete"
        k1, b = self.k1, self.b

        def kernel(key, post_pdf: pd.DataFrame, dm_pdf: pd.DataFrame
                   ) -> pd.DataFrame:
            seg = int(key[0])
            if len(dm_pdf) == 0:
                return pd.DataFrame({"segment": [], "docid": [], "score": []})
            dm_sorted = dm_pdf.sort_values("docid")
            norms = (dm_sorted["norm"].to_numpy(np.int64) & 0xFF).astype(np.uint8)
            reader = SparkSegmentReader(post_pdf, norms, len(dm_pdf))
            if use_blockmax:
                d, s, _ = blockmax_topk(reader, stats, plan, k)
            else:
                m = ex.evaluate(reader, stats, query)
                if k is not None:
                    d, s = ex.top_k(m, k)
                else:
                    d, s = m.docids, m.scores
            return pd.DataFrame({
                "segment": np.full(len(d), seg, dtype=np.int32),
                "docid": d, "score": s.astype(np.float32)})

        return self._kernel_frame(query, terms).applyInPandas(
            kernel, schema="segment int, docid long, score float")

    # ---------------- public API
    def search(self, query, k: int = 10, mode: str = "auto",
               with_ids: bool = True) -> DataFrame:
        """Top-k BM25. Returns DataFrame(rank, segment, docid, score [, id
        cols]) with (score desc, segment asc, docid asc) order."""
        res = (self._run(query, k, mode)
               .orderBy(F.desc("score"), "segment", "docid").limit(k))
        w = Window.orderBy(F.desc("score"), "segment", "docid")
        res = res.withColumn("rank", F.row_number().over(w))
        if with_ids:
            dm = self.index.docmap().select(
                "segment", "docid", *self.index.id_cols)
            # k rows vs the full docmap: broadcast the tiny result side
            res = dm.join(F.broadcast(res), on=["segment", "docid"],
                          how="inner")
        cols = ["rank", "segment", "docid", "score"] + (
            self.index.id_cols if with_ids else [])
        return res.select(*cols).orderBy("rank")

    def matches(self, query) -> DataFrame:
        """All matching docs: DataFrame(segment, docid, score)."""
        return self._run(query, None, "complete")

    def count(self, query) -> int:
        return self._run(query, None, "complete").count()


def _filter_terms(q) -> set:
    """Terms referenced by FILTER/MUST_NOT clauses (needed by kernels but
    not 'scoring' terms)."""
    out = set()
    if isinstance(q, Q.BooleanQuery):
        for c in q.clauses:
            out |= Q.scoring_terms(c.query) | _filter_terms(c.query)
    return out

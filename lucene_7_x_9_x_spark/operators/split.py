"""Index splitting — the PKIndexSplitter role
(solr-8.4.0/lucene/misc/src/java/org/apache/lucene/index/
PKIndexSplitter.java): split one index into TWO complete standalone
indexes by a query; docs matching the query land in one, the rest in
the other. The reference implements each half as "delete the complement,
then rewrite through SegmentMerger" — here each half is exactly that:
compact_index with an overridden drop set (decode → filter → renumber →
re-encode, stats re-finalized), so each half's docFreq/totalTermFreq
count ONLY its own docs, identical to an index built fresh from the
filtered corpus.

Scale shape: the match set is computed once with the normal postings
kernel; each half's rewrite is the compaction cogroup — per-segment
parallel work, tombstones never collected to the driver."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..index import IndexSnapshot
from .deletes import compact_index


def split_index(spark: SparkSession, index: IndexSnapshot, query,
                out_match: str, out_rest: str
                ) -> tuple[IndexSnapshot, IndexSnapshot]:
    """Returns (match_half, rest_half). Docs already tombstoned in the
    source (hard or effective soft) appear in NEITHER half — the
    reference's splitter likewise drops liveDocs-dead docs."""
    from ..searcher import Searcher
    m = (Searcher(index).matches(query)
         .select("segment", "docid"))
    dm = index.docmap().select("segment", "docid")
    rest_dels = m                      # drop matches -> rest half
    match_dels = dm.join(m, ["segment", "docid"], "left_anti")
    dels = index.deletes()
    if dels is not None:
        # matches() already excludes tombstoned docs, so match_dels
        # (docmap minus matches) contains them; the rest half must drop
        # them explicitly
        rest_dels = rest_dels.unionByName(
            dels.select("segment", "docid")).distinct()
    a = compact_index(spark, index, out_match, dels_override=match_dels)
    b = compact_index(spark, index, out_rest, dels_override=rest_dels)
    return a, b

"""Deletes / updates — the liveDocs analogue (closes SURVEY §7.5's scoped-out
sliver).

Lucene marks deletions in per-segment liveDocs bitsets: deleted docs stop
matching immediately, but keep contributing to docFreq/totalTermFreq until a
merge rewrites the segment (IndexWriter.deleteDocuments;
solr-8.4.0/.../index/FreqProxTermsWriter.java:39-66 applies buffered deletes
at flush). This module mirrors that contract:

  - tombstones are tiny (segment, docid) parquet rows committed through the
    manifest (two-phase, snapshot-isolated: an already-open IndexSnapshot
    never sees them);
  - the Searcher filters tombstoned docs inside the per-segment kernels
    BEFORE top-k, so k semantics stay exact;
  - global stats stay unchanged until finalize()/merge, exactly like
    Lucene's docFreq-including-deletes behavior;
  - update = delete old ids + append the new docs as new segments
    (IndexWriter.updateDocument).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index import MANIFEST, IndexSnapshot, _atomic_write_json


def delete_by_ids(spark: SparkSession, index_dir: str,
                  ids: DataFrame) -> int:
    """Mark docs whose id columns appear in `ids` as deleted. Returns the
    number of tombstones written. Ids absent from the index are ignored."""
    idx = IndexSnapshot(spark, index_dir)
    tomb = (idx.docmap()
            .join(ids.select(*idx.id_cols).distinct(), idx.id_cols,
                  "leftsemi")
            .select("segment", "docid"))
    name = os.path.join("deletes", f"del_{uuid.uuid4().hex[:12]}")
    path = os.path.join(index_dir, name)
    tomb.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    m = dict(idx.manifest)
    m["deletes"] = m.get("deletes", []) + [name]
    m["run_id"] = uuid.uuid4().hex[:12]
    m.setdefault("checkpoints", []).append(
        {"stage": "delete", "batch": name, "status": "done", "rows": n})
    _atomic_write_json(os.path.join(index_dir, MANIFEST), m)
    return n


def update_docs(spark: SparkSession, index_dir: str, new_docs: DataFrame,
                *, refresh_stats: bool = True) -> IndexSnapshot:
    """updateDocument analogue: tombstone any existing docs with the same
    ids, append the new docs as new segments, then (optionally) refresh the
    global terms/stats snapshot."""
    from ..streaming.incremental import append_batch, finalize
    idx = IndexSnapshot(spark, index_dir)
    delete_by_ids(spark, index_dir, new_docs.select(*idx.id_cols))
    append_batch(spark, new_docs, index_dir)
    if refresh_stats:
        return finalize(spark, index_dir)
    return IndexSnapshot(spark, index_dir)

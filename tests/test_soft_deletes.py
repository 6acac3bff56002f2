"""Soft deletes — IndexWriterConfig.setSoftDeletesField /
softUpdateDocument / SoftDeletesRetentionMergePolicy semantics (demos
lucene.softDeletes.SoftDeletesTest0-10):

  - soft-deleted docs stop matching searches (the wrapped-reader view)
    but stay physically present: a snapshot opened with
    include_soft_deleted=True (the unwrapped DirectoryReader) sees them;
  - undelete restores them — the recovery move soft deletes exist for;
  - compaction honors a retention policy: retained soft-deleted docs
    survive the physical rewrite (still soft-deleted, renumbered),
    the rest are purged like hard tombstones;
  - merge rebases soft tombstones without hardening them.
"""

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.deletes import (compact_index,
                                                    soft_delete_by_ids,
                                                    soft_update_docs,
                                                    undelete_by_ids)
from lucene_7_x_9_x_spark.plans.query import TermQuery
from lucene_7_x_9_x_spark.searcher import Searcher
from tests.test_search import _random_corpus


def _ids(spark, vals):
    return spark.createDataFrame([(str(v),) for v in vals], "id string")


def _build(spark, tmp_path, n=200, seed=31, segments=3):
    rng = np.random.RandomState(seed)
    pdf = _random_corpus(rng, n_docs=n)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content",
                num_segments=segments)
    return out, pdf


def test_soft_delete_hides_from_search_but_not_unwrapped(spark, tmp_path):
    out, pdf = _build(spark, tmp_path)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h0")
    before = s0.search(q, 5, with_ids=True).toPandas()
    victims = before["id"].tolist()[:2]
    n = soft_delete_by_ids(spark, out, _ids(spark, victims), value=3)
    assert n == 2
    # snapshot isolation: the already-open searcher still sees them
    assert set(victims) <= set(
        s0.search(q, 5, with_ids=True).toPandas()["id"])
    wrapped = Searcher(IndexSnapshot(spark, out))
    after = wrapped.search(q, 5, with_ids=True).toPandas()
    assert len(after) == 5  # k refilled from below
    assert not set(victims) & set(after["id"])
    assert wrapped.count(q) == s0.count(q) - 2
    # the unwrapped reader (no SoftDeletesDirectoryReaderWrapper) still
    # matches the soft-deleted docs
    unwrapped = Searcher(IndexSnapshot(spark, out,
                                       include_soft_deleted=True))
    assert set(victims) <= set(
        unwrapped.search(q, 5, with_ids=True).toPandas()["id"])
    assert unwrapped.count(q) == s0.count(q)
    # the soft tombstones carry the docvalues stamp + op sequence
    sd = IndexSnapshot(spark, out).soft_deletes().toPandas()
    assert set(sd["value"]) == {3} and set(sd["seq"]) == {1}


def test_undelete_restores(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=32)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h1")
    victims = s0.search(q, 4, with_ids=True).toPandas()["id"].tolist()
    soft_delete_by_ids(spark, out, _ids(spark, victims))
    assert Searcher(IndexSnapshot(spark, out)).count(q) \
        == s0.count(q) - len(victims)
    restored = undelete_by_ids(spark, out, _ids(spark, victims[:2]))
    assert restored == 2
    s2 = Searcher(IndexSnapshot(spark, out))
    assert s2.count(q) == s0.count(q) - len(victims) + 2
    got = set(s2.search(q, 10, with_ids=True).toPandas()["id"])
    assert set(victims[:2]) <= got
    assert not set(victims[2:]) & got


def test_soft_update_docs(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=33)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h2")
    victim = s0.search(q, 1, with_ids=True).toPandas()["id"].iloc[0]
    repl = pd.DataFrame({"id": [victim],
                         "content": ["zz_replacement only"]})
    soft_update_docs(spark, out, spark.createDataFrame(repl), value=7)
    s1 = Searcher(IndexSnapshot(spark, out))
    # old content no longer matches under the victim's id...
    assert victim not in set(
        s1.search(q, 200, with_ids=True).toPandas()["id"])
    # ...the replacement does
    got = s1.search(TermQuery("zz_replacement"), 5,
                    with_ids=True).toPandas()
    assert got["id"].tolist() == [victim]
    # but the OLD doc is still reachable through the unwrapped reader
    unw = Searcher(IndexSnapshot(spark, out, include_soft_deleted=True))
    assert victim in set(
        unw.search(q, 200, with_ids=True).toPandas()["id"])


def test_compact_retention_policy(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=34)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h0")
    hits = s0.search(q, 6, with_ids=True).toPandas()["id"].tolist()
    dropped, kept_soft = hits[:2], hits[2:4]
    soft_delete_by_ids(spark, out, _ids(spark, dropped), value=1)  # seq 1
    soft_delete_by_ids(spark, out, _ids(spark, kept_soft), value=2)  # seq 2
    comp = compact_index(
        spark, IndexSnapshot(spark, out), str(tmp_path / "c"),
        soft_retention=lambda sd: sd.where("seq >= 2"))
    # wrapped view: every soft-deleted doc is still hidden
    sc = Searcher(comp)
    got = set(sc.search(q, 200, with_ids=True).toPandas()["id"])
    assert not (set(dropped) | set(kept_soft)) & got
    # unwrapped view of the compacted index: retained docs survived the
    # physical rewrite, non-retained are GONE for good
    unw = Searcher(IndexSnapshot(spark, comp.root,
                                 include_soft_deleted=True))
    got_unw = set(unw.search(q, 200, with_ids=True).toPandas()["id"])
    assert set(kept_soft) <= got_unw
    assert not set(dropped) & got_unw
    # retained tombstones kept their stamps through renumbering
    sd = comp.soft_deletes().toPandas()
    assert len(sd) == 2 and set(sd["value"]) == {2}
    # ...and an undelete AFTER compaction restores the retained docs
    undelete_by_ids(spark, comp.root, _ids(spark, kept_soft))
    s2 = Searcher(IndexSnapshot(spark, comp.root))
    assert set(kept_soft) <= set(
        s2.search(q, 200, with_ids=True).toPandas()["id"])


def test_compact_without_retention_purges_soft(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=35)
    s0 = Searcher(IndexSnapshot(spark, out))
    victims = s0.search(TermQuery("h1"), 3,
                        with_ids=True).toPandas()["id"].tolist()
    soft_delete_by_ids(spark, out, _ids(spark, victims))
    comp = compact_index(spark, IndexSnapshot(spark, out),
                         str(tmp_path / "c"))
    assert comp.soft_deletes() is None
    unw = Searcher(IndexSnapshot(spark, comp.root,
                                 include_soft_deleted=True))
    assert not set(victims) & set(
        unw.search(TermQuery("h1"), 200, with_ids=True).toPandas()["id"])


def test_merge_rebases_soft_without_hardening(spark, tmp_path):
    from lucene_7_x_9_x_spark.operators.merge import merge_index
    out, pdf = _build(spark, tmp_path, seed=36, segments=4)
    s0 = Searcher(IndexSnapshot(spark, out))
    q = TermQuery("h2")
    victims = s0.search(q, 3, with_ids=True).toPandas()["id"].tolist()
    soft_delete_by_ids(spark, out, _ids(spark, victims), value=9)
    merged = merge_index(spark, IndexSnapshot(spark, out),
                         str(tmp_path / "m"), target_segments=2, salt=2)
    sm = Searcher(merged)
    assert not set(victims) & set(
        sm.search(q, 200, with_ids=True).toPandas()["id"])
    # still SOFT after the merge: visible unwrapped, restorable
    unw = Searcher(IndexSnapshot(spark, merged.root,
                                 include_soft_deleted=True))
    assert set(victims) <= set(
        unw.search(q, 200, with_ids=True).toPandas()["id"])
    sd = merged.soft_deletes().toPandas()
    assert len(sd) == 3 and set(sd["value"]) == {9}
    undelete_by_ids(spark, merged.root, _ids(spark, victims))
    assert set(victims) <= set(
        Searcher(IndexSnapshot(spark, merged.root))
        .search(q, 200, with_ids=True).toPandas()["id"])

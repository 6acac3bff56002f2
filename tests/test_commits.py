"""Commit points / snapshot deletion policy / file retention (demos
IndexDeletePolicyTest, PersistentSnapshotDeletionPolicyTest,
HistoryRetention, StaleIndexCommit, IndexFileDeleteTest)."""

import os

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.commits import (commit_point,
                                                    list_commits,
                                                    open_commit,
                                                    purge_commits,
                                                    release_commit,
                                                    rollback_to)
from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids
from lucene_7_x_9_x_spark.plans.query import TermQuery
from lucene_7_x_9_x_spark.searcher import Searcher
from tests.test_search import _random_corpus


def _build(spark, tmp_path, n=150, seed=51):
    rng = np.random.RandomState(seed)
    pdf = _random_corpus(rng, n_docs=n)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=3)
    return out, pdf


def _ids(spark, vals):
    return spark.createDataFrame([(str(v),) for v in vals], "id string")


def test_open_commit_is_point_in_time(spark, tmp_path):
    out, pdf = _build(spark, tmp_path)
    q = TermQuery("h0")
    n0 = Searcher(IndexSnapshot(spark, out)).count(q)
    gen = commit_point(out, label="before-delete")
    victims = (Searcher(IndexSnapshot(spark, out))
               .search(q, 3, with_ids=True).toPandas()["id"].tolist())
    delete_by_ids(spark, out, _ids(spark, victims))
    assert Searcher(IndexSnapshot(spark, out)).count(q) == n0 - 3
    # the retained commit still sees the pre-delete state
    old = Searcher(open_commit(spark, out, gen))
    assert old.count(q) == n0
    cms = list_commits(out)
    assert [c["gen"] for c in cms] == [gen]
    assert cms[0]["label"] == "before-delete"


def test_rollback_restores_commit(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=52)
    q = TermQuery("h1")
    n0 = Searcher(IndexSnapshot(spark, out)).count(q)
    gen = commit_point(out)
    victims = (Searcher(IndexSnapshot(spark, out))
               .search(q, 2, with_ids=True).toPandas()["id"].tolist())
    delete_by_ids(spark, out, _ids(spark, victims))
    rolled = rollback_to(spark, out, gen)
    assert Searcher(rolled).count(q) == n0
    # live manifest now IS the commit
    assert Searcher(IndexSnapshot(spark, out)).count(q) == n0


def test_release_and_missing_commit(spark, tmp_path):
    out, _ = _build(spark, tmp_path, seed=53)
    g1, g2 = commit_point(out), commit_point(out)
    release_commit(out, g1)
    assert [c["gen"] for c in list_commits(out)] == [g2]
    with pytest.raises(ValueError, match="no retained commit"):
        open_commit(spark, out, g1)
    with pytest.raises(ValueError, match="no retained commit"):
        release_commit(out, 99)


def test_purge_reclaims_unreferenced_tombstones(spark, tmp_path):
    out, pdf = _build(spark, tmp_path, seed=54)
    ids = pdf.id.tolist()
    delete_by_ids(spark, out, _ids(spark, ids[:2]))
    g1 = commit_point(out, label="with-del-1")      # pins del file 1
    delete_by_ids(spark, out, _ids(spark, ids[2:4]))
    g2 = commit_point(out, label="with-del-1-2")    # pins files 1+2
    del_files = os.listdir(os.path.join(out, "deletes"))
    assert len(del_files) == 2
    # keep_last=2 keeps both commits: nothing reclaimable
    res = purge_commits(out, keep_last=2)
    assert res["removed_dirs"] == [] and res["released_commits"] == []
    # rollback to g1 then drop g2: delete-file 2 is now unreferenced
    rollback_to(spark, out, g1)
    release_commit(out, g2)
    res = purge_commits(out, keep_last=1)
    assert len(res["removed_dirs"]) == 1
    left = os.listdir(os.path.join(out, "deletes"))
    assert len(left) == 1
    # the retained commit (and the live manifest) still search fine
    q = TermQuery("h0")
    assert Searcher(open_commit(spark, out, g1)).count(q) \
        == Searcher(IndexSnapshot(spark, out)).count(q)


def test_purge_reclaims_rolled_back_batch(spark, tmp_path):
    from lucene_7_x_9_x_spark.streaming.incremental import append_batch
    out, pdf = _build(spark, tmp_path, seed=55)
    gen = commit_point(out)
    extra = pd.DataFrame({"id": ["x1", "x2"],
                          "content": ["zz_new doc one", "zz_new doc two"]})
    append_batch(spark, spark.createDataFrame(extra), out)
    new_batches = [b for b in IndexSnapshot(spark, out).manifest["batches"]
                   if b != "batch_0"]
    assert new_batches
    # roll back before the append: the new batch dir is orphaned
    rollback_to(spark, out, gen)
    res = purge_commits(out, keep_last=1)
    assert set(res["removed_dirs"]) == set(new_batches)
    assert not any(os.path.isdir(os.path.join(out, b))
                   for b in new_batches)
    # index still healthy
    assert Searcher(IndexSnapshot(spark, out)).count(TermQuery("h0")) > 0

"""CheckIndex-analogue structural verification and snapshot replication."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index import (IndexSnapshot, build_index,
                                        check_index, replicate)
from lucene_7_x_9_x_spark.searcher import Searcher
from lucene_7_x_9_x_spark.plans.query import TermQuery

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chk")
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    return build_index(spark, docs, str(tmp / "i"), id_cols=["doc_id"],
                       text_col="text", segment_by="input")


def test_check_index_clean(spark, small_index):
    rep = check_index(spark, small_index)
    assert rep["clean"], rep


def test_check_index_clean_after_deletes_and_compaction(spark, small_index,
                                                        tmp_path):
    from lucene_7_x_9_x_spark.operators.deletes import (compact_index,
                                                        delete_by_ids)
    work = str(tmp_path / "w")
    shutil.copytree(small_index.root, work)
    dels = (spark.range(0, 50, 3)
            .select(F.col("id").alias("doc_id")))
    delete_by_ids(spark, work, dels)
    idx = IndexSnapshot(spark, work)
    assert check_index(spark, idx)["clean"]
    compacted = compact_index(spark, idx, str(tmp_path / "c"))
    assert check_index(spark, compacted)["clean"]


def test_check_index_detects_corruption(spark, small_index, tmp_path):
    work = str(tmp_path / "corrupt")
    shutil.copytree(small_index.root, work)
    # tamper the global terms table: inflate one doc_freq
    idx = IndexSnapshot(spark, work)
    t = idx.terms().toPandas()
    t.loc[t.index[0], "doc_freq"] = int(t["doc_freq"].iloc[0]) + 7
    spark.createDataFrame(
        t, schema="field string, term string, doc_freq long,"
                  " total_term_freq long"
    ).write.mode("overwrite").parquet(os.path.join(work, "terms"))
    rep = check_index(spark, IndexSnapshot(spark, work))
    assert not rep["terms_match"] and not rep["clean"]
    # other checks unaffected
    assert rep["docids_dense"] and rep["segnorms_match"]


def test_replicate_is_identical_and_atomic(spark, small_index, tmp_path):
    dest = str(tmp_path / "replica")
    rep = replicate(spark, small_index, dest)
    assert check_index(spark, rep)["clean"]
    a = Searcher(small_index).search(TermQuery("filter"), 10).collect()
    b = Searcher(rep).search(TermQuery("filter"), 10).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert rep.manifest["replicated_from"] == small_index.root
    # atomicity: a dest without a manifest is not a readable snapshot
    half = str(tmp_path / "half")
    os.makedirs(half)
    with pytest.raises(FileNotFoundError):
        IndexSnapshot(spark, half)


def test_replicate_is_incremental(spark, tmp_path):
    # second replication of the same revision copies NOTHING; after a
    # deletes commit only the new tombstone files ship
    import os
    from lucene_7_x_9_x_spark.index import (IndexSnapshot, build_index,
                                            replicate)
    from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    idx = build_index(spark, docs, src, id_cols=["doc_id"],
                      text_col="text", num_segments=4)
    r1 = replicate(spark, idx, dst)
    c1 = r1.manifest["replication"]
    assert c1["copied"] > 0
    r2 = replicate(spark, IndexSnapshot(spark, src), dst)
    c2 = r2.manifest["replication"]
    assert c2["copied"] == 0 and c2["reused"] == c1["copied"]
    # commit deletes -> only the tombstone parquet ships
    delete_by_ids(spark, src, docs.where("doc_id < 5").select("doc_id"))
    r3 = replicate(spark, IndexSnapshot(spark, src), dst)
    c3 = r3.manifest["replication"]
    assert 0 < c3["copied"] < c1["copied"]
    assert r3.deletes() is not None and r3.deletes().count() == 5

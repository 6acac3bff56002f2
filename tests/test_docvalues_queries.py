"""Docvalues-style structured queries: FieldExistsQuery, PointInSetQuery,
and IntRange field relations (FieldExistQueryTest.java,
TestPointInSetQuery.java, IntRangeTest.java demo roles). Semantics
checked against pandas replicas; tombstone-awareness and scan pushdown
asserted.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
from lucene_7_x_9_x_spark.operators.deletes import delete_by_ids
from lucene_7_x_9_x_spark.searcher import Searcher
from tests.test_search import _random_corpus


@pytest.fixture(scope="module")
def dv_index(spark, tmp_path_factory):
    rng = np.random.RandomState(21)
    pdf = _random_corpus(rng, n_docs=200)
    out = str(tmp_path_factory.mktemp("dvq") / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=3)
    return Searcher(IndexSnapshot(spark, out)), pdf


def _dv(spark, pdf):
    ids = pdf.id.str[1:].astype(int)  # corpus ids are 'd000123'
    vals = pd.DataFrame({
        "id": pdf.id,
        "val": np.where(ids % 3 != 0, ids % 7, np.nan),
        "range_min": (ids % 50).astype(int),
        "range_max": (ids % 50 + ids % 13).astype(int)})
    # real NULLs (NaN is a float value, not NULL, in Spark)
    rows = [(r.id, None if pd.isna(r.val) else float(r.val),
             int(r.range_min), int(r.range_max))
            for r in vals.itertuples()]
    df = spark.createDataFrame(
        rows, "id string, val double, range_min int, range_max int")
    return df, vals


def test_field_exists(spark, dv_index):
    s, pdf = dv_index
    dv, vals = _dv(spark, pdf)
    got = sorted(r["id"] for r in
                 s.field_exists_docs("val", docvalues=dv).collect())
    want = sorted(vals.id[vals.val.notna()])
    assert got == want and 0 < len(got) < len(pdf)


def test_field_exists_docmap_column(dv_index):
    # docvalues=None probes a stored docmap column (all docs have dl)
    s, pdf = dv_index
    assert s.field_exists_docs("dl").count() == len(pdf)


def test_point_in_set(spark, dv_index):
    s, pdf = dv_index
    dv, vals = _dv(spark, pdf)
    got = sorted(r["id"] for r in
                 s.point_in_set_docs([1, 3, 5], "val",
                                     docvalues=dv).collect())
    want = sorted(vals.id[vals.val.isin([1, 3, 5])])
    assert got == want and len(got) > 0


RELATIONS = ["intersects", "within", "contains", "crosses"]


@pytest.mark.parametrize("relation", RELATIONS)
def test_range_field_relations(spark, dv_index, relation):
    s, pdf = dv_index
    dv, vals = _dv(spark, pdf)
    lo, hi = 20, 40
    got = sorted(r["id"] for r in
                 s.range_field_docs(lo, hi, relation, docvalues=dv)
                 .collect())
    inter = (vals.range_min <= hi) & (vals.range_max >= lo)
    within = (vals.range_min >= lo) & (vals.range_max <= hi)
    contains = (vals.range_min <= lo) & (vals.range_max >= hi)
    want = {"intersects": inter, "within": within, "contains": contains,
            "crosses": inter & ~within & ~contains}[relation]
    assert got == sorted(vals.id[want])
    if relation != "contains":  # [id%50, +id%13] can't span [20,40]
        assert len(got) > 0


def test_range_contains_nonempty(spark, dv_index):
    # CONTAINS with a query range small enough to fit inside doc ranges
    s, pdf = dv_index
    dv, vals = _dv(spark, pdf)
    got = sorted(r["id"] for r in
                 s.range_field_docs(25, 27, "contains", docvalues=dv)
                 .collect())
    want = vals.id[(vals.range_min <= 25) & (vals.range_max >= 27)]
    assert got == sorted(want) and len(got) > 0


def test_crosses_partitions_intersects(spark, dv_index):
    # intersects == within ∪ contains ∪ crosses, pairwise disjoint
    s, pdf = dv_index
    dv, _ = _dv(spark, pdf)
    sets = {r: set(x["id"] for x in
                   s.range_field_docs(20, 40, r, docvalues=dv).collect())
            for r in RELATIONS}
    assert sets["intersects"] == \
        sets["within"] | sets["contains"] | sets["crosses"]
    assert not sets["within"] & sets["crosses"]
    assert not sets["contains"] & sets["crosses"]


def test_unknown_relation_raises(spark, dv_index):
    s, _ = dv_index
    with pytest.raises(ValueError, match="unknown range relation"):
        s.range_field_docs(1, 2, "outside")


def test_tombstones_filtered(spark, tmp_path):
    rng = np.random.RandomState(22)
    pdf = _random_corpus(rng, n_docs=100)
    out = str(tmp_path / "i")
    build_index(spark, spark.createDataFrame(pdf), out,
                id_cols=["id"], text_col="content", num_segments=2)
    victims = pdf.id.tolist()[:5]
    delete_by_ids(spark, out,
                  spark.createDataFrame([(v,) for v in victims],
                                        "id string"))
    s = Searcher(IndexSnapshot(spark, out))
    dv, _ = _dv(spark, pdf)
    for df in (s.field_exists_docs("val", docvalues=dv),
               s.point_in_set_docs(list(range(7)), "val", docvalues=dv),
               s.range_field_docs(0, 100, "intersects", docvalues=dv),
               s.field_exists_docs("dl")):
        assert not set(victims) & set(r["id"] for r in df.collect())


def test_predicates_push_to_docvalues_scan(spark, dv_index, tmp_path):
    # the predicate must reach the docvalues parquet scan as PushedFilters
    # (IsNotNull / In / range) — the BKD/DocValues-iterator prune role
    s, pdf = dv_index
    _, vals = _dv(spark, pdf)
    p = str(tmp_path / "dv.parquet")
    spark.createDataFrame(vals).write.parquet(p)
    dv = spark.read.parquet(p)
    plan = (s.point_in_set_docs([1.0, 3.0], "val", docvalues=dv)
            ._jdf.queryExecution().executedPlan().toString())
    assert "In(val" in plan
    plan2 = (s.range_field_docs(20, 40, "within", docvalues=dv)
             ._jdf.queryExecution().executedPlan().toString())
    # the PushedFilters list is printed truncated; the DataFilters form
    # of both bounds is the same pushdown evidence
    assert "GreaterThanOrEqual(range_min,20)" in plan2
    assert "<= 40)" in plan2 and "(range_max" in plan2

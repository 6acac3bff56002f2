"""DiversifiedTopDocsCollector / DistinctValuesCollector roles
(demos lucene/collector/DiversityCollector.java,
lucene/grouping/DistinctValueCollectorTest.java) vs pandas replicas."""

import numpy as np
import pandas as pd

from lucene_7_x_9_x_spark.functions.facets import (distinct_values,
                                                   diversified_topk)


def _scored(spark, n=120, seed=5):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame({
        "segment": rng.randint(0, 3, n).astype(np.int32),
        "docid": np.arange(n, dtype=np.int64),
        "score": rng.choice([1.0, 2.0, 3.0, 4.0], n)  # deliberate ties
        .astype(np.float64),
        "artist": rng.choice(list("abcde"), n),
        "weeks": rng.randint(1, 5, n)})
    return spark.createDataFrame(pdf), pdf


def test_diversified_topk_caps_per_key(spark):
    df, pdf = _scored(spark)
    scored = df.select("segment", "docid", "score")
    meta = df.select("segment", "docid", "artist")
    got = diversified_topk(scored, meta, ["segment", "docid"],
                           "artist", 10, max_per_key=2).toPandas()
    # replica: per-key rank by (score desc, segment, docid), cap 2,
    # global top-10 same order
    r = pdf.sort_values(["score", "segment", "docid"],
                        ascending=[False, True, True]).copy()
    r["kr"] = r.groupby("artist").cumcount() + 1
    want = r[r.kr <= 2].head(10)
    assert got.docid.tolist() == want.docid.tolist()
    assert got["rank"].tolist() == list(range(1, 11))
    assert got.groupby("key").size().max() <= 2


def test_diversified_cap_one_distinct_keys(spark):
    df, pdf = _scored(spark, seed=6)
    got = diversified_topk(df.select("segment", "docid", "score"),
                           df.select("segment", "docid", "artist"),
                           ["segment", "docid"], "artist", 5,
                           max_per_key=1).toPandas()
    assert got.key.is_unique and len(got) == 5


def test_distinct_values_collector(spark):
    df, pdf = _scored(spark, seed=7)
    matches = df.select("segment", "docid").where(df.docid % 2 == 0)
    attrs = df.select("segment", "docid", "artist", "weeks")
    got = distinct_values(matches, attrs, "artist", "weeks").toPandas()
    sub = pdf[pdf.docid % 2 == 0]
    want = (sub.groupby("artist")["weeks"]
            .agg(lambda s: sorted(set(s))).sort_index())
    assert got.grp.tolist() == list(want.index)
    assert [list(v) for v in got["values"]] == [list(v) for v in want]
    assert got.n_distinct.tolist() == [len(v) for v in want]

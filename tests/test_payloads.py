"""Payload stream + payload scoring.

References (behavior, not code):
  solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
    payloads/DelimitedPayloadTokenFilter.java (FloatEncoder) — token
    "term|3.5" -> term + float payload.
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/codecs/lucene84/
    Lucene84PostingsFormat.java:99-104 — the .pay stream.
  solr-8.4.0/lucene/queries/src/java/org/apache/lucene/queries/payloads/
    PayloadScoreQuery.java + Sum/Max/Min/AveragePayloadFunction.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import (AnalyzerConfig,
                                                     split_payloads)

PAY_CFG = AnalyzerConfig(token_regex=r"[^ ]+", payload_delim="|")

DOCS = ["apple|3 pear|1 apple|2",
        "pear|5 plum",
        "apple|4",
        "plum|2 plum|0.5 apple",
        "nothing here"]


def _pandas_oracle(term, fn):
    """Per-doc payload aggregate computed independently (float32 sum in
    token order, like the engine and the reference)."""
    out = {}
    for i, d in enumerate(DOCS):
        pays = []
        for tok in d.split(" "):
            parts = tok.split("|", 1)
            if parts[0] != term:
                continue
            try:
                pays.append(np.float32(parts[1]) if len(parts) > 1
                            else np.float32(0.0))
            except ValueError:
                pays.append(np.float32(0.0))
        if not pays:
            continue
        a = np.array(pays, dtype=np.float32)
        out[i] = {"sum": np.add.reduce(a), "max": a.max(), "min": a.min(),
                  "avg": np.float32(np.add.reduce(a) / np.float32(len(a)))
                  }[fn]
    return out


def test_split_payloads():
    terms, pay = split_payloads(
        np.array(["apple|3", "pear", "plum|0.5", "bad|x", "a|1|2"],
                 dtype=object), "|")
    assert terms.tolist() == ["apple", "pear", "plum", "bad", "a"]
    assert pay.tolist() == pytest.approx([3.0, 0.0, 0.5, 0.0, 0.0])
    assert pay.dtype == np.float32


def test_invert_payload_stream():
    from lucene_7_x_9_x_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"id": list(range(len(DOCS))), "content": DOCS})
    post, dm = invert_segment(pdf, segment=0, id_cols=["id"],
                              text_col="content", cfg=PAY_CFG)
    row = post[post.term == "apple"].iloc[0]
    # df=3 postings (docs 0, 2, 3), payload bytes 4 per occurrence
    assert row["doc_freq"] == 3
    offs = np.asarray(row["pay_offsets"], np.int64)
    assert offs.tolist() == [0, 8, 12, 16]   # tf 2, 1, 1
    vals = np.frombuffer(bytes(row["pay_data"]), dtype="<f4")
    assert vals.tolist() == [3.0, 2.0, 4.0, 0.0]
    # dl counts every token (payload split happens after tokenize)
    assert dm["dl"].tolist() == [3, 2, 1, 3, 2]


def test_payload_rejects_incompatible_chain():
    from lucene_7_x_9_x_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"id": [0], "content": ["a|1"]})
    with pytest.raises(ValueError):
        invert_segment(pdf, segment=0, id_cols=["id"], text_col="content",
                       cfg=AnalyzerConfig(token_regex=r"[^ ]+",
                                          payload_delim="|",
                                          stemmer="porter"))
    with pytest.raises(ValueError):
        invert_segment(pdf, segment=0, id_cols=["id"], text_col="content",
                       cfg=PAY_CFG, with_offsets=True)


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    out = str(tmp_path_factory.mktemp("pay") / "idx")
    pdf = pd.DataFrame({"doc_id": list(range(len(DOCS))), "text": DOCS})
    df = spark.createDataFrame(pdf).repartition(2, "doc_id")
    return build_index(spark, df, out, id_cols=["doc_id"],
                       text_col="text", segment_by="input",
                       analyzer=PAY_CFG)


def test_payload_score_functions(spark, pidx):
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(pidx)
    for fn in ("sum", "max", "min", "avg"):
        want = _pandas_oracle("apple", fn)
        got = {r["doc_id"]: r["score"]
               for r in s.payload_score("apple", fn, k=10).collect()}
        assert got == pytest.approx(want), fn
        # rank order (score desc, doc tie) holds
        rows = s.payload_score("apple", fn, k=10).collect()
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # term with a fractional payload
    got = {r["doc_id"]: r["score"]
           for r in s.payload_score("plum", "sum", k=10).collect()}
    assert got == pytest.approx(_pandas_oracle("plum", "sum"))


def test_payload_survives_merge(spark, pidx, tmp_path):
    from lucene_7_x_9_x_spark.operators.merge import merge_index
    from lucene_7_x_9_x_spark.index import IndexSnapshot
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path / "merged")
    merge_index(spark, pidx, out, target_segments=1)
    s = Searcher(IndexSnapshot(spark, out))
    want = _pandas_oracle("apple", "sum")
    got = {r["doc_id"]: r["score"]
           for r in s.payload_score("apple", "sum", k=10).collect()}
    assert got == pytest.approx(want)


def test_payload_survives_compaction(spark, pidx, tmp_path):
    # regression: compact_index's slice-carry loop must include the
    # (pay_offsets, pay_data) pair like merge/resort do — a payload index
    # with tombstones previously produced ragged kernel output (NaN in an
    # array column) and the compaction job failed
    import shutil

    from pyspark.sql import functions as F

    from lucene_7_x_9_x_spark.index import IndexSnapshot, check_index
    from lucene_7_x_9_x_spark.operators.deletes import (compact_index,
                                                        delete_by_ids)
    from lucene_7_x_9_x_spark.searcher import Searcher
    work = str(tmp_path / "w")
    shutil.copytree(pidx.root, work)
    delete_by_ids(spark, work,
                  spark.createDataFrame(pd.DataFrame({"doc_id": [1, 3]})))
    compacted = compact_index(spark, IndexSnapshot(spark, work),
                              str(tmp_path / "c"))
    assert check_index(spark, compacted)["clean"]
    s = Searcher(compacted)
    got = {r["doc_id"]: r["score"]
           for r in s.payload_score("apple", "sum", k=10).collect()}
    want = {i: v for i, v in _pandas_oracle("apple", "sum").items()
            if i not in (1, 3)}
    # compaction renumbers docids but doc_id stored cols survive via docmap
    assert got == pytest.approx(want)


def test_payload_requires_payload_index(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "b c"]})
    idx = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "plain"), id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    with pytest.raises(ValueError):
        Searcher(idx).payload_score("a")


def test_check_index_payload_invariant(spark, pidx):
    from lucene_7_x_9_x_spark.index import check_index
    out = check_index(spark, pidx)
    assert out.get("payloads_match") is True
    assert all(v for v in out.values() if isinstance(v, bool))

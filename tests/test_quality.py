"""TREC-style quality micro-gate (VERDICT r4 #9): a small judged fixture
(queries + relevance labels, the TrecJudge model) scored with P@10 /
recall / MRR — the engine's ranking must produce EXACTLY the oracle
ranking's quality numbers, and both must clear sane floors on this
curated fixture."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.quality import (precision_at_k,
                                                    quality_run,
                                                    reciprocal_rank)
from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery

# judged micro-collection: 14 docs, 4 topics. Relevance was judged by
# hand against the TOPIC of each doc (not by term matching, so lexical
# rankers can and do make judged mistakes — d13 mentions shuffle but is
# about monitoring).
DOCS = [
    ("d00", "spark shuffle moves rows between executors during joins"),
    ("d01", "the shuffle service spills sorted runs to local disk"),
    ("d02", "skewed shuffle partitions slow whole stages badly"),
    ("d03", "broadcast joins avoid the shuffle for small tables"),
    ("d04", "parquet row groups carry min max column statistics"),
    ("d05", "predicate pushdown prunes parquet row groups early"),
    ("d06", "columnar parquet scans decode only projected columns"),
    ("d07", "streaming watermarks bound late event arrival windows"),
    ("d08", "stateful streaming sessions aggregate user events"),
    ("d09", "checkpoint recovery replays streaming offsets safely"),
    ("d10", "inverted index postings map terms to documents"),
    ("d11", "bm25 ranks documents by term frequency saturation"),
    ("d12", "a cluster monitoring guide for memory dashboards"),
    ("d13", "monitoring dashboards sometimes chart shuffle bytes"),
]

QUERIES = {
    "t1": BooleanQuery([(Occur.SHOULD, TermQuery("shuffle")),
                        (Occur.SHOULD, TermQuery("partitions"))]),
    "t2": BooleanQuery([(Occur.SHOULD, TermQuery("parquet")),
                        (Occur.SHOULD, TermQuery("pushdown"))]),
    "t3": BooleanQuery([(Occur.SHOULD, TermQuery("streaming")),
                        (Occur.SHOULD, TermQuery("watermarks"))]),
    "t4": BooleanQuery([(Occur.SHOULD, TermQuery("bm25")),
                        (Occur.SHOULD, TermQuery("postings"))]),
}

JUDGMENTS = {
    "t1": {"d00", "d01", "d02", "d03"},
    "t2": {"d04", "d05", "d06"},
    "t3": {"d07", "d08", "d09"},
    "t4": {"d10", "d11"},
}


def test_metric_primitives():
    assert precision_at_k(["a", "b", "c"], {"a", "c"}, 2) == 0.5
    assert precision_at_k(["a"], {"a"}, 10) == 0.1  # short list = misses
    assert reciprocal_rank(["x", "y", "a"], {"a"}) == pytest.approx(1 / 3)
    assert reciprocal_rank(["x"], {"a"}) == 0.0


@pytest.fixture(scope="module")
def qidx(spark):
    import shutil
    import tempfile
    from lucene_7_x_9_x_spark.index import build_index
    d = tempfile.mkdtemp(prefix="lucene_quality_idx_")
    docs = spark.createDataFrame(DOCS, "id string, content string")
    idx = build_index(spark, docs, d, id_cols=["id"],
                      text_col="content", num_segments=2)
    yield idx
    shutil.rmtree(d, ignore_errors=True)


def test_engine_quality_equals_oracle_quality(spark, qidx):
    from lucene_7_x_9_x_spark import oracle
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(qidx)
    pdf = pd.DataFrame([{"id": i, "content": c} for i, c in sorted(DOCS)])
    eng = oracle.OracleEngine(*oracle.index_corpus(pdf, text_col="content"))
    ids = pdf["id"].tolist()

    runs_spark, runs_oracle = {}, {}
    for qid, q in QUERIES.items():
        got = s.search(q, 10, with_ids=True).toPandas()
        runs_spark[qid] = got.sort_values("rank")["id"].tolist()
        o = eng.search(q, 10)
        runs_oracle[qid] = [ids[int(d)] for d in o.docid]

    qs = quality_run(runs_spark, JUDGMENTS, k=10)
    qo = quality_run(runs_oracle, JUDGMENTS, k=10)
    # the gate: identical judged quality, query by query
    assert qs == qo
    # and sane absolute numbers on the curated fixture: every topic's
    # first hit is relevant, and recall@10 is total (all relevant docs
    # surface within ten)
    assert qs["mrr"] == 1.0
    assert qs["recall_at_k"] == 1.0
    assert 0.2 <= qs["p_at_k"] <= 1.0

"""Benchmark decontamination + duplicate-span flagging.

Semantics checked against a plain-Python n-gram oracle on a crafted
corpus; the scale contract (bench n-grams broadcast, corpus side never
shuffled for the join) is asserted on the physical plan.
"""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline.decontam import (contaminated_docs,
                                                    duplicate_spans)

DOCS = [
    # bench doc 0 contains "alpha beta gamma delta" as a 4-gram
    (0, "alpha beta gamma delta epsilon zeta"),
    # shares the 4-gram "alpha beta gamma delta" with bench doc 0
    (1, "intro alpha beta gamma delta outro"),
    # shares "gamma delta epsilon zeta" with bench doc 0
    (2, "gamma delta epsilon zeta closing words here"),
    # no 4-gram overlap (only a 3-token run in common)
    (3, "alpha beta gamma unrelated tail words"),
    # too short for any 4-gram
    (4, "tiny doc"),
    # duplicate-span partner for doc 6
    (5, "one two three four five six seven eight nine ten"),
    (6, "zero one two three four five six seven eight closing"),
]


def _py_ngrams(text, n):
    toks = [t for t in
            __import__("re").split(r"[^a-z0-9_]+", text.lower()) if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_contaminated_docs_matches_python_oracle(docs):
    bench = docs.where(F.col("doc_id") == 0)
    train = docs.where(F.col("doc_id") != 0)
    got = {r.doc_id: (r.n_overlap_ngrams, r.n_bench_docs)
           for r in contaminated_docs(train, bench, "doc_id", "text",
                                      "doc_id", "text", n=4).collect()}
    bench_ngrams = _py_ngrams(DOCS[0][1], 4)
    want = {}
    for did, text in DOCS[1:]:
        overlap = _py_ngrams(text, 4) & bench_ngrams
        if overlap:
            want[did] = (len(overlap), 1)
    assert want == got
    assert set(got) == {1, 2}  # crafted: exactly these two contaminated


def test_contaminated_docs_bench_side_broadcasts(docs):
    bench = docs.where(F.col("doc_id") == 0)
    train = docs.where(F.col("doc_id") != 0)
    plan = contaminated_docs(
        train, bench, "doc_id", "text", "doc_id", "text",
        n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the fallback shape stays available for a huge bench set
    plan_nb = contaminated_docs(
        train, bench, "doc_id", "text", "doc_id", "text",
        n=4, broadcast_bench=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_nb.split("AdaptiveSparkPlan")[0] \
        or "SortMergeJoin" in plan_nb or "ShuffledHashJoin" in plan_nb


def test_duplicate_spans_counts(docs):
    got = {r.doc_id: (r.n_windows, r.n_dup_windows)
           for r in duplicate_spans(docs, "doc_id", "text",
                                    n=8, min_docs=2).collect()}
    # per-doc window counts: len(toks) - 8 + 1 where len >= 8
    # docs 5/6 share the 8-gram "one two three four five six seven
    # eight" (positions differ — dedup is by span TEXT)
    assert got[5] == (3, 1)
    assert got[6] == (3, 1)
    # doc 4 (2 tokens) has no windows and no row
    assert 4 not in got
    # docs 0-3 have <8 tokens except... 0 has 6 tokens -> absent
    assert 0 not in got
    for d in (1, 2, 3):
        if d in got:
            assert got[d][1] == 0  # no cross-doc 8-gram dupes


def test_duplicate_spans_internal_repeat_counts_each_window(spark):
    # a doc repeating a span internally: each positional window counts,
    # and min_docs counts DISTINCT docs (internal repeats don't qualify)
    df = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h"),
         (2, "a b c d e f g h x y z w q r s t")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows)
           for r in duplicate_spans(df, "doc_id", "text",
                                    n=8, min_docs=2).collect()}
    # doc 1: 9 windows, those equal to "a b c d e f g h" (pos 0 and 8)
    # are shared with doc 2 -> 2 dup windows
    assert got[1] == (9, 2)
    assert got[2] == (9, 1)


def test_duplicate_span_ranges_merges_islands(spark):
    from lucene_7_x_9_x_spark.pipeline.decontam import duplicate_span_ranges
    # doc 1: the shared 8-gram appears at pos 0 and pos 8 -> windows
    # [0,8) and [8,16) are ADJACENT (pos 8 == prev end) and merge into
    # one [0,16) range; doc 2's single shared window is [0,8)
    df = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h"),
         (2, "a b c d e f g h x y z w q r s t"),
         (3, "p q r s t u v w x y z zz yy xx ww vv")],
        "doc_id long, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end) for r in
                 duplicate_span_ranges(df, "doc_id", "text",
                                       n=8, min_docs=2).collect())
    assert got == [(1, 0, 16), (2, 0, 8)]


def test_duplicate_span_ranges_brute_force(spark):
    from lucene_7_x_9_x_spark.pipeline.decontam import duplicate_span_ranges
    import random
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(12)]
    n, min_docs = 4, 2
    # python reference: flag windows whose text occurs in >= min_docs
    # docs, merge overlapping/adjacent [p, p+n) intervals per doc
    toks = {d: t.split() for d, t in docs}
    span_docs: dict = {}
    for d, ts in toks.items():
        for p in range(len(ts) - n + 1):
            span_docs.setdefault(" ".join(ts[p:p + n]), set()).add(d)
    want = []
    for d, ts in toks.items():
        flagged = [p for p in range(len(ts) - n + 1)
                   if len(span_docs[" ".join(ts[p:p + n])]) >= min_docs]
        cur = None
        for p in flagged:
            if cur and p <= cur[1]:
                cur[1] = max(cur[1], p + n)
            else:
                if cur:
                    want.append((d, cur[0], cur[1]))
                cur = [p, p + n]
        if cur:
            want.append((d, cur[0], cur[1]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end) for r in
                 duplicate_span_ranges(df, "doc_id", "text",
                                       n=n, min_docs=min_docs).collect())
    assert got == sorted(want)

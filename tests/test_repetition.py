"""Gopher-style repetition filters (Rae et al. 2021 A1.1): duplicate
lines and top/duplicate bigram coverage against hand-computed fixtures,
plus a Python brute-force parity sweep and the no-shuffle plan shape."""

import pytest

from lucene_7_x_9_x_spark.pipeline.textstats import repetition_stats


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = repetition_stats(df, "doc_id", "text").toPandas()
    return {int(r.doc_id): r for r in out.itertuples()}


def _brute(text):
    import re
    from collections import Counter
    lines = [l for l in text.split("\n") if l != ""]
    lc = Counter(lines)
    toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
    grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    gc = Counter(grams)
    return dict(
        n_lines=len(lines),
        n_dup_lines=len(lines) - len(lc),
        dup_line_chars=sum(len(l) * (c - 1) for l, c in lc.items()),
        total_line_chars=sum(len(l) for l in lines),
        top_bigram_chars=max([(len(g) - 1) * c for g, c in gc.items()],
                             default=0),
        dup_bigram_chars=sum((len(g) - 1) * c for g, c in gc.items()
                             if c > 1),
        n_token_chars=sum(len(t) for t in toks))


def test_hand_computed_fixture(spark):
    # 4 lines: "aa bb" x2 (dup), "cc", "aa bb cc"
    text = "aa bb\ncc\naa bb\naa bb cc"
    r = _rows(spark, [text])[0]
    assert r.n_lines == 4
    assert r.n_dup_lines == 1            # one excess occurrence
    assert r.dup_line_chars == 5         # "aa bb" once beyond first
    assert r.total_line_chars == 5 + 2 + 5 + 8
    # bigrams: "aa bb" x3 (chars 4*3=12), "bb cc" x2 (4*2=8),
    # "bb aa" x1, "cc aa" x1
    assert r.top_bigram_chars == 12
    assert r.dup_bigram_chars == 20
    assert r.n_token_chars == 16         # 8 tokens x 2 chars


def test_edge_cases(spark):
    rows = _rows(spark, ["", "one", "x\n\nx", "a b a b a"])
    assert rows[0].n_lines == 0 and rows[0].top_bigram_chars == 0
    assert rows[0].dup_line_chars == 0 and rows[0].n_token_chars == 0
    assert rows[1].n_lines == 1 and rows[1].n_dup_lines == 0
    assert rows[1].top_bigram_chars == 0      # single token, no bigram
    assert rows[2].n_lines == 2 and rows[2].n_dup_lines == 1
    # "a b" x2, "b a" x2 -> top (3-1)*2 = 4, dup = 4 + 4
    assert rows[3].top_bigram_chars == 4
    assert rows[3].dup_bigram_chars == 8


def test_brute_force_parity(spark):
    texts = [
        "the cat sat\nthe cat sat\non the mat",
        "x y z " * 20,
        "unique line one\nunique line two\nshared\nshared\nshared",
        "a\n" * 5 + "b",
        "mixed CASE Tokens mixed case tokens",
    ]
    rows = _rows(spark, texts)
    for i, t in enumerate(texts):
        want = _brute(t)
        got = rows[i]
        for k, v in want.items():
            assert getattr(got, k) == v, (i, k, v, getattr(got, k))


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b\nc")], "doc_id long, text string")
    plan = repetition_stats(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # scan-stage only, no shuffle

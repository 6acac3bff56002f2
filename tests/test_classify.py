"""Classification module (SimpleNaiveBayesClassifier /
KNearestNeighborClassifier semantics) vs a hand-computed reference."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.functions.classify import naive_bayes_classify

LABELED = [
    (0, "spam", "buy cheap pills now buy"),
    (1, "spam", "cheap pills cheap deals"),
    (2, "spam", "win money now"),
    (3, "ham", "meeting notes for the project"),
    (4, "ham", "project deadline next week meeting"),
    (5, "ham", "lunch plans for the week"),
]
TEST = [
    (100, "cheap pills win"),
    (101, "project meeting notes"),
    (102, "the week deals"),
]


def _py_nb(labeled, tests):
    from collections import Counter, defaultdict
    cstats = Counter(c for _, c, _ in labeled)
    n = sum(cstats.values())
    pairs = set()
    dfc = defaultdict(int)
    for did, c, text in labeled:
        for w in set(text.split()):
            pairs.add((did, w))
            dfc[(w, c)] += 1
    avg_unique = len(pairs) / n
    dens = {c: avg_unique * cstats[c] + n for c in cstats}
    out = {}
    for did, text in tests:
        best = None
        for c in sorted(cstats):
            s = math.log(cstats[c]) - math.log(n)
            for w in text.split():  # every instance, repeats included
                s += math.log((dfc.get((w, c), 0) + 1) / dens[c])
            if best is None or s > best[0] + 1e-12:
                best = (s, c)
        out[did] = best[1]
    return out


def test_naive_bayes_matches_reference_math(spark):
    lab = spark.createDataFrame(LABELED,
                                "doc_id long, cls string, text string")
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {r.doc_id: r.label for r in
           naive_bayes_classify(lab, te, "doc_id", "text",
                                "cls").collect()}
    assert got == _py_nb(LABELED, TEST)
    # sanity on the crafted corpus: the obvious assignments hold
    assert got[100] == "spam"
    assert got[101] == "ham"


def test_naive_bayes_repeated_tokens_count_each_instance(spark):
    # "buy buy buy" must weigh buy three times (java:203-219 loops over
    # every token instance) — drives the doc decisively to spam
    lab = spark.createDataFrame(LABELED,
                                "doc_id long, cls string, text string")
    te = spark.createDataFrame([(200, "buy buy buy meeting")],
                               "doc_id long, text string")
    got = {r.doc_id: r.label for r in
           naive_bayes_classify(lab, te, "doc_id", "text",
                                "cls").collect()}
    assert got[200] == _py_nb(LABELED, [(200, "buy buy buy meeting")])[200]


def test_knn_classify_votes(spark, tmp_path):
    from lucene_7_x_9_x_spark.functions.classify import knn_classify
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(i, c, t) for i, c, t in LABELED] * 2 +
        [(10 + i, c, t) for i, c, t in LABELED],
        "doc_id long, cls string, text string").dropDuplicates(["doc_id"])
    build_index(spark, docs, str(tmp_path / "idx"), id_cols=["doc_id"],
                text_col="text")
    s = Searcher(IndexSnapshot(spark, str(tmp_path / "idx")))
    got = knn_classify(s, "cheap pills cheap money now buy buy",
                       docs, "doc_id", "cls", k=5,
                       min_doc_freq=1).toPandas()
    # empty result (not a crash) when MLT finds nothing
    empty = knn_classify(s, "zzz qqq zzz", docs, "doc_id", "cls", k=5)
    assert empty.count() == 0
    assert got.label.iloc[0] == "spam"
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert int(got.n_votes.sum()) <= 5


def test_knn_classify_fuzzy(spark, tmp_path):
    from lucene_7_x_9_x_spark.functions.classify import knn_classify_fuzzy
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "spam", "cheap pills deals now"),
         (1, "spam", "cheap deals cheap pills"),
         (2, "ham", "project meeting notes"),
         (3, "ham", "meeting plans project notes")],
        "doc_id long, cls string, text string")
    build_index(spark, docs, str(tmp_path / "fz"), id_cols=["doc_id"],
                text_col="text")
    s = Searcher(IndexSnapshot(spark, str(tmp_path / "fz")))
    # typos within 1 edit, first two chars exact: chaep->X (ch==ch,
    # but chaep vs cheap = transposition ae->ea, OSA 1), pills exact,
    # deels->deals (substitution)
    got = knn_classify_fuzzy(s, "chaep pills deels", docs, "doc_id",
                             "cls", k=4).toPandas()
    assert got.label.iloc[0] == "spam"
    # no analyzable terms -> empty, no crash
    assert knn_classify_fuzzy(s, "", docs, "doc_id", "cls").count() == 0


def test_bm25nb_matches_oracle_engine(spark, tmp_path):
    # BM25NB: same formula computed from the OracleEngine's (bit-exact
    # float32) top-1 scores must reproduce the engine's result exactly
    import math

    import pandas as pd

    from lucene_7_x_9_x_spark import oracle
    from lucene_7_x_9_x_spark.functions.classify import bm25nb_classify
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                                  TermQuery)
    from lucene_7_x_9_x_spark.searcher import Searcher
    rows = [(0, "spam", "buy cheap pills now buy"),
            (1, "spam", "cheap pills cheap deals"),
            (2, "spam", "win money now"),
            (3, "ham", "meeting notes for the project"),
            (4, "ham", "project deadline next week meeting"),
            (5, "ham", "lunch plans for the week")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, cls string, text string")
    build_index(spark, docs, str(tmp_path / "bm25nb"),
                id_cols=["doc_id"], text_col="text",
                extra_fields=[("cls", "cls")])
    s = Searcher(IndexSnapshot(spark, str(tmp_path / "bm25nb")))
    text = "cheap pills win cheap"
    got = bm25nb_classify(s, text, "cls", ["spam", "ham"])

    pdf = pd.DataFrame(rows, columns=["doc_id", "cls", "text"])
    eng = oracle.OracleEngine(*oracle.index_corpus(
        pdf, text_col="text", extra_fields=[("cls", "cls")]))

    def top1(q):
        r = eng.search(q, 1)
        return float(r.score.iloc[0]) if len(r) else None

    toks = text.split()
    want = {}
    for c in ("spam", "ham"):
        prior = top1(BooleanQuery(
            [(Occur.MUST, TermQuery(c, field="cls"))]))
        sc = math.log(prior) if prior and prior > 0 else 0.0
        for w in toks:
            p = top1(BooleanQuery(
                [(Occur.MUST, TermQuery(c, field="cls")),
                 (Occur.SHOULD, TermQuery(w))]))
            p = p if p is not None else 1.0
            sc += math.log(p if p > 0 else 1.0)
        want[c] = sc
    smax = max(want.values())
    loga = smax + math.log(sum(math.exp(v - smax)
                               for v in want.values()))
    want = {c: math.exp(v - loga) for c, v in want.items()}
    assert got == want
    assert got["spam"] > got["ham"]
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_perceptron_learns_separable_classes(spark):
    from lucene_7_x_9_x_spark.functions.classify import (perceptron_assign,
                                                         perceptron_train)
    spam_words = ["cheap", "pills", "deals", "win", "money"]
    ham_words = ["meeting", "notes", "project", "deadline", "lunch"]
    rows = []
    for i in range(80):  # interleaved: every id range holds both classes
        if i % 2 == 0:
            ws = [spam_words[(i + j) % 5] for j in range(4)]
            rows.append((i, "spam", " ".join(ws)))
        else:
            ws = [ham_words[(i + j) % 5] for j in range(4)]
            rows.append((i, "ham", " ".join(ws)))
    df = spark.createDataFrame(rows,
                               "doc_id long, cls string, text string")
    w, b = perceptron_train(df, "doc_id", "text", "cls", "spam",
                            epochs=5, n_partitions=4)
    te = spark.createDataFrame(
        [(100, "cheap money deals pills"), (101, "project lunch notes"),
         (102, "win pills cheap"), (103, "meeting deadline project")],
        "doc_id long, text string")
    got = {r.doc_id: bool(r.assigned) for r in
           perceptron_assign(spark, w, b, te, "doc_id",
                             "text").collect()}
    assert got == {100: True, 101: False, 102: True, 103: False}
    # determinism: identical rerun -> identical weights
    w2, b2 = perceptron_train(df, "doc_id", "text", "cls", "spam",
                              epochs=5, n_partitions=4)
    assert w == w2 and b == b2
    # score shape: 1 - exp(-|bias-out|/bias), in [0, 1)
    sc = perceptron_assign(spark, w, b, te, "doc_id", "text").toPandas()
    assert ((sc.score >= 0) & (sc.score < 1)).all()

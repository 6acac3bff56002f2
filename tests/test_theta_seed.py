"""Driver-seeded global competitive threshold (the MaxScoreAccumulator
completion): the floor computed from index-time impact pairs must be a
TRUE lower bound on the k-th best score (achieved by k distinct docs),
results must be identical with and without seeding, and ineligible
shapes (MUST_NOT/FILTER/msm>1/deletes) must not seed."""

import os

import pytest

import lucene_7_x_9_x_spark.plans.query as Q
from lucene_7_x_9_x_spark.operators.search import classify_blockmax
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery,
                                              DisjunctionMaxQuery, Occur,
                                              TermQuery)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("seed_idx"))
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(8, "doc_id"))
    idx = build_index(spark, docs, out, id_cols=["doc_id"],
                      text_col="text", segment_by="input")
    return Searcher(idx)


QUERIES = [
    TermQuery("filter"),
    BooleanQuery([(Occur.SHOULD, TermQuery("filter")),
                  (Occur.SHOULD, TermQuery("join")),
                  (Occur.SHOULD, TermQuery("window"))]),
    BooleanQuery([(Occur.SHOULD, TermQuery("group")),
                  (Occur.SHOULD, TermQuery("query"))]),
    DisjunctionMaxQuery([TermQuery("group"), TermQuery("query")], 0.3),
    BooleanQuery([(Occur.MUST, TermQuery("filter"))]),
]


def _seed_for(s, q, k=10):
    from lucene_7_x_9_x_spark.searcher import _filter_terms
    rq = s.rewrite(q)
    stats = s._global_stats(Q.scoring_terms(rq) | _filter_terms(rq))
    plan = classify_blockmax(rq)
    assert plan is not None
    return s._seed_theta(plan, stats, k)


def test_seed_is_a_true_lower_bound_and_results_identical(searcher):
    for q in QUERIES:
        seed = _seed_for(searcher, q)
        got = searcher.search(q, 10).toPandas()
        kth = float(got.score.iloc[-1])
        assert seed <= kth + 1e-12, (q, seed, kth)
        # exhaustive mode never prunes: rank identity proves exactness
        want = searcher.search(q, 10, mode="complete").toPandas()
        assert got.doc_id.tolist() == want.doc_id.tolist(), q
        assert got.score.tolist() == want.score.tolist(), q


def test_single_term_seed_is_exactly_kth(searcher):
    # for a single term every impact pair is an achieved score, so the
    # floor equals the true k-th best exactly
    seed = _seed_for(searcher, TermQuery("filter"))
    got = searcher.search(TermQuery("filter"), 10).toPandas()
    assert seed == pytest.approx(float(got.score.iloc[-1]), abs=0)


def test_ineligible_shapes_do_not_seed(searcher):
    # MUST_NOT excludes docs -> the achievedness argument breaks
    q = BooleanQuery([(Occur.SHOULD, TermQuery("filter")),
                      (Occur.MUST_NOT, TermQuery("window"))])
    assert _seed_for(searcher, q) == 0.0
    # two MUSTs: a doc achieving one term's impact may not match the other
    q2 = BooleanQuery([(Occur.MUST, TermQuery("group")),
                       (Occur.MUST, TermQuery("query"))])
    assert _seed_for(searcher, q2) == 0.0
    # msm=2 disjunction: single-term docs aren't results
    q3 = BooleanQuery([(Occur.SHOULD, TermQuery("group")),
                       (Occur.SHOULD, TermQuery("query")),
                       (Occur.SHOULD, TermQuery("window"))],
                      minimum_should_match=2)
    assert _seed_for(searcher, q3) == 0.0

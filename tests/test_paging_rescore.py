"""searchAfter paging + QueryRescorer parity with the oracle
(IndexSearcher.java:388-422, QueryRescorer.java)."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur, TermQuery)
from tests.test_search import _oracle_in_engine_order, _random_corpus


@pytest.fixture(scope="module")
def paged_index(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    rng = np.random.RandomState(11)
    pdf = _random_corpus(rng, n_docs=400)
    out = str(tmp_path_factory.mktemp("pidx"))
    idx = build_index(spark, spark.createDataFrame(pdf), out,
                      id_cols=["id"], text_col="content", num_segments=3)
    return pdf, idx


def test_search_after_pages_through_results(spark, paged_index):
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf, idx = paged_index
    s = Searcher(idx)
    q = BooleanQuery([(Occur.SHOULD, TermQuery("h0")),
                      (Occur.SHOULD, TermQuery("h1"))])
    full = s.search(q, 30).toPandas()
    page1 = s.search(q, 10).toPandas()
    last = page1.iloc[-1]
    page2 = s.search(q, 10, after=(float(last.score), int(last.segment),
                                   int(last.docid))).toPandas()
    assert page1.id.tolist() == full.id.iloc[:10].tolist()
    assert page2.id.tolist() == full.id.iloc[10:20].tolist()
    assert np.array_equal(page2.score.to_numpy(np.float32),
                          full.score.iloc[10:20].to_numpy(np.float32))


def test_rescore_combines_scores(spark, paged_index):
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf, idx = paged_index
    eng, ordered = _oracle_in_engine_order(pdf, idx)
    s = Searcher(idx)
    q1 = TermQuery("h0")
    q2 = TermQuery("h1")
    first = s.search(q1, 20, with_ids=False)
    res = s.rescore(first, q2, weight=2.0, k=20).toPandas()
    # oracle: same combination over the oracle's top-20 of q1
    o1 = eng.search(q1, 20)
    m2 = eng.matches(q2)
    combined = []
    for r in o1.itertuples():
        pos = np.searchsorted(m2.docids, r.docid)
        add = (m2.scores[pos]
               if pos < len(m2.docids) and m2.docids[pos] == r.docid
               else np.float32(0))
        combined.append(np.float32(
            np.float64(np.float32(r.score))
            + np.float64(np.float32(2.0) * add)))
    order = np.lexsort((o1.docid.to_numpy(), -np.array(combined,
                                                       dtype=np.float64)))
    want_scores = np.array(combined, dtype=np.float32)[order]
    assert np.array_equal(res.score.to_numpy(np.float32), want_scores)

"""Float32 formula checks for the round-3 similarity models (LMJelinekMercer,
DFR I(n)L2, Boolean) against hand-transcribed double-math references, plus
dispatch sanity for all six models."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.functions.smallfloat import LENGTH_TABLE
from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery

F32 = np.float32

DOCS = [["q", "x", "e", "q"], ["q", "e"], ["e", "z", "z"], ["x"] * 30]


def _eng(sim):
    return oracle.OracleEngine(*oracle.index_token_lists(DOCS,
                                                         similarity=sim))


def test_lmjelinekmercer_formula():
    eng = _eng("lmjelinekmercer")
    m = eng.matches(TermQuery("q"))
    st = eng.stats
    lam = 0.1
    p_c = (st.total_term_freqs["q"] + 1.0) / (st.sum_total_term_freq + 1.0)
    for docid, tf in [(0, 2), (1, 1)]:
        dl = float(LENGTH_TABLE[int(eng.reader.norms()[docid])])
        want = F32(1.0 * np.log(1.0 + ((1 - lam) * tf / dl) / (lam * p_c)))
        got = m.scores[list(m.docids).index(docid)]
        assert F32(got) == want


def test_dfr_inl2_formula():
    eng = _eng("dfr_inl2")
    m = eng.matches(TermQuery("q"))
    st = eng.stats
    df, n = st.doc_freqs["q"], st.doc_count
    avgdl = st.sum_total_term_freq / float(n)
    for docid, tf in [(0, 2), (1, 1)]:
        dl = float(LENGTH_TABLE[int(eng.reader.norms()[docid])])
        tfn = tf * np.log2(1.0 + avgdl / dl)
        want = F32((tfn / (1.0 + tfn)) * np.log2((n + 1.0) / (df + 0.5)))
        got = m.scores[list(m.docids).index(docid)]
        assert F32(got) == want


def test_dfi_chisquared_formula():
    eng = _eng("dfi_chisquared")
    m = eng.matches(TermQuery("q"))
    st = eng.stats
    ttf = st.total_term_freqs["q"]
    got = dict(zip(m.docids.tolist(), [F32(x) for x in m.scores]))
    for docid, tf in [(0, 2), (1, 1)]:
        dl = float(LENGTH_TABLE[int(eng.reader.norms()[docid])])
        expected = (ttf + 1.0) * dl / (st.sum_total_term_freq + 1.0)
        want = (F32(np.log2((tf - expected) ** 2 / expected + 1.0))
                if tf > expected else F32(0.0))
        assert got[docid] == want


def test_ib_ll_formula():
    eng = _eng("ib_ll")
    m = eng.matches(TermQuery("q"))
    st = eng.stats
    df, n = st.doc_freqs["q"], st.doc_count
    lam = float(F32((df + 1.0) / (n + 1.0)))
    avgdl = st.sum_total_term_freq / float(n)
    for docid, tf in [(0, 2), (1, 1)]:
        dl = float(LENGTH_TABLE[int(eng.reader.norms()[docid])])
        tfn = tf * np.log2(1.0 + avgdl / dl)
        want = F32(-np.log(lam / (tfn + lam)))
        got = m.scores[list(m.docids).index(docid)]
        assert F32(got) == want


def test_ib_lambda_one_is_nexted_down():
    # every doc contains the term -> lambda rounds to exactly 1f and must
    # be nextDown'ed (LambdaDF.java:34-37); score stays finite positive
    eng = oracle.OracleEngine(*oracle.index_token_lists(
        [["q"], ["q", "q"], ["q", "x"]], similarity="ib_ll"))
    m = eng.matches(TermQuery("q"))
    assert len(m.docids) == 3
    assert np.all(np.isfinite(m.scores)) and np.all(m.scores > 0)


def test_axiomatic_f2exp_formula():
    eng = _eng("axiomatic_f2exp")
    m = eng.matches(TermQuery("q"))
    st = eng.stats
    df, n = st.doc_freqs["q"], st.doc_count
    avgdl = st.sum_total_term_freq / float(n)
    s_, k_ = float(F32(0.25)), float(F32(0.35))
    for docid, tf in [(0, 2), (1, 1)]:
        dl = float(LENGTH_TABLE[int(eng.reader.norms()[docid])])
        want = F32((tf / (tf + s_ + s_ * dl / avgdl))
                   * ((n + 1.0) / df) ** k_)
        got = m.scores[list(m.docids).index(docid)]
        assert F32(got) == want


def test_boolean_similarity_scores_boost():
    eng = _eng("boolean")
    m = eng.matches(BooleanQuery([(Occur.SHOULD, TermQuery("q", boost=2.5)),
                                  (Occur.SHOULD, TermQuery("e"))]))
    got = dict(zip(m.docids.tolist(), [F32(x) for x in m.scores]))
    # doc 0/1 match both clauses: 2.5 + 1.0; doc 2 matches only e
    assert got[0] == F32(3.5) and got[1] == F32(3.5)
    assert got[2] == F32(1.0)


def test_all_models_dispatch():
    for sim in ("bm25", "classic", "boolean", "lmdirichlet",
                "lmjelinekmercer", "dfr_inl2", "ib_ll", "axiomatic_f2exp",
                "dfi_chisquared"):
        eng = _eng(sim)
        assert len(eng.search(TermQuery("q"), 2)) == 2, sim
    with pytest.raises(ValueError):
        _eng("nope")

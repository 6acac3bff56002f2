"""ClassicSimilarity (TF-IDF) float32 parity with the reference formulas
(ClassicSimilarity.java:39-63, TFIDFSimilarity.java:519-560)."""

import numpy as np

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.functions.similarities import ClassicSimilarity
from lucene_7_x_9_x_spark.functions.smallfloat import (LENGTH_TABLE,
                                                       int_to_byte4)
from lucene_7_x_9_x_spark.plans.query import TermQuery

F32 = np.float32


def test_norm_table_matches_reference_definition():
    sim = ClassicSimilarity()
    for i in (1, 7, 40, 255):
        want = F32(1.0 / np.sqrt(float(LENGTH_TABLE[i])))
        assert sim.norm_table[i] == want
    assert sim.norm_table[0] == F32(1.0) / sim.norm_table[255]


def test_score_formula_float32():
    sim = ClassicSimilarity()
    # idf = (float)(log((docCount+1)/(df+1)) + 1)
    assert sim.idf(3, 10) == F32(np.log(11 / 4.0) + 1.0)
    w = sim.idf(3, 10)
    freqs = np.array([4], dtype=np.int64)
    nb = int_to_byte4(np.array([25]))  # dl=25 quantizes via byte4
    got = sim.score(freqs, nb, w)[0]
    want = (F32(np.sqrt(4.0)) * w) * sim.norm_table[int(nb[0])]
    assert got == F32(want)


def test_lmdirichlet_formula_float32():
    import numpy as np
    from lucene_7_x_9_x_spark.functions.similarities import \
        LMDirichletSimilarity
    sim = LMDirichletSimilarity(mu=2000.0)
    nb = int_to_byte4(np.array([30]))
    dl = float(LENGTH_TABLE[int(nb[0])])
    ttf, sum_ttf, f = 7, 1000, 3
    want = F32(1.0 * (np.log(1.0 + f / (2000.0 * (ttf + 1.0)
                                        / (sum_ttf + 1.0)))
                      + np.log(2000.0 / (dl + 2000.0))))
    got = sim.score(np.array([f]), nb, ttf, sum_ttf, F32(1.0))[0]
    assert got == want
    # negative raw scores clip to 0 (huge collection probability)
    got0 = sim.score(np.array([1]), nb, 10**9, 10**9, F32(1.0))[0]
    assert got0 == F32(0.0)


def test_lmdirichlet_engine_matches_reference_math():
    import numpy as np
    from lucene_7_x_9_x_spark.functions.similarities import \
        LMDirichletSimilarity
    docs = [["q", "q", "x"], ["q", "y", "y", "y"], ["z"]]
    r, s = oracle.index_token_lists(docs, similarity="lmdirichlet")
    res = oracle.OracleEngine(r, s).matches(TermQuery("q"))
    sim = LMDirichletSimilarity()
    nb = int_to_byte4(np.array([3, 4, 1]))
    for docid, tf in [(0, 2), (1, 1)]:
        want = sim.score(np.array([tf]), nb[docid:docid + 1],
                         ttf=3, sum_ttf=8, boost=F32(1.0))[0]
        got = res.scores[list(res.docids).index(docid)]
        assert F32(got) == want


def test_similarity_kernel_decode_parity_with_oracle():
    """The encoded-postings reader path (block decode, norms blob) produces
    bit-identical float32 scores to the in-memory oracle under every
    similarity, over a random corpus and mixed query shapes."""
    import numpy as np
    from lucene_7_x_9_x_spark.operators import executor as ex
    from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                                  PhraseQuery, SynonymQuery,
                                                  rewrite)
    from tests.test_search import _build_kernel_side, _random_corpus
    rng = np.random.RandomState(77)
    pdf = _random_corpus(rng, n_docs=400)
    reader, _, _ = _build_kernel_side(pdf)
    sorted_pdf = pdf.sort_values("id").reset_index(drop=True)
    queries = [
        TermQuery("h0"),
        BooleanQuery([(Occur.SHOULD, TermQuery("h1", boost=2.0)),
                      (Occur.SHOULD, TermQuery("h2")),
                      (Occur.MUST_NOT, TermQuery("h3"))]),
        BooleanQuery([(Occur.MUST, TermQuery("h0")),
                      (Occur.MUST, TermQuery("h4"))]),
        SynonymQuery(["h1", "h5"]),
        PhraseQuery(["h0", "h1"], slop=1),
    ]
    for sim in ("classic", "lmdirichlet", "bm25"):
        oreader, ostats = oracle.index_corpus(sorted_pdf,
                                              text_col="content",
                                              similarity=sim)
        for q in queries:
            a = ex.evaluate(reader, ostats, rewrite(q))
            b = ex.evaluate(oreader, ostats, rewrite(q))
            assert np.array_equal(a.docids, b.docids), (sim, q)
            assert np.array_equal(a.scores, b.scores), (sim, q)


def test_classic_engine_ranking_differs_from_bm25_but_scores_pin():
    docs = [["t"] * 3 + ["pad"] * 5, ["t"] + ["pad"] * 1]
    r_bm, s_bm = oracle.index_token_lists(docs)
    r_cl, s_cl = oracle.index_token_lists(docs, similarity="classic")
    bm = oracle.OracleEngine(r_bm, s_bm).search(TermQuery("t"), 2)
    cl = oracle.OracleEngine(r_cl, s_cl).search(TermQuery("t"), 2)
    sim = ClassicSimilarity()
    nb = int_to_byte4(np.array([8, 2]))
    for docid, tf in [(0, 3), (1, 1)]:
        w = sim.idf(2, 2)
        want = sim.score(np.array([tf]), nb[docid:docid + 1], w)[0]
        got = cl[cl.docid == docid].score.iloc[0]
        assert F32(got) == want
    # both engines still return both docs
    assert sorted(bm.docid) == sorted(cl.docid) == [0, 1]

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

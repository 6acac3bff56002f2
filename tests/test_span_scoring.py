"""SpanNearQuery scoring (SpanScorer sloppyFreq accumulation).

The vectorized enumeration in operators/executor.py must reproduce, doc by
doc and bit for bit, straight Python transcriptions of the reference walks:
  - NearSpansOrdered (solr-8.4.0/.../spans/NearSpansOrdered.java:60-121):
    one stretchToOrder chain per first-term occurrence, forward-only
    sub-iterators, width = sum of gaps, stop when one sub-span exhausts.
  - NearSpansUnordered (NearSpansUnordered.java:110-166): advance the
    min-start span one step at a time, check atMatch at every state,
    width = maxEnd - minStart.
  - SpanScorer.setFreqCurrentDoc (SpanScorer.java:83-121):
    freq = float32(freq + 1.0/(1.0 + width)) per enumerated match.
"""

import random

import numpy as np
import pytest

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.functions import bm25
from lucene_7_x_9_x_spark.operators.executor import (
    _span_near_freqs, _span_near_unordered_freqs)
from lucene_7_x_9_x_spark.plans.query import SpanNearQuery

F32 = np.float32


def _ref_ordered_freq(lists, slop):
    """NearSpansOrdered + SpanScorer transcription for one doc.
    lists[i] = ascending positions of sub-span i (unit-length spans)."""
    k = len(lists)
    idx = [-1] * k
    freq = np.float32(0.0)
    while True:
        idx[0] += 1
        if idx[0] >= len(lists[0]):
            break
        prev_end = lists[0][idx[0]] + 1
        width = 0
        exhausted = False
        for i in range(1, k):
            while idx[i] < len(lists[i]) and (
                    idx[i] < 0 or lists[i][idx[i]] < prev_end):
                idx[i] += 1
            if idx[i] >= len(lists[i]):
                exhausted = True
                break
            width += lists[i][idx[i]] - prev_end
            prev_end = lists[i][idx[i]] + 1
        if exhausted:
            break
        if width <= slop:
            freq = np.float32(np.float64(freq) + 1.0 / (1.0 + width))
    return freq


def _ref_unordered_freq(lists, slop):
    """NearSpansUnordered + SpanScorer transcription for one doc."""
    import heapq
    k = len(lists)
    idx = [0] * k
    heap = [(int(lists[i][0]), int(lists[i][0]) + 1, i) for i in range(k)]
    heapq.heapify(heap)
    total_len = k
    max_end = max(h[1] for h in heap)
    freq = np.float32(0.0)
    while True:
        lo = heap[0][0]
        if (max_end - lo - total_len) <= slop:
            freq = np.float32(np.float64(freq)
                              + 1.0 / (1.0 + (max_end - lo)))
        _, _, i = heap[0]
        idx[i] += 1
        if idx[i] >= len(lists[i]):
            break
        p = int(lists[i][idx[i]])
        max_end = max(max_end, p + 1)
        heapq.heapreplace(heap, (p, p + 1, i))
    return freq


def _positions(doc_tokens, term):
    return [i for i, t in enumerate(doc_tokens) if t == term]


@pytest.mark.parametrize("in_order", [True, False])
@pytest.mark.parametrize("k", [2, 3])
def test_span_freqs_match_reference_walk(in_order, k):
    rng = random.Random(1000 + k + in_order)
    vocab = ["a", "b", "c", "d"]
    terms = vocab[:k]
    for trial in range(120):
        docs = [[rng.choice(vocab) for _ in range(rng.randint(1, 30))]
                for _ in range(rng.randint(1, 8))]
        slop = rng.randint(0, 5)
        reader, _ = oracle.index_token_lists(docs)
        q = SpanNearQuery(tuple(terms), slop=slop, in_order=in_order)
        got_d, got_f = (_span_near_freqs(reader, q) if in_order
                        else _span_near_unordered_freqs(reader, q))
        ref = _ref_ordered_freq if in_order else _ref_unordered_freq
        want = {}
        for docid, toks in enumerate(docs):
            lists = [_positions(toks, t) for t in terms]
            if any(len(x) == 0 for x in lists):
                continue
            f = ref(lists, slop)
            if f > 0:
                want[docid] = f
        got = dict(zip(got_d.tolist(), got_f.tolist()))
        assert set(got) == set(want), (trial, docs, slop)
        for d in want:
            assert F32(got[d]) == want[d], (trial, docs, slop, d)


def test_ordered_duplicate_terms_walk_parity():
    # repeated term in an ordered span: two sub-iterators over the SAME
    # positions list, forward-only — e.g. "a b a" matching (a, a)
    rng = random.Random(7)
    for trial in range(80):
        docs = [[rng.choice(["a", "b"]) for _ in range(rng.randint(2, 20))]
                for _ in range(rng.randint(1, 5))]
        slop = rng.randint(0, 4)
        reader, _ = oracle.index_token_lists(docs)
        got_d, got_f = _span_near_freqs(
            reader, SpanNearQuery(("a", "a"), slop=slop))
        want = {}
        for docid, toks in enumerate(docs):
            pos = _positions(toks, "a")
            if not pos:
                continue
            f = _ref_ordered_freq([pos, pos], slop)
            if f > 0:
                want[docid] = f
        got = dict(zip(got_d.tolist(), got_f.tolist()))
        assert set(got) == set(want), (trial, docs, slop)
        for d in want:
            assert F32(got[d]) == want[d]


def test_span_score_is_bm25_of_sloppy_freq():
    # doc 0: "a x b" -> ordered (a,b) slop>=1 matches once, width=1,
    # freq=1/2; score must be the BM25 of that fractional freq with
    # weight = boost * f32(sum of member idfs) (SpanWeight.buildSimWeight)
    docs = [["a", "x", "b"], ["a", "b", "q"], ["q", "z"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    m = eng.matches(SpanNearQuery(("a", "b"), slop=1))
    st = eng.stats
    idf_sum = F32(float(np.float64(F32(bm25.idf(st.doc_freqs["a"], st.doc_count)))
                        + np.float64(F32(bm25.idf(st.doc_freqs["b"],
                                                  st.doc_count)))))
    got = dict(zip(m.docids.tolist(), m.scores.tolist()))
    for docid, freq in [(0, F32(0.5)), (1, F32(1.0))]:
        want = bm25.score_term(np.array([freq], np.float32),
                               eng.reader.norms()[docid:docid + 1],
                               F32(1.0) * idf_sum, st.cache)[0]
        assert F32(got[docid]) == F32(want)
    assert 2 not in got


def test_span_score_multisim_lm():
    # SimilarityBase models go through MultiSimScorer: f32-summed per-term
    # scores at the same (freq, norm) (MultiSimilarity.java)
    docs = [["a", "x", "b"], ["a", "b", "q"], ["q", "z"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(
        docs, similarity="lmdirichlet"))
    m = eng.matches(SpanNearQuery(("a", "b"), slop=1))
    st = eng.stats
    got = dict(zip(m.docids.tolist(), m.scores.tolist()))
    for docid, freq in [(0, F32(0.5)), (1, F32(1.0))]:
        acc = np.float32(0.0)
        for t in ("a", "b"):
            acc = acc + st.pseudo_score(
                st.doc_freqs[t], st.total_term_freqs[t], F32(1.0),
                np.array([freq], np.float32),
                eng.reader.norms()[docid:docid + 1])[0]
        assert F32(got[docid]) == F32(acc)


def test_span_or_freq_and_score():
    from lucene_7_x_9_x_spark.plans.query import SpanOrQuery
    docs = [["a", "b", "a"], ["b"], ["q"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    m = eng.matches(SpanOrQuery(("a", "b")))
    st = eng.stats
    got = dict(zip(m.docids.tolist(), m.scores.tolist()))
    assert set(got) == {0, 1}
    idf_sum = F32(float(
        np.float64(F32(bm25.idf(st.doc_freqs["a"], st.doc_count)))
        + np.float64(F32(bm25.idf(st.doc_freqs["b"], st.doc_count)))))
    for docid, freq in [(0, F32(3.0)), (1, F32(1.0))]:
        want = bm25.score_term(np.array([freq], np.float32),
                               eng.reader.norms()[docid:docid + 1],
                               F32(1.0) * idf_sum, st.cache)[0]
        assert F32(got[docid]) == F32(want)


def test_span_first_freq_and_match_set():
    from lucene_7_x_9_x_spark.plans.query import SpanFirstQuery
    docs = [["a", "x", "a", "a"], ["x", "x", "x", "a"], ["x"]]
    eng = oracle.OracleEngine(*oracle.index_token_lists(docs))
    # end=3: spans must END at <= 3 -> positions 0,1,2 qualify
    m = eng.matches(SpanFirstQuery("a", 3))
    st = eng.stats
    got = dict(zip(m.docids.tolist(), m.scores.tolist()))
    assert set(got) == {0}  # doc1's only 'a' is at position 3
    idf = F32(bm25.idf(st.doc_freqs["a"], st.doc_count))
    want = bm25.score_term(np.array([2.0], np.float32),
                           eng.reader.norms()[0:1],
                           F32(1.0) * idf, st.cache)[0]
    assert F32(got[0]) == F32(want)

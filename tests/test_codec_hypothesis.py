"""Hypothesis property tests for the block codec — the randomized-roundtrip
model of the reference's TestForUtil/TestPForUtil
(solr-8.4.0/lucene/core/src/test/org/apache/lucene/codecs/lucene84/)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_7_x_9_x_spark.functions import codec


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=128))
def test_block_roundtrip_any_values(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.decode_block(codec.encode_block(v), len(v)),
                          v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=0, max_size=300))
def test_vint_roundtrip_any_values(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.vint_decode(codec.vint_encode(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**7),
               min_size=1, max_size=600))
def test_doc_blocks_roundtrip_any_docids(docset):
    docids = np.array(sorted(docset), dtype=np.int64)
    blocks, ns, max_docs = codec.encode_doc_blocks(docids)
    out, base = [], -1
    for b, n, md in zip(blocks, ns, max_docs):
        out.append(codec.decode_doc_block(b, n, base))
        base = md
    assert np.array_equal(np.concatenate(out), docids)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 10**6), st.integers(0, 255)),
                min_size=1, max_size=128))
def test_frontier_always_bounds(pairs):
    from lucene_7_x_9_x_spark.functions import bm25
    f = np.array([p[0] for p in pairs], dtype=np.int64)
    n = np.array([p[1] for p in pairs], dtype=np.int64)
    ff, nn = codec.impacts_frontier(f, n)
    cache = bm25.norm_inverse_cache(1.2, 0.75, np.float32(30.0))
    w = np.float32(1.7)
    full = bm25.score_term(f, n, w, cache).max()
    front = bm25.score_term(ff, nn, w, cache).max()
    assert front >= full  # frontier never under-estimates (pruning safety)

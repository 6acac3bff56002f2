"""Roundtrip tests for the posting-block codec — the model of the
reference's TestForUtil/TestPForUtil/TestForDeltaUtil
(solr-8.4.0/lucene/core/src/test/org/apache/lucene/codecs/lucene84/TestForUtil.java:34)."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions import codec

rng = np.random.RandomState(42)


@pytest.mark.parametrize("vals", [
    np.array([0]), np.array([1, 2, 3]),
    np.zeros(128, dtype=np.int64),
    np.full(128, 7),
    np.arange(128),
    rng.randint(0, 2, 128),
    rng.randint(0, 2**7, 128),
    rng.randint(0, 2**16, 128),
    rng.randint(0, 2**31, 128),
    np.concatenate([rng.randint(0, 4, 125), [2**20, 2**25, 2**30]]),  # pfor
])
def test_block_roundtrip(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    enc = codec.encode_block(vals)
    dec = codec.decode_block(enc, len(vals))
    assert np.array_equal(dec, vals)


def test_pfor_smaller_than_for_on_skewed():
    vals = np.concatenate([rng.randint(0, 4, 125),
                           [2**20, 2**25, 2**30]]).astype(np.uint64)
    enc = codec.encode_block(vals, allow_pfor=True)
    plain = codec.encode_block(vals, allow_pfor=False)
    assert len(enc) < len(plain)
    assert np.array_equal(codec.decode_block(enc, len(vals)), vals)


def test_all_equal_block_is_tiny():
    vals = np.full(128, 1, dtype=np.uint64)  # dense docid run
    enc = codec.encode_block(vals)
    assert len(enc) <= 3  # ForDeltaUtil all-ones block collapses


def test_vint_roundtrip():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**31 - 1, 2**40],
                    dtype=np.uint64)
    assert np.array_equal(codec.vint_decode(codec.vint_encode(vals)), vals)
    for _ in range(20):
        v = rng.randint(0, 2**31, rng.randint(1, 400)).astype(np.uint64)
        assert np.array_equal(codec.vint_decode(codec.vint_encode(v)), v)


def test_doc_blocks_roundtrip_random():
    for _ in range(25):
        n = rng.randint(1, 1000)
        docids = np.sort(rng.choice(np.arange(0, 100000), size=n,
                                    replace=False)).astype(np.int64)
        blocks, ns, max_docs = codec.encode_doc_blocks(docids)
        assert max_docs[-1] == docids[-1]
        out, base = [], -1
        for b, bn, md in zip(blocks, ns, max_docs):
            dec = codec.decode_doc_block(b, bn, base)
            out.append(dec)
            base = md
        assert np.array_equal(np.concatenate(out), docids)


def test_freq_blocks_roundtrip():
    freqs = rng.randint(1, 500, 300).astype(np.int64)
    blocks = codec.encode_freq_blocks(freqs)
    out = []
    for i, b in enumerate(blocks):
        n = min(128, len(freqs) - i * 128)
        out.append(codec.decode_freq_block(b, n))
    assert np.array_equal(np.concatenate(out), freqs)


def test_positions_roundtrip():
    pos = np.sort(rng.choice(np.arange(0, 5000), 40, replace=False))
    assert np.array_equal(codec.decode_positions(codec.encode_positions(pos)),
                          pos)
    assert np.array_equal(codec.decode_positions(codec.encode_positions(
        np.array([0]))), np.array([0]))


def test_impacts_frontier_pareto():
    freqs = np.array([1, 5, 2, 5, 9, 3])
    norms = np.array([10, 10, 3, 200, 200, 3])
    ff, nn = codec.impacts_frontier(freqs, norms)
    # distinct norms 3,10,200 -> max freqs 3,5,9 -> all strictly increasing
    assert np.array_equal(nn, [3, 10, 200])
    assert np.array_equal(ff, [3, 5, 9])
    # dominated pair dropped: norm 10 max freq 2 would be dominated by (3,3)
    ff2, nn2 = codec.impacts_frontier(np.array([3, 2]), np.array([3, 10]))
    assert np.array_equal(nn2, [3])
    assert np.array_equal(ff2, [3])


def test_impacts_frontier_bounds_scores():
    """Frontier must preserve the max achievable BM25 score (the MaxScoreCache
    guarantee, solr-8.4.0/.../search/MaxScoreCache.java:61-68)."""
    from lucene_7_x_9_x_spark.functions import bm25
    cache = bm25.norm_inverse_cache(1.2, 0.75, np.float32(25.0))
    w = np.float32(2.2)
    for _ in range(20):
        freqs = rng.randint(1, 50, 64)
        norms = rng.randint(0, 256, 64)
        full = bm25.score_term(freqs, norms, w, cache).max()
        ff, nn = codec.impacts_frontier(freqs, norms)
        front = bm25.score_term(ff, nn, w, cache).max()
        assert front == full

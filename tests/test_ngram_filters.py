"""EdgeNGramTokenFilter / NGramTokenFilter chain stages
(solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
ngram/EdgeNGramTokenFilter.java, NGramTokenFilter.java): posIncr-0 gram
injection over the primary token stream, source-token offsets, unigram-only
dl, chain-combination guards."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import (
    AnalyzerConfig, tokenize_to_flat, tokenize_to_flat_with_offsets)


def _stream(content, cfg):
    r, p, f, dl = tokenize_to_flat(pd.Series(content), cfg)
    return list(zip(r.tolist(), p.tolist(), f.tolist())), dl.tolist()


def test_edge_ngrams_prefixes_at_source_position():
    st, dl = _stream(["hash document ab a"],
                     AnalyzerConfig(edge_ngrams=(2, 4)))
    # full token always primary; grams 2..min(4, len-1); 'ab' (len 2) and
    # 'a' (len 1) emit no grams (the len-length gram would duplicate)
    assert st == [(0, 0, "hash"), (0, 0, "ha"), (0, 0, "has"),
                  (0, 1, "document"), (0, 1, "do"), (0, 1, "doc"),
                  (0, 1, "docu"), (0, 2, "ab"), (0, 3, "a")]
    assert dl == [4]  # unigrams only (discountOverlaps)


def test_ngrams_every_offset_with_duplicates():
    st, dl = _stream(["hash aaaa abc"], AnalyzerConfig(ngrams=(3, 3)))
    # 'aaaa' emits 'aaa' twice (starts 0 and 1) — overlapping occurrences
    # are distinct posIncr-0 tokens; 'abc' (len 3) emits nothing extra
    assert st == [(0, 0, "hash"), (0, 0, "has"), (0, 0, "ash"),
                  (0, 1, "aaaa"), (0, 1, "aaa"), (0, 1, "aaa"),
                  (0, 2, "abc")]
    assert dl == [3]


def test_gram_offsets_keep_source_span():
    r, p, f, dl, s, e = tokenize_to_flat_with_offsets(
        pd.Series(["hash doc"]), AnalyzerConfig(edge_ngrams=(2, 3)))
    rows = list(zip(p.tolist(), f.tolist(), s.tolist(), e.tolist()))
    # post-4.4 filter behavior: grams carry the ORIGINAL token offsets
    assert rows == [(0, "hash", 0, 4), (0, "ha", 0, 4), (0, "has", 0, 4),
                    (1, "doc", 5, 8), (1, "do", 5, 8)]
    assert dl.tolist() == [2]


def test_gram_chain_guards():
    with pytest.raises(ValueError, match="cannot combine"):
        tokenize_to_flat(pd.Series(["x y"]),
                         AnalyzerConfig(edge_ngrams=(2, 3), shingles=(2,)))
    with pytest.raises(ValueError, match="cannot combine"):
        tokenize_to_flat(pd.Series(["x y"]), AnalyzerConfig(
            ngrams=(2, 2), synonyms=(("x", ("y",)),), synonyms_at="index"))


def test_grams_respect_stopword_holes_and_positions():
    cfg = AnalyzerConfig(edge_ngrams=(3, 3),
                         stopwords=frozenset({"the"}))
    st, dl = _stream(["the stream"], cfg)
    # stopword hole keeps position 0 empty; gram shares position 1
    assert st == [(0, 1, "stream"), (0, 1, "str")]
    assert dl == [1]


def test_manifest_roundtrip_of_gram_config(tmp_path):
    from lucene_7_x_9_x_spark.index import _analyzer_manifest
    cfg = AnalyzerConfig(edge_ngrams=(2, 4), ngrams=(3, 3))
    m = _analyzer_manifest(cfg)
    assert m["edge_ngrams"] == [2, 4] and m["ngrams"] == [3, 3]

"""FreeTextSuggester (stupid-backoff n-gram LM): model counts, trailing
separator upgrade, backoff discounting, higher-order dedup, prefix
completion — against hand-computed stupid-backoff scores
(FreeTextSuggester.java semantics; see functions/freetext.py header)."""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.functions.freetext import (build_freetext_model,
                                                     freetext_suggest)

CORPUS = [
    "big data big apple big data",
    "big data works",
    "big apple pie",
    "apple pie",
]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return build_freetext_model(df, "text", grams=3).cache()


def test_model_counts(model):
    got = {(r.n, r.gram): r.cnt for r in model.collect()}
    assert got[(1, "big")] == 5
    assert got[(2, "big data")] == 3
    assert got[(2, "big apple")] == 2
    assert got[(3, "big data big")] == 1
    assert got[(3, "data big apple")] == 1
    # windows never cross documents
    assert (2, "works big") not in got
    assert (2, "pie apple") not in got


def test_trailing_space_predicts_next_word(model):
    # "big " -> bigram completions of context (big,): data(3) > apple(2)
    got = [r.suggestion for r in
           freetext_suggest(model, "big ", num=5).collect()]
    assert got[:2] == ["data", "apple"]


def test_backoff_and_higher_order_dedup(model):
    # context "data big ": trigram model saw "data big apple" only;
    # bigram level (context "big") backs off 0.4x and is deduped of
    # "apple" (already predicted by the trigram level):
    #   tri: apple 1/1 = 1.0
    #   bi (x0.4): data 0.4*3/5 = 0.24 ; apple suppressed
    rows = freetext_suggest(model, "data big ", num=5).collect()
    got = [r.suggestion for r in rows]
    assert got[0] == "apple"
    assert got[1] == "data"
    assert got.count("apple") == 1


def test_prefix_completion_last_token(model):
    # no trailing space: the last token is a prefix to complete.
    # "big a" -> bigram level completes a->apple; unigram level backs
    # off (apple deduped, no other a-words beat it)
    got = [r.suggestion for r in
           freetext_suggest(model, "big a", num=5).collect()]
    assert got[0] == "apple"
    # bare prefix with no context: unigram completions of "p"
    got1 = [r.suggestion for r in
            freetext_suggest(model, "p", num=5).collect()]
    assert got1 == ["pie"]


def test_empty_key_ranks_unigrams(model):
    got = [r.suggestion for r in
           freetext_suggest(model, "", num=3).collect()]
    assert got[0] == "big"  # cnt 5 beats data(3)/apple(4)... by count
    # exact order: big(5), apple(4), data(3)
    assert got == ["big", "apple", "data"]


def test_unseen_context_falls_back(model):
    # trigram context "works big" never seen -> backoff to bigram
    # context "big" -> data first
    got = [r.suggestion for r in
           freetext_suggest(model, "works big ", num=3).collect()]
    assert got[0] == "data"

"""Sub-linear fuzzy/spell dictionary seek (operators/fuzzy.py) — the
FST-intersect-LevenshteinAutomata role: deletion-variant completeness,
seek == scan equivalence, and pruning evidence (a lookup reads a
dictionary slice, not the dictionary)."""

import itertools
import os

import numpy as np
import pytest

from lucene_7_x_9_x_spark.functions.editdist import (levenshtein_le,
                                                     osa_distance)
from lucene_7_x_9_x_spark.operators.fuzzy import (build_fuzzy_seek,
                                                  deletion_variants,
                                                  seek_candidates)
from lucene_7_x_9_x_spark.plans.query import FuzzyQuery, TermQuery


def test_deletion_variants():
    assert deletion_variants("abc", 1) == {"abc", "bc", "ac", "ab"}
    assert "" in deletion_variants("ab", 2)
    assert deletion_variants("a", 1) == {"a", ""}


def test_symmetric_delete_is_complete_brute_force():
    # every pair of short words within OSA distance <= 2 shares a common
    # deletion variant at depth <= 2 (the candidate-superset guarantee)
    words = ["cat", "cart", "tac", "act", "catt", "ca", "dog", "cog",
             "coat", "tact", "scat", "cast"]
    for a, b in itertools.combinations(words, 2):
        d = osa_distance(a, b)
        if d <= 2:
            assert deletion_variants(a, 2) & deletion_variants(b, 2), (a, b)


@pytest.fixture(scope="module")
def fidx(spark):
    import shutil
    import tempfile
    from lucene_7_x_9_x_spark.index import build_index
    d = tempfile.mkdtemp(prefix="lucene_fuzzy_idx_")
    vocab = ["filter", "filler", "fitter", "falter", "filers", "flier",
             "field", "filed", "fled", "belt", "bolt", "built", "salt",
             "query", "quern", "quarry"]
    rows = [(i, " ".join(vocab[(i + j) % len(vocab)] for j in range(5)))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(spark, docs, d, id_cols=["doc_id"],
                      text_col="text", num_segments=2)
    yield idx
    shutil.rmtree(d, ignore_errors=True)


def test_seek_equals_scan_and_prunes(spark, fidx):
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(fidx)
    all_terms = [r["term"] for r in fidx.terms().collect()]
    for probe, k in [("fitler", 1), ("filte", 1), ("quary", 2),
                     ("belt", 1), ("xyzzy", 1)]:
        cands = seek_candidates(fidx, probe, k)
        assert cands is not None
        # completeness: every true OSA match is in the candidate superset
        truth = sorted(t for t in all_terms if osa_distance(t, probe) <= k)
        assert set(truth) <= set(cands), (probe, truth, cands)
        # engine expansion == exact truth (verify step filters the rest)
        got = s._fuzzy_seek_terms(probe, k)
        assert got == truth, (probe, got, truth)
        # plain-Levenshtein mode verifies with the other metric
        got_l = s._fuzzy_seek_terms(probe, k, transpositions=False)
        assert got_l == sorted(t for t in all_terms
                               if levenshtein_le(t, probe, k))
    # pruning evidence: the seek reads a slice, not the dictionary
    cands = seek_candidates(fidx, "fitler", 1)
    assert len(cands) < len(all_terms) / 2
    # beyond the indexed depth the seek declines (callers fall back)
    assert seek_candidates(fidx, "fitler", 3) is None


def test_seek_build_is_idempotent(fidx):
    d1 = build_fuzzy_seek(fidx)
    meta = os.path.join(d1, "_fuzzy_meta.json")
    m1 = os.path.getmtime(meta)
    d2 = build_fuzzy_seek(fidx)
    assert d1 == d2 and os.path.getmtime(meta) == m1


def test_fuzzy_query_end_to_end(spark, fidx):
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(fidx)
    # 'fitler' at 1 OSA edit: 'filter' (transposition) and 'fitter'
    # (substitution) — the match set is the union of both terms' docs
    all_terms = [r["term"] for r in fidx.terms().collect()]
    truth_terms = [t for t in all_terms if osa_distance(t, "fitler") <= 1]
    assert "filter" in truth_terms  # the transposition-as-one-edit case
    m = s.search(FuzzyQuery("fitler", max_edits=1), 100).collect()
    want = set()
    for t in truth_terms:
        want |= {(r["segment"], r["docid"])
                 for r in s.search(TermQuery(t), 100).collect()}
    assert {(r["segment"], r["docid"]) for r in m} == want


def test_spell_correct_via_seek(spark, fidx):
    from lucene_7_x_9_x_spark.searcher import Searcher
    s = Searcher(fidx)
    out = s.spell_correct("fitler", num_sug=3, max_edits=2)
    # SuggestWordQueue order: score desc, then doc_freq desc, then term
    assert out and "filter" in {o["term"] for o in out}
    assert all(o["doc_freq"] > 0 for o in out)
    keys = [(-o["score"], -o["doc_freq"], o["term"]) for o in out]
    assert keys == sorted(keys)
    assert np.float32(out[0]["score"]) == np.float32(
        1.0 - 1 / min(len("fitler"), len(out[0]["term"])))

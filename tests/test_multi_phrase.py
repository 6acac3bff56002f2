"""MultiPhraseQuery (solr-8.4.0/lucene/core/src/java/org/apache/lucene/
search/MultiPhraseQuery.java): per-position term sets, slot postings =
positional union (UnionPostingsEnum), sim weight = stats of every
(slot, term) occurrence with df > 0."""

import numpy as np
import pytest

from lucene_7_x_9_x_spark import oracle
from lucene_7_x_9_x_spark.operators.executor import (_multi_phrase_match,
                                                     evaluate)
from lucene_7_x_9_x_spark.plans import query as Q

DOCS = [
    "the fast scan runs".split(),
    "a slow scan crawls".split(),
    "fast merge then slow scan".split(),
    "scan fast scan slow scan".split(),
    "nothing here".split(),
    "fast scan fast scan".split(),
]


def _brute_exact(docs, slots):
    out = {}
    for d, toks in enumerate(docs):
        tf = 0
        for i in range(len(toks) - len(slots) + 1):
            if all(toks[i + j] in slots[j] for j in range(len(slots))):
                tf += 1
        if tf:
            out[d] = tf
    return out


def test_multi_phrase_exact_matches_brute_force():
    reader, stats = oracle.index_token_lists(DOCS)
    for slots in [(("fast", "slow"), ("scan",)),
                  (("scan",), ("fast", "slow", "crawls")),
                  (("the", "a"), ("fast", "slow"), ("scan",))]:
        d, f = _multi_phrase_match(reader, Q.MultiPhraseQuery(slots))
        assert dict(zip(d.tolist(), f.tolist())) == \
            _brute_exact(DOCS, slots), slots


def test_multi_phrase_scores_scale_with_occurrence_idf():
    reader, stats = oracle.index_token_lists(DOCS)
    slots = (("fast", "slow"), ("scan",))
    m = evaluate(reader, stats, Q.MultiPhraseQuery(slots), 1.0, True)
    # same matcher tf as the PhraseQuery machinery; the weight is the
    # occurrence-idf sum — ratio to a single-alternative query on the
    # same doc set must equal the float32 idf-sum ratio
    base = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("fast",), ("scan",))), 1.0, True)
    tf_m = dict(zip(*[x.tolist() for x in _multi_phrase_match(
        reader, Q.MultiPhraseQuery(slots))]))
    tf_b = dict(zip(*[x.tolist() for x in _multi_phrase_match(
        reader, Q.MultiPhraseQuery((("fast",), ("scan",))))]))
    both = {d for d in set(tf_m) & set(tf_b) if tf_m[d] == tf_b[d]}
    assert both
    sm = dict(zip(m.docids.tolist(), m.scores.tolist()))
    sb = dict(zip(base.docids.tolist(), base.scores.tolist()))
    idf_fs = float(np.sum(np.array(
        [stats.idf(t) for t in ("fast", "slow", "scan")],
        dtype=np.float32).astype(np.float64)))
    idf_f = float(np.sum(np.array(
        [stats.idf(t) for t in ("fast", "scan")],
        dtype=np.float32).astype(np.float64)))
    for d in both:
        assert sm[d] / sb[d] == pytest.approx(idf_fs / idf_f, rel=1e-6)


def test_single_term_slots_equal_phrase_query():
    reader, stats = oracle.index_token_lists(DOCS)
    for slop in (0, 2):
        mp = evaluate(reader, stats, Q.MultiPhraseQuery(
            (("fast",), ("scan",)), slop=slop), 1.0, True)
        ph = evaluate(reader, stats, Q.PhraseQuery(
            ("fast", "scan"), slop=slop), 1.0, True)
        assert mp.docids.tolist() == ph.docids.tolist()
        assert mp.scores.tolist() == ph.scores.tolist()


def test_absent_alternative_skips_df0_stats():
    reader, stats = oracle.index_token_lists(DOCS)
    # 'zzz' is not in the index: the slot still matches via 'fast' and
    # the absent term contributes NO idf (MultiPhraseQuery.java:238-240)
    with_z = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("fast", "zzz"), ("scan",))), 1.0, True)
    without = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("fast",), ("scan",))), 1.0, True)
    assert with_z.docids.tolist() == without.docids.tolist()
    assert with_z.scores.tolist() == without.scores.tolist()


def test_repeated_term_across_slots_counts_idf_twice():
    reader, stats = oracle.index_token_lists(DOCS)
    m1 = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("scan",), ("fast",))), 1.0, True)
    m2 = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("scan", "fast"), ("fast", "scan"))), 1.0, True)
    # doc 3 'scan fast scan slow scan' matches both; the second query's
    # weight doubles (scan+fast counted in BOTH slots)
    s1 = dict(zip(m1.docids.tolist(), m1.scores.tolist()))
    s2 = dict(zip(m2.docids.tolist(), m2.scores.tolist()))
    assert 3 in s1 and 3 in s2


def test_partial_overlap_sloppy_guard():
    reader, stats = oracle.index_token_lists(DOCS)
    with pytest.raises(NotImplementedError):
        evaluate(reader, stats, Q.MultiPhraseQuery(
            (("fast", "slow"), ("fast",)), slop=1), 1.0, True)
    # exact (slop=0) overlapping slots are fine
    m = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("fast", "scan"), ("scan", "fast"))), 1.0, True)
    assert len(m.docids) > 0


def test_no_match_and_empty_slot():
    reader, stats = oracle.index_token_lists(DOCS)
    m = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("fast",), ("crawls",))), 1.0, True)
    assert len(m.docids) == 0
    m = evaluate(reader, stats, Q.MultiPhraseQuery(
        (("zzz", "qqq"), ("scan",))), 1.0, True)
    assert len(m.docids) == 0


def test_wildcard_phrase_rewrite_paths():
    # PhraseWildcardQuery role: dictionary-expanded phrase slots
    DICT = ["fast", "fat", "false", "scan", "slow"]

    def expand(w):
        lit = w.pattern.split("*")[0].split("?")[0]
        return [t for t in DICT if t.startswith(lit)]

    ctx = Q.RewriteContext(expand_terms=expand)
    q = Q.rewrite(Q.WildcardPhraseQuery(("fa*", "scan")), ctx)
    assert isinstance(q, Q.MultiPhraseQuery)
    assert q.term_arrays == (("false", "fast", "fat"), ("scan",))
    # single expansion degenerates to a plain PhraseQuery
    q = Q.rewrite(Q.WildcardPhraseQuery(("sc*", "fast")), ctx)
    assert isinstance(q, Q.PhraseQuery) and q.terms == ("scan", "fast")
    # empty expansion matches nothing
    assert isinstance(Q.rewrite(Q.WildcardPhraseQuery(("zz*", "scan")),
                                ctx), Q.MatchNoDocsQuery)
    # TooManyClauses-style budget
    with pytest.raises(ValueError, match="max_expansions"):
        Q.rewrite(Q.WildcardPhraseQuery(("fa*", "scan"),
                                        max_expansions=2), ctx)
    # no dictionary -> left unrewritten
    q = Q.WildcardPhraseQuery(("fa*", "scan"))
    assert Q.rewrite(q, Q.RewriteContext()) == q


def test_parser_complex_phrase():
    from lucene_7_x_9_x_spark.plans.parser import parse
    q = parse('"fa* scan"~2')
    assert isinstance(q, Q.WildcardPhraseQuery)
    assert q.patterns == ("fa*", "scan") and q.slop == 2
    assert isinstance(parse('"the fast"'), Q.PhraseQuery)
    assert isinstance(parse('"wild*"'), Q.WildcardQuery)

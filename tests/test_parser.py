"""Classic query-string parser: grammar/addClause semantics
(QueryParserBase.java:374-420) and fuzzy OSA distance."""

import pytest

from lucene_7_x_9_x_spark.plans import query as Q
from lucene_7_x_9_x_spark.plans.parser import QueryParseError, parse
from lucene_7_x_9_x_spark.searcher import _osa_distance


def clause_list(q):
    assert isinstance(q, Q.BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_default_or_plain_terms():
    q = parse("filter join")
    assert clause_list(q) == [(Q.Occur.SHOULD, Q.TermQuery("filter")),
                              (Q.Occur.SHOULD, Q.TermQuery("join"))]


def test_and_upgrades_previous():
    q = parse("group AND query OR window")
    assert clause_list(q) == [(Q.Occur.MUST, Q.TermQuery("group")),
                              (Q.Occur.MUST, Q.TermQuery("query")),
                              (Q.Occur.SHOULD, Q.TermQuery("window"))]


def test_modifiers_and_group():
    q = parse('filter AND (join OR "the fast") -window')
    cl = clause_list(q)
    assert cl[0] == (Q.Occur.MUST, Q.TermQuery("filter"))
    assert cl[1][0] == Q.Occur.MUST
    inner = clause_list(cl[1][1])
    assert inner == [(Q.Occur.SHOULD, Q.TermQuery("join")),
                     (Q.Occur.SHOULD, Q.PhraseQuery(["the", "fast"]))]
    assert cl[2] == (Q.Occur.MUST_NOT, Q.TermQuery("window"))


def test_and_not_prohibited_stays():
    # '-a AND b': AND must NOT upgrade the prohibited clause
    cl = clause_list(parse("-scan AND sort"))
    assert cl == [(Q.Occur.MUST_NOT, Q.TermQuery("scan")),
                  (Q.Occur.MUST, Q.TermQuery("sort"))]


def test_default_and_operator():
    cl = clause_list(parse("filter join OR window",
                           default_operator="AND"))
    assert cl == [(Q.Occur.MUST, Q.TermQuery("filter")),
                  (Q.Occur.SHOULD, Q.TermQuery("join")),
                  (Q.Occur.SHOULD, Q.TermQuery("window"))]


def test_phrase_slop_boost_fuzzy_wildcard_range():
    assert parse('"a b c"~2') == Q.PhraseQuery(["a", "b", "c"], slop=2)
    assert parse("filter^2") == Q.TermQuery("filter", boost=2.0)
    b = parse('(filter join)^3')
    assert isinstance(b, Q.BoostQuery) and b.boost == 3.0
    assert parse("roam~1") == Q.FuzzyQuery("roam", max_edits=1)
    assert parse("roam~") == Q.FuzzyQuery("roam", max_edits=2)
    assert parse("quer*") == Q.PrefixQuery("quer")
    assert parse("st*am") == Q.WildcardQuery("st*am")
    assert parse("[scan TO sort]") == Q.TermRangeQuery("scan", "sort")
    assert parse("{scan TO sort}") == Q.TermRangeQuery(
        "scan", "sort", include_lower=False, include_upper=False)


def test_single_should_unwraps_and_analyzer_drop():
    assert parse("Filter") == Q.TermQuery("filter")
    # pure punctuation analyzes away -> MatchNone
    assert parse('"..."') == Q.MatchNoDocsQuery()


def test_escapes():
    # escaped specials are literal characters (the analyzer strips them)
    assert parse(r"foo\*bar") == Q.PhraseQuery(["foo", "bar"])
    assert parse(r"st\*am") == Q.PhraseQuery(["st", "am"])
    assert parse(r"roam\~1") == Q.PhraseQuery(["roam", "1"])
    assert parse(r"qu\?ry") == Q.PhraseQuery(["qu", "ry"])
    # unescaped wildcard still a wildcard even next to escapes
    assert parse(r"st*am") == Q.WildcardQuery("st*am")
    assert parse(r"\-minus") == Q.TermQuery("minus")


def test_parse_errors():
    with pytest.raises(QueryParseError):
        parse("(a OR b")
    with pytest.raises(QueryParseError):
        parse("a)")
    with pytest.raises(QueryParseError):
        parse("-")


def test_osa_distance():
    assert _osa_distance("fitler", "filter") == 1  # transposition = 1 edit
    assert _osa_distance("roam", "foam") == 1
    assert _osa_distance("abc", "abc") == 0
    assert _osa_distance("ab", "") == 2
    assert _osa_distance("ca", "abc") == 3  # OSA (unrestricted DL gives 2)


def test_spell_correct_direct_spellchecker(spark):
    """DirectSpellChecker semantics: suggestions for a misspelling from
    the index's own dictionary; not_in_index mode returns [] for an
    indexed term; scores are 1 - d/min(len)."""
    import os
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    import tempfile
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    idx = build_index(spark, docs, tempfile.mkdtemp() + "/i",
                      id_cols=["doc_id"], text_col="text", num_segments=2)
    s = Searcher(idx)
    sug = s.spell_correct("fitler")
    assert sug and sug[0]["term"] == "filter"
    assert abs(sug[0]["score"] - (1 - 1 / 6)) < 1e-6  # one transposition
    # an indexed term gets no suggestions in the default mode...
    assert s.spell_correct("filter") == []
    # ...unless mode="always" (returns whatever near terms exist)
    always = s.spell_correct("filter", mode="always")
    assert all(x["term"] != "filter" for x in always)
    # a deletion-misspelling: 'fasst' -> 'fast' (d=1, score 0.75)
    sug2 = s.spell_correct("fasst")
    assert sug2 and sug2[0]["term"] == "fast"
    assert abs(sug2[0]["score"] - 0.75) < 1e-6


def test_word_breaks_and_combinations(spark, tmp_path_factory):
    # WordBreakSpellChecker: compounds split into dictionary words;
    # adjacent words combine into a dictionary compound
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("wb_idx"))
    texts = ["the database filter joins data", "base rate of the filter",
             "data and base and database again"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input")
    s = Searcher(idx)
    # 'database' IS indexed; 'filterjoins' is not -> split suggestions
    got = s.word_breaks("databasefilter")
    assert {(g["left"], g["right"]) for g in got} == {
        ("database", "filter")}
    # split of an indexed compound still reports its parts when asked
    got2 = s.word_breaks("database")
    assert got2 and got2[0]["left"] == "data" and got2[0]["right"] == "base"
    assert s.word_breaks("zzzzqqqq") == []
    # combinations: 'data base' -> 'database' (df 2)
    comb = s.combine_words(["data", "base", "rate"])
    assert comb and comb[0]["combined"] == "database"
    assert comb[0]["doc_freq"] == 2 and comb[0]["index"] == 0
    assert s.combine_words(["rate", "zz"]) == []


def test_common_terms_query(spark, tmp_path_factory):
    # CommonTermsQuery: high-df terms become optional scoring-only
    # clauses; low-df terms are the required selective clause
    import numpy as np
    from lucene_7_x_9_x_spark import oracle
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    from lucene_7_x_9_x_spark.plans.query import (BooleanQuery,
                                                  CommonTermsQuery, Occur)
    import pandas as pd
    texts = (["the common word everywhere"] * 20
             + ["the rareword appears", "rareword again the"])
    out = str(tmp_path_factory.mktemp("ctq_idx"))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input")
    s = Searcher(idx)
    q = CommonTermsQuery(("the", "rareword"), max_term_frequency=0.5,
                         low_freq_occur=Occur.MUST)
    rq = s.rewrite(q)
    # 'the' (df=22) is high-freq at cutoff 11; 'rareword' (df=2) low
    assert isinstance(rq, BooleanQuery)
    got = s.search(q, 10).toPandas()
    # only the rareword docs match (high clause can't match alone)
    assert set(got.doc_id) == {20, 21}
    # rank identity vs the oracle engine's identical rewrite
    eng = oracle.OracleEngine(*oracle.index_corpus(
        pd.DataFrame({"text": texts}), text_col="text"))
    want = eng.search(q, 10)
    assert [int(x) for x in got.doc_id] == [int(d) for d in want.docid]
    np.testing.assert_array_equal(got.score.to_numpy(np.float32),
                                  want.score.to_numpy(np.float32))
    # degenerate: all terms high-freq -> pure SHOULD query still matches
    q2 = CommonTermsQuery(("the", "common"), max_term_frequency=0.05)
    assert s.search(q2, 30).count() > 0


def test_suggest_infix(spark, tmp_path_factory):
    # AnalyzingInfixSuggester role: matches anywhere in the term, df
    # weighted, prefix matches first at equal weight
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("inf_idx"))
    texts = ["stream streaming restream", "stream downstream",
             "banner stream"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input")
    s = Searcher(idx)
    got = s.suggest_infix("stream", 10).toPandas()
    # weight desc ('stream' df=3), then prefix-first at equal weight
    # ('streaming'), then infix matches term asc
    assert list(got.term) == ["stream", "streaming", "downstream",
                              "restream"]
    assert int(got.weight.iloc[0]) == 3
    assert list(got["rank"]) == [1, 2, 3, 4]


def test_did_you_mean_collation(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("dym_idx"))
    texts = (["the database filter stream"] * 3
             + ["data base filter stream again"])
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input")
    s = Searcher(idx)
    # misspelling -> DirectSpellChecker correction
    assert s.did_you_mean("the fitler stream") == "the filter stream"
    # unknown compound -> word break
    assert s.did_you_mean("filterstream works") is not None
    assert "filter stream" in s.did_you_mean("filterstream stream")
    # adjacent words whose compound is MORE frequent -> combined
    got = s.did_you_mean("data base filter")
    assert got == "database filter"
    # clean query -> None
    assert s.did_you_mean("the database filter") is None


def test_suggest_fuzzy_semantics(spark, tmp_path):
    # FuzzySuggester defaults: maxEdits=1, transpositions, first char
    # exact, minFuzzyLength=3
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    words = ["search", "serch", "socket", "sample", "earch", "sarch",
             "xsearch", "sperach", "sexrch"]
    docs = spark.createDataFrame(
        [(i, " ".join(words[: i + 1])) for i in range(len(words))],
        "doc_id long, text string")
    build_index(spark, docs, str(tmp_path / "fsug"), id_cols=["doc_id"],
                text_col="text")
    s = Searcher(IndexSnapshot(spark, str(tmp_path / "fsug")))
    got = set(s.suggest_fuzzy("serach", 10).toPandas().term)
    # transposition of ra->ar: "search" (OSA 1); deletion: "serch";
    # insertion: "sperach" (insert p); "sarch"/"sexrch" are distance 2
    assert "search" in got       # adjacent transposition
    assert "serch" in got        # deletion
    assert "sperach" in got      # insertion
    assert "earch" not in got    # first char must match exactly
    assert "socket" not in got   # distance 4
    assert "xsearch" not in got  # first char mismatch
    # short input falls back to exact prefix
    short = set(s.suggest_fuzzy("se", 10).toPandas().term)
    assert short == {w for w in words if w.startswith("se")}

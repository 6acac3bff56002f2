"""Unicode word-char analysis mode (StandardTokenizer UAX#29 token-type
behavior, solr-8.4.0/.../analysis/standard/StandardTokenizer.java:44-69):
CJK ideographs and hiragana tokenize one char per token, katakana and
hangul as runs, accented Latin / Greek / Cyrillic as word runs — end to
end: tokenizer unit behavior, DuckDB oracle parity of the shared pattern,
index build over a non-ASCII corpus, and engine-vs-oracle rank identity."""

import numpy as np
import pandas as pd
import pytest

from lucene_7_x_9_x_spark.functions.analysis import (
    UNICODE_TOKEN_REGEX, AnalyzerConfig, tokenize_series, unicode_analyzer)
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              PhraseQuery, TermQuery)

DOCS = [
    "搜索 引擎 索引 café résumé",
    "カタカナ テスト ひらがな かな",
    "한국어 형태소 분석 naïve façade",
    "mixed英語とdata_42 pipeline über größe",
    "Ελληνικά русский текст déjà vu",
    "搜索 排序 算法 と 機械 学習",
]


def test_tokenizer_token_types():
    toks = tokenize_series(pd.Series(DOCS), unicode_analyzer())
    assert list(toks[0]) == ["搜", "索", "引", "擎", "索", "引",
                             "café", "résumé"]
    # katakana runs stay whole; hiragana chars split
    assert list(toks[1]) == ["カタカナ", "テスト", "ひ", "ら", "が", "な",
                             "か", "な"]
    # hangul runs stay whole
    assert list(toks[2])[:3] == ["한국어", "형태소", "분석"]
    # script boundaries split inside a word; ASCII+underscore run survives
    assert list(toks[3]) == ["mixed", "英", "語", "と", "data_42",
                             "pipeline", "über", "größe"]
    # Greek/Cyrillic lowercase via str.lower()
    assert list(toks[4])[:3] == ["ελληνικά", "русский", "текст"]


def test_duckdb_oracle_reproduces_the_pattern():
    import duckdb
    con = duckdb.connect()
    for txt in DOCS:
        want = list(tokenize_series(pd.Series([txt]), unicode_analyzer())[0])
        got = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)",
            [txt, UNICODE_TOKEN_REGEX]).fetchone()[0]
        assert got == want, txt


def test_oversize_split_in_unicode_mode():
    cfg = AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX, max_token_length=4)
    toks = tokenize_series(pd.Series(["alphabetical κατάλογος"]), cfg)
    assert list(toks[0]) == ["alph", "abet", "ical", "κατά", "λογο", "ς"]


@pytest.fixture(scope="module")
def uidx(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    out = str(tmp_path_factory.mktemp("uidx"))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS * 3)],
        "doc_id long, text string").repartitionByRange(2, "doc_id")
    return build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                       segment_by="input", analyzer=unicode_analyzer())


def test_nonascii_corpus_builds_nonempty_index(uidx):
    assert uidx.stats["doc_count"] == len(DOCS) * 3
    terms = {r.term for r in uidx.terms().collect()}
    assert {"搜", "索", "カタカナ", "한국어", "café", "über",
            "русский"} <= terms
    # every doc has tokens (nothing silently tokenized to empty)
    assert uidx.stats["sum_total_term_freq"] > 0
    dm = uidx.docmap().where("dl = 0").count()
    assert dm == 0


def test_unicode_search_rank_matches_oracle(spark, uidx):
    from lucene_7_x_9_x_spark import oracle
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf = pd.DataFrame({"text": DOCS * 3})
    eng = oracle.OracleEngine(
        *oracle.index_corpus(pdf, text_col="text", cfg=unicode_analyzer()))
    s = Searcher(uidx)
    for q in [TermQuery("索"),
              BooleanQuery([(Occur.SHOULD, TermQuery("搜")),
                            (Occur.SHOULD, TermQuery("café")),
                            (Occur.SHOULD, TermQuery("カタカナ"))]),
              BooleanQuery([(Occur.MUST, TermQuery("搜")),
                            (Occur.MUST, TermQuery("索"))]),
              PhraseQuery(["搜", "索"])]:
        got = s.search(q, 10).toPandas()
        want = eng.search(q, 10)
        # uidx docids are global doc_id order (range partition + input
        # segmentation), same as the oracle's positional docids
        got_ids = [
            int(r.doc_id) for r in got.itertuples()]
        assert got_ids == [int(d) for d in want.docid], str(q)
        np.testing.assert_array_equal(
            got.score.to_numpy(np.float32),
            want.score.to_numpy(np.float32), str(q))


def test_uax29_num_rule():
    # NUM token type (StandardTokenizer.java:44-69 MidNum): interior
    # single '.'/',' between digits keeps the run whole; doubles and
    # trailing separators break; alnum runs unchanged
    toks = tokenize_series(pd.Series(
        ["release 2.4.1 and ip 192.168.0.1 totals 1,000,000",
         "ranges 1..2 end 3. x 123abc v2 2.4.1x"]), unicode_analyzer())
    assert list(toks[0]) == ["release", "2.4.1", "and", "ip",
                             "192.168.0.1", "totals", "1,000,000"]
    assert list(toks[1]) == ["ranges", "1", "2", "end", "3", "x",
                             "123abc", "v2", "2.4.1", "x"]
    # tri-runtime identity: DuckDB RE2 reproduces both rows exactly
    import duckdb
    con = duckdb.connect()
    for txt, want in [
        ("release 2.4.1 and ip 192.168.0.1 totals 1,000,000",
         list(toks[0])),
        ("ranges 1..2 end 3. x 123abc v2 2.4.1x", list(toks[1]))]:
        got = con.execute("SELECT regexp_extract_all(lower(?), ?)",
                          [txt, UNICODE_TOKEN_REGEX]).fetchone()[0]
        assert got == want, txt


EMOJI_TEXTS = [
    "I love 🍕 and 🍔 today",
    "flags 🇺🇸🇯🇵 fly high",
    "thumbs 👍🏻 and 👍🏿 up",
    "family 👨‍👩‍👧 emoji",
    "keycap 1️⃣ and 3.14 and #⃣",
    "hearts ❤️ ❤ plain",
    "mixed 搜索 😀 café 2.4.1",
]
EMOJI_WANT = [
    ["i", "love", "🍕", "and", "🍔", "today"],
    ["flags", "🇺🇸", "🇯🇵", "fly", "high"],
    ["thumbs", "👍🏻", "and", "👍🏿", "up"],
    ["family", "👨‍👩‍👧", "emoji"],
    ["keycap", "1️⃣", "and", "3.14", "and", "#⃣"],
    ["hearts", "❤️", "❤", "plain"],
    ["mixed", "搜", "索", "😀", "café", "2.4.1"],
]


def test_uax29_emoji_rule():
    # EMOJI token type (StandardTokenizer.java:44-69): pictographic
    # sequences are single tokens — flag = regional-indicator PAIR, skin
    # tone and VS16 continue the base, ZWJ joins bases, digit keycaps win
    # over the word class at the same offset (leftmost-first)
    toks = tokenize_series(pd.Series(EMOJI_TEXTS), unicode_analyzer())
    for got, want in zip(toks, EMOJI_WANT):
        assert list(got) == want


def test_uax29_emoji_duckdb_identity():
    import duckdb
    con = duckdb.connect()
    for txt, want in zip(EMOJI_TEXTS, EMOJI_WANT):
        got = con.execute("SELECT regexp_extract_all(lower(?), ?)",
                          [txt, UNICODE_TOKEN_REGEX]).fetchone()[0]
        assert got == want, txt


def test_uax29_emoji_java_identity(spark):
    # the THIRD runtime: Spark SQL's regexp_extract_all is
    # java.util.regex — the same pattern string must tokenize identically
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(t,) for t in EMOJI_TEXTS], "text string")
    rows = (df.select(F.regexp_extract_all(
                F.lower("text"), F.lit(UNICODE_TOKEN_REGEX), 0)
                .alias("ts"))
            .collect())
    for r, want in zip(rows, EMOJI_WANT):
        assert r["ts"] == want


def test_cjk_bigram_filter_semantics():
    import pandas as pd

    from lucene_7_x_9_x_spark.functions.analysis import (
        UNICODE_TOKEN_REGEX, AnalyzerConfig, tokenize_series)
    cfg = AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX,
                         cjk_bigrams=True)
    out = tokenize_series(pd.Series(
        ["中文搜索", "中", "abc 中文 def", "中 文", "中文 word 索引"]),
        cfg)
    assert list(out[0]) == ["中文", "文搜", "搜索"]  # overlapping run
    assert list(out[1]) == ["中"]                     # lone -> unigram
    assert list(out[2]) == ["abc", "中文", "def"]
    # whitespace between ideographs still bigrams (the filter pairs
    # consecutive CJK TOKENS, like CJKBigramFilter)
    assert list(out[3]) == ["中文"]
    assert list(out[4]) == ["中文", "word", "索引"]


def test_cjk_bigram_end_to_end_phrase(spark, tmp_path):
    from lucene_7_x_9_x_spark.functions.analysis import (
        UNICODE_TOKEN_REGEX, AnalyzerConfig)
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.plans.query import PhraseQuery
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "中文搜索引擎"), (1, "搜索中文引擎"), (2, "引擎 only here")],
        "doc_id long, text string")
    build_index(spark, docs, str(tmp_path / "cjk"), id_cols=["doc_id"],
                text_col="text",
                analyzer=AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX,
                                        cjk_bigrams=True))
    idx = IndexSnapshot(spark, str(tmp_path / "cjk"))
    assert idx.analyzer.cjk_bigrams
    s = Searcher(idx)
    # "中文搜索" analyzed -> bigrams 中文,文搜,搜索 at consecutive
    # positions: a phrase hits doc 0 only (doc 1 has 中文 and 搜索 but
    # not adjacent in that order)
    bigrams = s.analyze("中文搜索")
    assert bigrams == ["中文", "文搜", "搜索"]
    got = {int(r.doc_id) for r in
           s.search(PhraseQuery(bigrams), 10).collect()}
    assert got == {0}
    # single-term bigram matches both orderings
    got2 = {int(r.doc_id) for r in
            s.search(s.text_query("中文"), 10).collect()}
    assert got2 == {0, 1}

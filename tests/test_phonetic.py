"""American Soundex (PhoneticFilter role): published vectors and
variant-matching through the analyzer chain."""

import pytest

from lucene_7_x_9_x_spark.functions.phonetic import soundex

# the classic published American Soundex vectors (including the h/w
# silent-merge cases that distinguish it from the naive variant)
VECTORS = {
    "robert": "r163", "rupert": "r163",
    "ashcraft": "a261", "ashcroft": "a261",   # h silent: s,c merge
    "tymczak": "t522",                          # cz collapse, vowel split
    "pfister": "p236",                          # pf collapse with first
    "honeyman": "h555",
    "smith": "s530", "smyth": "s530",
    "jackson": "j250",
    "washington": "w252",
    "lee": "l000",
    "gutierrez": "g362",
}


def test_published_vectors():
    for w, code in VECTORS.items():
        assert soundex(w) == code, (w, soundex(w), code)


def test_numeric_tokens_pass_through():
    assert soundex("314") == "314"
    assert soundex("x86") == "x000"  # letters only feed the code


def test_analyzer_chain_replaces_tokens():
    import pandas as pd

    from lucene_7_x_9_x_spark.functions.analysis import (AnalyzerConfig,
                                                         tokenize_series)
    cfg = AnalyzerConfig(phonetic="soundex")
    got = tokenize_series(pd.Series(["Smith wrote to SMYTH"]), cfg)[0]
    assert got == ["s530", "w630", "t000", "s530"]


def test_variant_matching_end_to_end(spark, tmp_path):
    from lucene_7_x_9_x_spark.functions.analysis import AnalyzerConfig
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    docs = spark.createDataFrame(
        [(0, "smyth filed the report"),
         (1, "smith was absent"),
         (2, "jackson took notes")],
        "doc_id long, text string")
    build_index(spark, docs, str(tmp_path / "ph"), id_cols=["doc_id"],
                text_col="text",
                analyzer=AnalyzerConfig(phonetic="soundex"))
    idx = IndexSnapshot(spark, str(tmp_path / "ph"))
    # the manifest round-trips the phonetic setting
    assert idx.analyzer.phonetic == "soundex"
    s = Searcher(idx)
    got = {int(r.doc_id) for r in
           s.search(s.text_query("smith"), 10).collect()}
    assert got == {0, 1}  # both spelling variants match

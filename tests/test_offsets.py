"""Index-stored character offsets (IndexOptions ..._AND_OFFSETS analogue)
and the index-offsets highlighter: the documents are never re-analyzed at
query time — occurrence offsets come from the per-posting payload."""

import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.functions.highlight import highlight_from_index
from lucene_7_x_9_x_spark.index import build_index
from lucene_7_x_9_x_spark.searcher import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def offset_searcher(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("offs")
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, str(tmp / "i"), id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      with_offsets=True)
    return Searcher(idx), docs


def test_offsets_roundtrip_exact(offset_searcher, spark):
    s, docs = offset_searcher
    rows = s.term_offsets("filter").collect()
    id_of = {(r["segment"], r["docid"]): r["doc_id"] for r in
             s.index.docmap().select("segment", "docid", "doc_id").collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rx = re.compile(r"[a-z0-9_]+")
    assert rows
    for r in rows:
        did = id_of[(r["segment"], r["docid"])]
        exp = [(m.start(), m.end())
               for m in rx.finditer(texts[did].lower())
               if m.group(0) == "filter"]
        assert list(zip(r["starts"], r["ends"])) == exp


def test_offsets_require_opt_in(spark, tmp_path):
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .limit(50))
    idx = build_index(spark, docs, str(tmp_path / "no_off"),
                      id_cols=["doc_id"], text_col="text", num_segments=2)
    with pytest.raises(ValueError, match="without stored offsets"):
        Searcher(idx).term_offsets("filter")


def test_highlighter_wraps_exact_token_occurrences(offset_searcher):
    s, docs = offset_searcher
    out = highlight_from_index(s, docs, ["filter", "join"],
                               width=60, lead=10).collect()
    assert out
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out[:50]:
        snip = r["snippet"]
        # every wrapped token is exactly a query term from thesource text
        for m in re.finditer(r"<b>([^<]*)</b>", snip):
            assert m.group(1).lower() in ("filter", "join")
        # the unwrapped snippet is a contiguous slice of the source text
        plain = snip.replace("<b>", "").replace("</b>", "")
        assert plain in texts[r["doc_id"]]


def test_offsets_exact_on_non_length_preserving_lowercase():
    # review regression: lowercasing first shifted offsets after U+0130
    import pandas as pd
    from lucene_7_x_9_x_spark.functions.analysis import (
        AnalyzerConfig, tokenize_to_flat_with_offsets)
    texts = pd.Series(["İstanbul filter code"])
    _, _, toks, _, starts, ends = tokenize_to_flat_with_offsets(
        texts, AnalyzerConfig())
    for t, a, b in zip(toks, starts, ends):
        assert texts.iloc[0][a:b].lower() == t
    assert "filter" in list(toks)


def test_offsets_survive_merge_and_compaction(offset_searcher, spark,
                                              tmp_path):
    import shutil
    from lucene_7_x_9_x_spark.operators.deletes import (compact_index,
                                                        delete_by_ids)
    from lucene_7_x_9_x_spark.operators.merge import merge_index
    from lucene_7_x_9_x_spark.index import IndexSnapshot
    s, docs = offset_searcher
    rx = re.compile(r"[a-z0-9_]+")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def assert_exact(searcher):
        id_of = {(r["segment"], r["docid"]): r["doc_id"] for r in
                 searcher.index.docmap()
                 .select("segment", "docid", "doc_id").collect()}
        rows = searcher.term_offsets("filter").collect()
        assert rows
        for r in rows:
            did = id_of[(r["segment"], r["docid"])]
            exp = [(m.start(), m.end())
                   for m in rx.finditer(texts[did].lower())
                   if m.group(0) == "filter"]
            assert list(zip(r["starts"], r["ends"])) == exp, did

    # merge 4 segments -> 2: offset blobs concat + re-offset
    merged = merge_index(spark, s.index, str(tmp_path / "m"),
                         target_segments=2)
    assert_exact(Searcher(merged))

    # tombstone a third of the docs, compact: per-doc slice filtering
    work = str(tmp_path / "w")
    shutil.copytree(merged.root, work)
    idx = IndexSnapshot(spark, work)
    dels = docs.where(F.col("doc_id") % 3 == 0).select("doc_id")
    delete_by_ids(spark, work, dels)
    compacted = compact_index(spark, IndexSnapshot(spark, work),
                              str(tmp_path / "c"))
    sc = Searcher(compacted)
    assert_exact(sc)
    # deleted docs are physically gone
    kept = {r["doc_id"] for r in compacted.docmap()
            .select("doc_id").collect()}
    assert all(d % 3 != 0 for d in kept)


def test_offsets_on_named_fields(spark, tmp_path):
    """with_offsets=True stores offsets for EVERY indexed field; a named
    field's offsets address positions within THAT field's source text."""
    from pyspark.sql import functions as F
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9_]+"),
                    lambda x: x != "")
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .withColumn("head", F.concat_ws(" ", F.slice(toks, 1, 16)))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, str(tmp_path / "i"), id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      extra_fields=[("head", "head"), ("lang", "lang")],
                      with_offsets=True)
    s = Searcher(idx)
    rx = re.compile(r"[a-z0-9_]+")
    id_of = {(r["segment"], r["docid"]): r["doc_id"] for r in
             idx.docmap().select("segment", "docid", "doc_id").collect()}
    for fld, src in [("head", "head"), ("lang", "lang")]:
        texts = {r["doc_id"]: r[src] for r in
                 docs.select("doc_id", src).collect()}
        term = "fast" if fld == "head" else "de"
        rows = s.term_offsets(term, field=fld).collect()
        assert rows, fld
        for r in rows:
            did = id_of[(r["segment"], r["docid"])]
            exp = [(m.start(), m.end())
                   for m in rx.finditer(texts[did].lower())
                   if m.group(0) == term]
            assert list(zip(r["starts"], r["ends"])) == exp, (fld, did)
    # the default field still answers too
    assert s.term_offsets("filter").count() > 0


def test_highlight_from_named_field(spark, tmp_path):
    from pyspark.sql import functions as F
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9_]+"),
                    lambda x: x != "")
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .withColumn("head", F.concat_ws(" ", F.slice(toks, 1, 16)))
            .repartitionByRange(4, "doc_id"))
    idx = build_index(spark, docs, str(tmp_path / "i"), id_cols=["doc_id"],
                      text_col="text", segment_by="input",
                      extra_fields=[("head", "head")], with_offsets=True)
    s = Searcher(idx)
    snips = {r["doc_id"]: r["snippet"] for r in
             highlight_from_index(s, docs, ["fast"], text_col="head",
                                  field="head").collect()}
    assert snips
    heads = {r["doc_id"]: r["head"] for r in
             docs.select("doc_id", "head").collect()}
    for did, sn in snips.items():
        assert "<b>" in sn
        # the wrapped token really is a 'fast' occurrence in the head text
        assert sn.replace("<b>", "").replace("</b>", "") in heads[did]


def test_best_passage_selection(spark, tmp_path_factory):
    # passages="best": the window holding MORE (and rarer) matched terms
    # wins over the first-occurrence window (PassageScorer behavior)
    from lucene_7_x_9_x_spark.functions.highlight import \
        highlight_from_index
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("bp_idx"))
    # 'alpha' appears alone early; 'alpha beta' co-occur much later
    txt = ("alpha " + "filler " * 30 + "alpha beta gamma end")
    df = spark.createDataFrame([(0, txt), (1, "no matches here")],
                               "doc_id long, text string")
    idx = build_index(spark, df, out, id_cols=["doc_id"], text_col="text",
                      segment_by="input", with_offsets=True)
    s = Searcher(idx)
    first = highlight_from_index(
        s, df, ["alpha", "beta"], width=40, lead=5).toPandas()
    best = highlight_from_index(
        s, df, ["alpha", "beta"], width=40, lead=5,
        passages="best").toPandas()
    f0 = first[first.doc_id == 0].snippet.iloc[0]
    b0 = best[best.doc_id == 0].snippet.iloc[0]
    assert "<b>beta</b>" not in f0          # first window: early alpha only
    assert "<b>alpha</b>" in b0 and "<b>beta</b>" in b0

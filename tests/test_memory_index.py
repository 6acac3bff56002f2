"""MemoryIndex (single-doc in-memory index; SearchWithMemoryIndex /
MemoryIndexTest demos): match + score semantics, multi-field, and score
identity with the full Spark engine on the same one-doc corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.operators.memory_index import MemoryIndex
from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                              PhraseQuery, TermQuery)


def test_match_and_score_basics():
    mi = MemoryIndex()
    mi.add_field("content", "the quick brown fox jumps over the lazy dog")
    assert mi.matches(TermQuery("fox"))
    assert not mi.matches(TermQuery("cat"))
    assert mi.score(TermQuery("fox")) > 0.0
    assert mi.score(TermQuery("cat")) == 0.0
    assert mi.matches(PhraseQuery(["quick", "brown", "fox"]))
    assert not mi.matches(PhraseQuery(["brown", "quick"]))
    # score is float32-exact (engine-wide invariant)
    s = mi.score(TermQuery("the"))
    assert s == float(np.float32(s))


def test_multi_field_scoping():
    mi = MemoryIndex()
    mi.add_field("title", "spark engine")
    mi.add_field("body", "lucene on spark with columnar postings")
    assert mi.matches(TermQuery("columnar", field="body"))
    assert not mi.matches(TermQuery("columnar", field="title"))
    # the first added field doubles as the default field
    assert mi.matches(TermQuery("engine"))
    assert not mi.matches(TermQuery("columnar"))
    q = BooleanQuery([(Occur.MUST, TermQuery("spark", field="title")),
                      (Occur.MUST, TermQuery("postings", field="body"))])
    assert mi.matches(q)


def test_repeated_add_appends_positions():
    mi = MemoryIndex()
    mi.add_field("content", "alpha beta")
    mi.add_field("content", "gamma delta")
    # positions continue across adds: "beta gamma" is a phrase hit
    assert mi.matches(PhraseQuery(["beta", "gamma"]))
    mi.reset()
    with pytest.raises(ValueError):
        mi.score(TermQuery("alpha"))


def test_score_identity_with_spark_engine(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import IndexSnapshot, build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    text = ("key agg row scan slow fast table value part hash value "
            "table part a row fast merge batch part value")
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    idx = build_index(spark, docs, str(tmp_path / "one"),
                      id_cols=["doc_id"], text_col="text")
    s = Searcher(IndexSnapshot(spark, str(tmp_path / "one")))
    mi = MemoryIndex()
    mi.add_field("text", text)
    for q in (TermQuery("value"),
              BooleanQuery([(Occur.SHOULD, TermQuery("fast")),
                            (Occur.SHOULD, TermQuery("merge"))]),
              PhraseQuery(["row", "fast"])):
        full = s.search(q, 1).toPandas()
        assert len(full) == 1
        assert mi.score(q) == float(full.score.iloc[0])

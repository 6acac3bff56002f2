"""segment_by='input' (zero-shuffle DWPT path) produces a correct index:
same global stats, same per-doc postings as the oracle, queries agree with
the hash-mode index."""

import numpy as np

from lucene_7_x_9_x_spark.index import build_index
from lucene_7_x_9_x_spark.plans.query import BooleanQuery, Occur, TermQuery
from tests.test_build import _mk_corpus


def test_input_mode_build_matches_hash_mode(spark, tmp_path):
    from lucene_7_x_9_x_spark.searcher import Searcher
    pdf = _mk_corpus(n=300)
    sdf = spark.createDataFrame(pdf).repartition(5)
    a = build_index(spark, sdf, str(tmp_path / "hash"),
                    id_cols=["repo", "path", "commit"], text_col="content",
                    num_segments=4, segment_by="hash")
    b = build_index(spark, sdf, str(tmp_path / "input"),
                    id_cols=["repo", "path", "commit"], text_col="content",
                    segment_by="input")
    # identical global stats (segmentation differs, collection does not)
    assert a.stats == b.stats
    ta = a.terms().toPandas().set_index("term").sort_index()
    tb = b.terms().toPandas().set_index("term").sort_index()
    assert (ta.doc_freq == tb.doc_freq).all()
    assert (ta.total_term_freq == tb.total_term_freq).all()
    # same query answers (scores identical; identity sets equal)
    q = BooleanQuery([(Occur.SHOULD, TermQuery("def")),
                      (Occur.SHOULD, TermQuery("return"))])
    ra = Searcher(a).search(q, 10).toPandas()
    rb = Searcher(b).search(q, 10).toPandas()
    assert np.array_equal(ra.score.to_numpy(np.float32),
                          rb.score.to_numpy(np.float32))
    assert set(zip(ra.repo, ra.path)) == set(zip(rb.repo, rb.path))
    assert Searcher(a).count(TermQuery("def")) == \
        Searcher(b).count(TermQuery("def"))

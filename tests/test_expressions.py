"""Compiled scoring expressions (Lucene expressions module:
JavascriptCompiler + SimpleBindings + FunctionScoreQuery): parser and
SQL emission semantics, binding validation, and engine parity — the
compiled expression over _score/docvalues ranks exactly like a pandas
reference evaluated on the engine's own match scores."""

import math
import os

import pytest

from lucene_7_x_9_x_spark.functions.expressions import (
    ExpressionError, compile_expression)
from lucene_7_x_9_x_spark.plans.query import TermQuery

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# compiler unit behavior (via DuckDB so SQL semantics are the real thing)
# ---------------------------------------------------------------------------
def _eval(src, **vals):
    import duckdb
    ce = compile_expression(src)
    bind = {k: repr(float(v)) for k, v in vals.items()}
    return duckdb.sql(f"SELECT {ce.sql(bind)} AS v").fetchone()[0]


def test_arithmetic_and_precedence():
    assert _eval("1 + 2 * 3") == 7.0
    assert _eval("(1 + 2) * 3") == 9.0
    assert _eval("2 - 3 - 4") == -5.0          # left associative
    assert _eval("8 / 2 / 2") == 2.0
    assert _eval("-2 * 3") == -6.0
    assert _eval("1 / 2") == 0.5               # true division, not int


def test_functions_and_pow_expansion():
    assert _eval("sqrt(9)") == 3.0
    assert _eval("abs(0 - 5)") == 5.0
    assert _eval("min(3, 7)") == 3.0
    assert _eval("max(3, 7)") == 7.0
    assert _eval("pow(x, 3)", x=2) == 8.0
    assert _eval("pow(x, 0)", x=5) == 1.0
    # pow is expanded to multiplication — no pow() in the emitted SQL
    assert "pow" not in compile_expression("pow(x, 4)").sql({})


def test_variables_and_bindings():
    ce = compile_expression("_score * boost + dl")
    assert ce.variables == {"_score", "boost", "dl"}
    s = ce.sql({"_score": "0.5"})
    assert "(0.5)" in s and "CAST(boost AS DOUBLE)" in s


def test_rejects_bad_input():
    with pytest.raises(ExpressionError):
        compile_expression("ln(x)")            # transcendental excluded
    with pytest.raises(ExpressionError):
        compile_expression("pow(x, y)")        # non-literal exponent
    with pytest.raises(ExpressionError):
        compile_expression("pow(x, 2.5)")      # fractional exponent
    with pytest.raises(ExpressionError):
        compile_expression("1 +")
    with pytest.raises(ExpressionError):
        compile_expression("a @ b")
    with pytest.raises(ExpressionError):
        compile_expression("_score + nope", allowed_vars={"_score"})


# ---------------------------------------------------------------------------
# engine parity
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    from lucene_7_x_9_x_spark.index import build_index
    from lucene_7_x_9_x_spark.searcher import Searcher
    out = str(tmp_path_factory.mktemp("expr_idx"))
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .repartitionByRange(4, "doc_id"))
    return Searcher(build_index(spark, docs, out, id_cols=["doc_id"],
                                text_col="text", segment_by="input"))


def test_expression_score_matches_pandas_reference(spark, searcher):
    import numpy as np
    q = TermQuery("filter")
    m = (searcher.matches(q)
         .join(searcher.index.docmap()
               .select("segment", "docid", "doc_id", "dl"),
               ["segment", "docid"])
         .toPandas())
    expected = m.assign(
        v=np.float32(0.0) + (
            0.3 * m.score.astype("float64")
            * np.sqrt(m.dl.astype("float64"))
            + np.minimum(m.dl.astype("float64"), 100.0) / 50.0
        ).astype("float32"))
    expected = expected.sort_values(
        ["v", "doc_id"], ascending=[False, True]).head(10)
    got = searcher.expression_score(
        q, "0.3 * _score * sqrt(dl) + min(dl, 100) / 50", k=10).toPandas()
    assert list(got.doc_id) == list(expected.doc_id)
    assert got.score.dtype.name == "float32"
    for g, e in zip(got.score, expected.v):
        assert g == pytest.approx(e, rel=1e-6)


def test_expression_pure_score_reproduces_search(spark, searcher):
    q = TermQuery("filter")
    base = searcher.search(q, 10).toPandas()
    got = searcher.expression_score(q, "_score", k=10).toPandas()
    assert list(got.doc_id) == list(base.doc_id)


def test_expression_rejects_unknown_column(spark, searcher):
    with pytest.raises(ExpressionError):
        searcher.expression_score(TermQuery("filter"),
                                  "_score + not_a_column")

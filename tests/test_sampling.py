"""Deterministic sampling / mixture weighting: repartition stability
(the property rand(seed) lacks), rate math, and scan-stage plan shape."""

import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.pipeline.sampling import (deterministic_sample,
                                                    mixture_rates,
                                                    mixture_sample,
                                                    stratified_sample)


@pytest.fixture(scope="module")
def docs(spark):
    langs = ["en"] * 50 + ["de"] * 30 + ["zh"] * 20
    return spark.createDataFrame(
        [(i, langs[i]) for i in range(100)], "doc_id long, lang string")


def test_sample_is_repartition_stable(docs):
    a = {r.doc_id for r in
         deterministic_sample(docs, "doc_id", 0.3, seed=5).collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs.repartition(17), "doc_id", 0.3,
                              seed=5).collect()}
    c = {r.doc_id for r in
         deterministic_sample(docs.coalesce(1), "doc_id", 0.3,
                              seed=5).collect()}
    assert a == b == c
    assert 10 <= len(a) <= 50  # ~30 of 100, hash noise allowed
    # different seed -> different sample
    d = {r.doc_id for r in
         deterministic_sample(docs, "doc_id", 0.3, seed=6).collect()}
    assert a != d


def test_sample_is_nested(docs):
    # hash thresholding makes samples NESTED: fraction 0.1 sample is a
    # subset of the 0.3 sample at the same seed (useful for curriculum
    # subsets at scale)
    small = {r.doc_id for r in
             deterministic_sample(docs, "doc_id", 0.1, seed=5).collect()}
    big = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.3, seed=5).collect()}
    assert small <= big


def test_sample_plan_is_pure_filter(docs):
    plan = deterministic_sample(docs, "doc_id", 0.3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scan-stage filter only


def test_mixture_rates_math():
    counts = {"en": 218, "de": 70, "zh": 75, "fr": 64}
    target = {"en": 0.5, "de": 0.2, "zh": 0.3}
    rates = mixture_rates(counts, target)
    # binding stratum: zh (75/0.3 = 250 = nstar) kept whole
    assert rates["zh"] == 1.0
    assert rates["en"] == (0.5 * 250.0) / 218
    assert rates["de"] == (0.2 * 250.0) / 70
    assert rates["fr"] == 0.0
    # degenerate: no targeted stratum present
    assert mixture_rates({"x": 10}, {"en": 1.0}) == {"x": 0.0}


def test_mixture_sample_hits_target(docs):
    got = mixture_sample(docs, "doc_id", "lang",
                         {"en": 0.4, "zh": 0.4, "de": 0.2},
                         seed=3).groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    # zh binds (20/0.4 = 50): kept whole; en thinned toward 20, de
    # toward 10 (hash noise tolerated)
    assert by["zh"] == 20
    assert by["en"] < 50
    assert by["de"] < 30


def test_stratified_default_rate(docs):
    got = stratified_sample(docs, "doc_id", "lang", {"en": 1.0},
                            default=0.0).collect()
    assert {r.lang for r in got} == {"en"}
    assert len(got) == 50

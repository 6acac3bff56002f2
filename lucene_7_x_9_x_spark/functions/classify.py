"""Classification module — index-driven classifiers
(solr-8.4.0/lucene/classification/src/java/org/apache/lucene/
classification/): SimpleNaiveBayesClassifier and
KNearestNeighborClassifier, re-expressed Spark-first.

The reference classifies one text at a time against an IndexReader;
the scalable form here classifies a whole UNLABELED column against a
LABELED corpus in one job (the per-text form is `knn_classify`, built
on the engine's MoreLikeThis, for the serving path).

SimpleNaiveBayesClassifier.java semantics kept exactly:
- prior(c)           = ln(docCount(class=c)) - ln(N)            (java:266)
- per query token w  : hits = # docs of class c CONTAINING w (doc
  frequency, not tf — java:250 counts hits of word AND class);
  P(w|c) = (hits+1) / den_c                                     (java:211)
- den_c = avgUniqueTermsPerDoc * docCount(c) + N                (java:231:
  avg # unique terms per doc = sumDocFreq/docCount over the text field,
  times docs with c, plus the `docsWithClass` smoothing term)
- log-likelihood sums over EVERY token instance of the query text
  (repeats count, java:203-219); score = loglik + prior; the argmax
  class wins (ties here: label asc — the reference takes the first max
  in iteration order, which is unspecified; lexicographic is the
  deterministic stand-in).

KNearestNeighborClassifier.java semantics kept:
- query = MoreLikeThis over the text (the engine's more_like_this)
- vote: per class over the top-k neighbors, score contribution is
  sum(score_i/maxScore)/k, scaled by k/sumdoc when fewer than k
  neighbors carried a class (java:190-235: count * normBoost / k with
  the sumdoc<k correction == boostSum/k resp. boostSum/sumdoc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..pipeline.dedup import tokens_col


def naive_bayes_classify(labeled: DataFrame, unlabeled: DataFrame,
                         id_col: str, text_col: str,
                         label_col: str) -> DataFrame:
    """Batch SimpleNaiveBayes: assign each unlabeled doc the argmax
    class. Returns DataFrame(<id_col>, label).

    Scale shape: class stats are a tiny driver-side collect (|classes|
    rows); the word-class doc-frequency table is (vocab x classes) —
    shuffle-joined on the token; scoring is one explode + join + sum
    per (doc, class), all JVM expressions."""
    spark = labeled.sparkSession
    par = spark.sparkContext.defaultParallelism
    # class priors and denominators (driver: |classes| + 2 scalars)
    cstats = {r[label_col]: int(r["cnt"]) for r in
              labeled.groupBy(label_col).agg(F.count("*").alias("cnt"))
              .collect()}
    n_docs = sum(cstats.values())
    ltoks = (labeled.select(id_col, label_col,
                            tokens_col(text_col).alias("ts"))
             .repartition(par))
    # sumDocFreq = # distinct (doc, term) pairs over the text field
    pairs = (ltoks.select(id_col, label_col,
                          F.explode(F.array_distinct("ts")).alias("w")))
    sum_doc_freq = pairs.count()
    avg_unique = sum_doc_freq / float(n_docs)
    classes = sorted(cstats)
    dens = {c: avg_unique * cstats[c] + n_docs for c in classes}
    priors = {c: math.log(cstats[c]) - math.log(n_docs) for c in classes}
    # word-class doc frequencies (vocab x classes)
    dfc = (pairs.groupBy("w", label_col)
           .agg(F.count("*").alias("hits"))
           .withColumnRenamed(label_col, "_cls"))
    # per-class constant table (broadcast: |classes| rows)
    cdf = spark.createDataFrame(
        [(c, float(dens[c]), float(priors[c])) for c in classes],
        "_cls string, _den double, _prior double")
    qtoks = (unlabeled.select(id_col, tokens_col(text_col).alias("ts"))
             .repartition(par)
             .select(id_col, F.explode("ts").alias("w")))
    scored = (qtoks.crossJoin(F.broadcast(cdf))
              .join(dfc, ["w", "_cls"], "left")
              .withColumn("_lp", F.log(
                  (F.coalesce(F.col("hits"), F.lit(0)) + F.lit(1.0))
                  / F.col("_den")))
              .groupBy(id_col, "_cls")
              .agg((F.sum("_lp") + F.first("_prior")).alias("_score")))
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"),
                                           F.asc("_cls"))
    return (scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(id_col, F.col("_cls").alias("label")))


def knn_classify(searcher, text: str, classes: DataFrame,
                 id_col: str, class_col: str, k: int = 10,
                 min_term_freq: int = 2,
                 min_doc_freq: int = 5) -> DataFrame:
    """KNearestNeighborClassifier for one text: MLT top-k neighbors
    vote, boost-weighted by score/maxScore. `classes` maps the index's
    id column to the stored class field. Returns
    DataFrame(rank, label, n_votes) ordered (score desc, label asc)."""
    q = searcher.more_like_this(text, min_term_freq=min_term_freq,
                                min_doc_freq=min_doc_freq)
    return _vote_top_k(searcher, q, classes, id_col, class_col, k)


def knn_classify_fuzzy(searcher, text: str, classes: DataFrame,
                       id_col: str, class_col: str, k: int = 10,
                       max_edits: int = 1,
                       prefix_length: int = 2) -> DataFrame:
    """KNearestFuzzyClassifier (KNearestFuzzyClassifier.java): neighbors
    found by fuzzifying every analyzed query term (NearestFuzzyQuery
    defaults kept: maxEdits=1, PREFIX_LENGTH=2), then the same
    boost-weighted vote.

    Documented simplification: NearestFuzzyQuery boosts each variant by
    (1 - d/len)·idf (java:57,214-230); here each fuzzified term is a
    constant-score SHOULD clause, so a neighbor's score is the NUMBER
    of fuzzified query terms it contains (the coordination count) — an
    integer-exact, cross-engine-reproducible ordering with the same
    "more overlapping fuzzy terms = nearer" monotonicity."""
    from ..plans import query as Q
    terms = sorted(set(searcher.analyze(text)))
    if not terms:
        return searcher.index.spark.createDataFrame(
            [], "rank long, label string, n_votes long")
    q = Q.BooleanQuery([
        (Q.Occur.SHOULD, Q.FuzzyQuery(t, max_edits=max_edits,
                                      prefix_length=prefix_length))
        for t in terms])
    return _vote_top_k(searcher, q, classes, id_col, class_col, k)


def _vote_top_k(searcher, q, classes: DataFrame, id_col: str,
                class_col: str, k: int) -> DataFrame:
    top = searcher.search(q, k)
    idx_id = searcher.index.id_cols[0]
    hits = (top.join(F.broadcast(
        classes.select(F.col(id_col).alias(idx_id),
                       F.col(class_col).alias("_cls"))), idx_id)
        .select("_cls", "score"))
    # boostSum/k, scaled to boostSum/sumdoc when sumdoc < k (see header)
    agg = (hits.agg(F.max("score").alias("mx"),
                    F.count("*").alias("sumdoc")).collect()[0])
    if agg["mx"] is None:  # MLT matched nothing: no classification
        return searcher.index.spark.createDataFrame(
            [], "rank long, label string, n_votes long")
    mx, sumdoc = float(agg["mx"]), int(agg["sumdoc"])
    denom = float(k if sumdoc >= k else sumdoc)
    votes = (hits.groupBy("_cls")
             .agg((F.sum(F.col("score") / F.lit(mx))
                   / F.lit(denom)).alias("_score"),
                  F.count("*").alias("n_votes")))
    w = Window.partitionBy(F.xxhash64("_cls") % F.lit(1)) \
        .orderBy(F.desc("_score"), F.asc("_cls"))
    return (votes.orderBy(F.desc("_score"), F.asc("_cls")).limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", F.col("_cls").alias("label"), "n_votes"))


def bm25nb_classify(searcher, text: str, class_field: str,
                    class_values: list) -> dict:
    """BM25NBClassifier (BM25NBClassifier.java): Naive Bayes whose
    probabilities come from BM25 scores instead of counts —
    P(w|c) := top-1 BM25 score of (MUST class_field:c, SHOULD text:w),
    defaulting to 1 when nothing matches (java:208-221); prior(c) :=
    ln(top-1 score of class_field:c) or 0 (java:223-232); score =
    prior + sum(ln P(w|c)) over every token instance, normalized to 0-1
    by log-sum-exp (java:151-187).

    The index must carry `class_field` as a named field (extra_fields
    at build). ALL |tokens|x|classes| probe queries plus the |classes|
    prior queries run as ONE fused search_many job — the batch surface
    doing what the reference does with 1+|tokens| sequential searches
    per class. Returns {class_value: normalized probability}.
    """
    import math

    from ..plans import query as Q
    toks = searcher.analyze(text)
    if not toks:
        raise ValueError("no analyzable tokens")
    queries = {}
    for c in class_values:
        queries[f"p::{c}"] = Q.BooleanQuery(
            [(Q.Occur.MUST, Q.TermQuery(str(c), field=class_field))])
        for w in sorted(set(toks)):
            queries[f"l::{c}::{w}"] = Q.BooleanQuery(
                [(Q.Occur.MUST, Q.TermQuery(str(c), field=class_field)),
                 (Q.Occur.SHOULD, Q.TermQuery(w))])
    top = searcher.search_many(queries, k=1)
    got = {r["qid"]: float(r["score"]) for r in
           top.select("qid", "score").collect()}
    scores = {}
    for c in class_values:
        prior = got.get(f"p::{c}")
        s = math.log(prior) if prior is not None and prior > 0 else 0.0
        for w in toks:  # every instance (repeats weigh in), java:200-206
            p = got.get(f"l::{c}::{w}", 1.0)
            s += math.log(p if p > 0 else 1.0)
        scores[c] = s
    smax = max(scores.values())
    loga = smax + math.log(sum(math.exp(v - smax)
                               for v in scores.values()))
    return {c: math.exp(v - loga) for c, v in scores.items()}


def perceptron_train(labeled: DataFrame, id_col: str, text_col: str,
                     label_col: str, true_value,
                     epochs: int = 1, bias: float | None = None,
                     n_partitions: int | None = None):
    """BooleanPerceptronClassifier training
    (BooleanPerceptronClassifier.java): binary classifier with
    term-frequency-initialized weights (java:107-113), bias defaulting
    to the average document length (java:92-96), and the update rule
    w[t] = max(0, w[t] + modifier*tf(t,doc)) on misclassification,
    modifier = sign(correct - assigned) (java:137-147,152-182).

    The reference trains STRICTLY SEQUENTIALLY over the index — a shape
    that cannot scale past one machine. Spark-first substitution, per
    the published distributed-perceptron recipe (McDonald, Hall & Mann,
    "Distributed Training Strategies for the Structured Perceptron",
    NAACL 2010, parameter mixing): each partition trains the reference's
    sequential perceptron over ITS docs (ordered by id — deterministic),
    and per-epoch the partition weight vectors are averaged. One shuffle
    per epoch; every weight op is the reference's.

    Returns (weights dict, bias). Classify with perceptron_assign.
    """
    spark = labeled.sparkSession
    par = n_partitions or spark.sparkContext.defaultParallelism
    toks = (labeled.select(id_col, label_col,
                           tokens_col(text_col).alias("ts")))
    agg = toks.select(F.explode("ts").alias("w")).groupBy("w") \
        .agg(F.count("*").alias("ttf"))
    init = {r["w"]: float(r["ttf"]) for r in agg.collect()}
    if bias is None or bias == 0.0:
        nd = toks.where(F.size("ts") > 0).count()
        bias = sum(init.values()) / float(nd) if nd else 1.0
    src = (toks.repartitionByRange(par, F.col(id_col))
           .sortWithinPartitions(id_col)
           .select(id_col, (F.col(label_col) == F.lit(true_value))
                   .alias("_y"), "ts"))
    weights = dict(init)
    for _ in range(max(1, epochs)):
        bc = spark.sparkContext.broadcast(weights)
        b = float(bias)

        def train_part(batches):
            import pandas as pd
            w = dict(bc.value)
            changed = set()
            for pdf in batches:
                for ts, y in zip(pdf["ts"], pdf["_y"]):
                    out = sum(w.get(t, 0.0) for t in ts)
                    assigned = out >= b
                    if assigned == bool(y):
                        continue
                    mod = 1.0 if y else -1.0
                    tf = {}
                    for t in ts:
                        tf[t] = tf.get(t, 0) + 1
                    for t, f in tf.items():
                        if t in w:  # reference updates known terms only
                            w[t] = max(0.0, w[t] + mod * f)
                            changed.add(t)
            yield pd.DataFrame({"w": sorted(changed),
                                "val": [w[t] for t in sorted(changed)]})

        rows = src.mapInPandas(train_part,
                               schema="w string, val double").collect()
        from collections import defaultdict
        sums, cnts = defaultdict(float), defaultdict(int)
        for r in rows:
            sums[r["w"]] += float(r["val"])
            cnts[r["w"]] += 1
        new_w = dict(weights)
        for t in sums:
            # parameter mixing: partitions that left t untouched
            # contribute the incoming weight
            new_w[t] = (sums[t] + (par - cnts[t]) * weights[t]) / par
        weights = new_w
        bc.destroy()
    return weights, float(bias)


def perceptron_assign(spark, weights: dict, bias: float,
                      unlabeled: DataFrame, id_col: str,
                      text_col: str) -> DataFrame:
    """assignClass over a whole column (java:199-218: sum of the
    weights of the text's tokens, TRUE iff >= bias; score =
    1 - exp(-|bias - output|/bias)). JVM explode + broadcast weight
    join + sum — the serving path is fully distributed."""
    wdf = F.broadcast(spark.createDataFrame(
        [(t, float(v)) for t, v in sorted(weights.items())],
        "w string, val double"))
    toks = unlabeled.select(id_col, tokens_col(text_col).alias("ts"))
    summed = (toks.select(id_col, F.explode_outer("ts").alias("w"))
              .join(wdf, "w", "left")
              .groupBy(id_col)
              .agg(F.sum(F.coalesce(F.col("val"), F.lit(0.0)))
                   .alias("_out")))
    out = F.coalesce(F.col("_out"), F.lit(0.0))
    return summed.select(
        id_col, (out >= F.lit(float(bias))).alias("assigned"),
        (F.lit(1.0) - F.exp(-F.abs(F.lit(float(bias)) - out)
                            / F.lit(float(bias)))).alias("score"))

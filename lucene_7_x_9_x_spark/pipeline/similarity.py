"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side arithmetic via
F.aggregate/F.zip_with — no Python in the loop); the LSH-bucketed variant is
the 100 TB path: candidates come from hyperplane buckets (multi-probe), so
per-query work is |bucket| not |corpus|, and bucketing is one shuffle that
can be reused across queries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk_bruteforce(df: DataFrame, query_vec: list[float],
                           id_col: str = "vec_id",
                           vec_col: str = "embedding", k: int = 10,
                           exclude_id=None) -> DataFrame:
    """Exact cosine top-k for one query vector. Returns
    (rank, id, cosine) ordered (cosine desc, id asc)."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = with_norm(df, vec_col).select(
        F.col(id_col),
        (_dot(F.col(vec_col), q) / (F.col("_norm") * F.lit(qn)))
        .alias("cosine"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    top = (scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cosine"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)) \
              .select("rank", id_col, "cosine")


def hyperplane_bucket(df: DataFrame, dim: int, n_planes: int = 8,
                      seed: int = 42, vec_col: str = "embedding"
                      ) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (deterministic seed).
    bucket = sign bits of <v, p_j> packed into a long."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    out = df
    bits = []
    for j in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[j]])
        bits.append(F.when(_dot(F.col(vec_col), p) > 0,
                           F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return out.withColumn("bucket", bucket.cast("long"))


def cosine_topk_lsh(df: DataFrame, query_vec: list[float], dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    k: int = 10, n_planes: int = 8, probe_hamming: int = 1,
                    seed: int = 42) -> DataFrame:
    """Approximate cosine top-k: search only vectors whose hyperplane bucket
    is within `probe_hamming` bit-flips of the query's bucket (multi-probe
    LSH). Same output shape as the brute-force baseline."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    # sequential left-fold, NOT np.dot: matches bit-for-bit the IEEE-754
    # evaluation order of both the Spark F.aggregate fold used for corpus
    # vectors and a left-associated SQL sum, so query and corpus bucketing
    # agree across engines even at sign boundaries
    def _seqdot(p, v):
        acc = 0.0
        for x, y in zip(p, v):
            acc = acc + float(x) * float(y)
        return acc
    qbits = sum((1 << j) for j in range(n_planes)
                if _seqdot(planes[j], query_vec) > 0)
    probes = {qbits}
    if probe_hamming >= 1:
        for j in range(n_planes):
            probes.add(qbits ^ (1 << j))
    if probe_hamming >= 2:
        for j in range(n_planes):
            for j2 in range(j + 1, n_planes):
                probes.add(qbits ^ (1 << j) ^ (1 << j2))
    bucketed = hyperplane_bucket(df, dim, n_planes, seed, vec_col)
    cand = bucketed.where(F.col("bucket").isin(list(probes)))
    return cosine_topk_bruteforce(cand, query_vec, id_col, vec_col, k)

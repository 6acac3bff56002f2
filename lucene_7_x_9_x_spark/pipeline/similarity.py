"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side arithmetic via
F.aggregate/F.zip_with — no Python in the loop); the LSH-bucketed variant is
the 100 TB path: candidates come from hyperplane buckets (multi-probe), so
per-query work is |bucket| not |corpus|, and bucketing is one shuffle that
can be reused across queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    # rank the k survivors only; partition by a non-foldable constant so
    # WindowExec doesn't log the no-partition warning (see searcher
    # ._rank_limited / facets._rank_top_labels)
    w = (Window.partitionBy(F.xxhash64(F.col(id_col)) % F.lit(1))
         .orderBy(F.desc("cosine"), F.col(id_col)))
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


def ivf_train(df: DataFrame, dim: int, n_centroids: int = 16,
              n_iters: int = 5, sample_size: int = 2048,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> np.ndarray:
    """Driver-side Lloyd k-means coarse quantizer (the IVF training step):
    deterministic sample (lowest ids), init = first n_centroids sample
    vectors, float64 L2 iterations; an emptied cluster keeps its previous
    centroid. The sample is tiny relative to the corpus — training cost is
    O(sample * centroids * iters) on the driver, assignment is the
    distributed pass."""
    rows = (df.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_size).collect())
    x = np.array([[float(v) for v in r[1]] for r in rows], dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError("sample smaller than n_centroids")
    cent = x[:n_centroids].copy()
    for _ in range(n_iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def _l2_to_centroid(vec_col: str, centroid: np.ndarray):
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add list_id = argmin_j ||v - c_j||^2 (first minimum on ties), all
    JVM-side: one left-folded distance expression per centroid, no Python
    in the row path. At 100 TB this is the single narrow pass that
    partitions the corpus into posting lists (write partitionBy(list_id)
    so probes prune at the file level)."""
    dists = F.array(*[_l2_to_centroid(vec_col, c) for c in centroids])
    return df.withColumn(
        "list_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))


def ivf_topk(assigned: DataFrame, centroids: np.ndarray,
             query_vec: list[float], k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """IVF search: probe the nprobe lists whose centroids are L2-closest to
    the query, brute-force cosine within them. Per-query work is
    |probed lists|, not |corpus|; nprobe = len(centroids) degenerates to
    exact search."""
    d2 = ((centroids - np.asarray(query_vec, dtype=np.float64)) ** 2).sum(1)
    probes = [int(j) for j in np.argsort(d2, kind="stable")[:nprobe]]
    cand = assigned.where(F.col("list_id").isin(probes))
    return cosine_topk_bruteforce(cand, query_vec, id_col, vec_col, k)


def ivf_write(assigned: DataFrame, path: str) -> None:
    """Materialize the IVF posting lists on disk, parquet-partitioned by
    list_id — the inverted-file layout itself: each coarse cell is its own
    directory, so a probe's scan plans with
    `PartitionFilters: [list_id IN (...)]` and reads ONLY the probed
    lists' files. This is the 100 TB serving shape: assignment runs once
    (one narrow JVM pass), and per-query I/O is nprobe/n_centroids of the
    corpus regardless of corpus size."""
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_topk_from_disk(spark, path: str, centroids: np.ndarray,
                       query_vec: list[float], k: int = 10, nprobe: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding"
                       ) -> DataFrame:
    """IVF search against an ivf_write() layout: the probed list_ids
    become partition filters (pruned at planning time — no data files of
    unprobed lists are opened), then brute-force cosine within the probed
    cells. Identical results to ivf_topk over the in-memory assignment."""
    d2 = ((centroids - np.asarray(query_vec, dtype=np.float64)) ** 2).sum(1)
    probes = [int(j) for j in np.argsort(d2, kind="stable")[:nprobe]]
    cand = (spark.read.parquet(path)
            .where(F.col("list_id").isin(probes)))
    return cosine_topk_bruteforce(cand, query_vec, id_col, vec_col, k)


def build_lsh_index(df: DataFrame, dim: int, n_planes: int = 8,
                    seed: int = 42, vec_col: str = "embedding"
                    ) -> DataFrame:
    """One-time corpus bucketing for LSH search: hyperplane bucket ids are
    computed ONCE, persisted, and eagerly materialized, so every subsequent
    query (or query batch) scans only the cached bucketed frame instead of
    re-running the 8x64-term bucketing expression over the corpus — the
    ivf_assign-shaped scale path (at 100 TB, write this out
    partitionBy('bucket') so probes prune at the file level)."""
    b = hyperplane_bucket(df, dim, n_planes, seed, vec_col).persist()
    b.count()
    return b


def auto_n_planes(n_vectors: int, target_bucket: int = 128) -> int:
    """Scale the hyperplane count with the corpus so expected bucket size
    stays ~target_bucket: n_planes = ceil(log2(n / target)). A FIXED
    plane count silently degrades to near-quadratic candidate sets as the
    corpus grows (Sum |bucket|^2 blocking cost); deriving it from corpus
    size keeps per-bucket work constant at any scale."""
    import math
    return max(2, math.ceil(math.log2(max(n_vectors / target_bucket, 2.0))))


def lsh_write(bucketed: DataFrame, path: str) -> None:
    """Materialize the LSH buckets on disk parquet-partitioned by bucket —
    the ivf_write-shaped serving layout: each bucket is its own directory,
    so a probe's scan plans with `PartitionFilters: [bucket IN (...)]` and
    opens ONLY the probed buckets' files. At 100 TB the bucketing pass
    runs once and per-query I/O is |probed buckets| / 2^n_planes of the
    corpus regardless of corpus size."""
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_from_disk(spark, path: str, query_vec: list[float], dim: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       k: int = 10, n_planes: int = 8,
                       probe_hamming: int = 1, seed: int = 42) -> DataFrame:
    """Multi-probe LSH search against an lsh_write() layout: the probed
    bucket ids become partition filters (pruned at planning time — no
    data files of unprobed buckets are opened), then brute-force cosine
    within the probed buckets. Identical results to cosine_topk_lsh over
    the in-memory bucketing (same planes, same probe set)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    probes = _probe_set(planes, query_vec, n_planes, probe_hamming)
    cand = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return cosine_topk_bruteforce(cand, query_vec, id_col, vec_col, k)


def _probe_set(planes: np.ndarray, query_vec, n_planes: int,
               probe_hamming: int) -> list[int]:
    """Multi-probe bucket ids for one query vector (driver-side).
    Sequential left-fold, NOT np.dot: matches bit-for-bit the IEEE-754
    evaluation order of both the Spark F.aggregate fold used for corpus
    vectors and a left-associated SQL sum, so query and corpus bucketing
    agree across engines even at sign boundaries."""
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
    return sorted(probes)


def cosine_topk_lsh(df: DataFrame, query_vec: list[float], dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    k: int = 10, n_planes: int = 8, probe_hamming: int = 1,
                    seed: int = 42,
                    bucketed: DataFrame | None = None) -> DataFrame:
    """Approximate cosine top-k: search only vectors whose hyperplane bucket
    is within `probe_hamming` bit-flips of the query's bucket (multi-probe
    LSH). Same output shape as the brute-force baseline.

    Pass bucketed=build_lsh_index(df, ...) to reuse a persisted corpus
    bucketing across queries (the hot-serving path); without it the corpus
    is re-bucketed on every call."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    probes = _probe_set(planes, query_vec, n_planes, probe_hamming)
    if bucketed is None:
        bucketed = hyperplane_bucket(df, dim, n_planes, seed, vec_col)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return cosine_topk_bruteforce(cand, query_vec, id_col, vec_col, k)


def cosine_topk_lsh_many(bucketed: DataFrame, queries: dict, dim: int,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         k: int = 10, n_planes: int = 8,
                         probe_hamming: int = 1, seed: int = 42
                         ) -> DataFrame:
    """Batched LSH search: MANY query vectors against one persisted bucketed
    corpus (build_lsh_index) in ONE Spark job. queries = {qid: vector}.
    Per query the probed buckets are computed driver-side; the (qid, bucket,
    qvec) probe table is broadcast-joined to the corpus, scored with the
    same JVM left-fold dot product, and reduced with one per-qid window
    top-k. Returns DataFrame(qid, rank, id, cosine)."""
    from pyspark.sql import Window
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    rows = []
    for qid, qv in queries.items():
        qv = [float(x) for x in qv]
        # np.dot (not a left fold) to match cosine_topk_bruteforce's query
        # norm bit-for-bit — the corpus-side folds stay sequential
        qn = float(np.sqrt(np.dot(qv, qv)))
        for bk in _probe_set(planes, qv, n_planes, probe_hamming):
            rows.append((str(qid), int(bk), qv, qn))
    spark = bucketed.sparkSession
    probe = spark.createDataFrame(
        rows, "qid string, bucket long, qvec array<double>, qnorm double")
    scored = (with_norm(bucketed, vec_col)
              .join(F.broadcast(probe), "bucket")
              .select("qid", F.col(id_col),
                      (_dot(F.col(vec_col), F.col("qvec"))
                       / (F.col("_norm") * F.col("qnorm"))).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "rank", id_col, "cosine"))


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------
def pq_train(df: DataFrame, dim: int, m: int = 8, ksub: int = 16,
             n_iters: int = 5, sample_size: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> np.ndarray:
    """Driver-side product-quantization codebooks (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): the vector is
    split into m contiguous subspaces of dim/m and each subspace gets
    its own ksub-centroid Lloyd quantizer — same deterministic recipe as
    ivf_train (lowest-id sample, first-k init, emptied cluster keeps its
    centroid). Returns float64 (m, ksub, dim//m).

    The memory story at 100 TB: a 64-dim float32 vector is 256 bytes;
    its PQ code is m bytes (m=8 -> 32x smaller), so the scored side of
    an ANN pass fits in a fraction of the footprint and the full-vector
    read happens only for the final re-rank candidates."""
    if dim % m:
        raise ValueError("dim must be divisible by m")
    dsub = dim // m
    rows = (df.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_size).collect())
    x = np.array([[float(v) for v in r[1]] for r in rows],
                 dtype=np.float64)
    if len(x) < ksub:
        raise ValueError("sample smaller than ksub")
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        cent = xs[:ksub].copy()
        for _ in range(n_iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(ksub):
                msk = assign == j
                if msk.any():
                    cent[j] = xs[msk].mean(axis=0)
        books[s] = cent
    return books


def _sub_sqdist(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Squared L2 between rows of x and rows of cent, accumulated
    SEQUENTIALLY over dimensions (left fold, first term first) so the
    result is bit-identical to a generated left-associated SQL sum —
    np.sum's pairwise summation would differ in the low bits."""
    d = (x[:, None, 0] - cent[None, :, 0]) ** 2
    for j in range(1, x.shape[1]):
        d = d + (x[:, None, j] - cent[None, :, j]) ** 2
    return d


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              extra_cols: tuple = ()) -> DataFrame:
    """Encode vectors to m-byte PQ codes: per subspace, the index of the
    L2-nearest codebook row (first minimum on ties — numpy argmin and
    the oracle's ORDER BY dist, j agree). Arrow-batched pandas UDF: the
    argmin over ksub centroids is a vectorized numpy pass per batch;
    returns (id, codes array<int>)."""
    from pyspark.sql.functions import pandas_udf
    m, ksub, dsub = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = np.array([list(e) for e in v], dtype=np.float64)
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            d = _sub_sqdist(x[:, s * dsub:(s + 1) * dsub], books[s])
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), *extra_cols,
                     encode(F.col(vec_col)).alias("codes"))


def pq_adc_topk(codes_df: DataFrame, codebooks: np.ndarray,
                query_vec: list[float], k: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's per-subspace
    distance table (m x ksub float64, computed once on the driver with
    the same sequential fold) is inlined as literal arrays, and each
    row's distance is the left-folded sum of m table lookups — pure JVM
    expressions over the m-byte codes, the full vectors are never read.
    Returns (rank, id, adist) ordered (adist asc, id asc)."""
    from pyspark.sql import Window
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    luts = []
    for s in range(m):
        luts.append(_sub_sqdist(q[None, s * dsub:(s + 1) * dsub],
                                codebooks[s])[0])
    # dist = ((lut0[c0] + lut1[c1]) + ...) — explicit left association,
    # matching the oracle's written-out + chain
    def lk(s):
        arr = F.array(*[F.lit(float(v)) for v in luts[s]])
        return F.element_at(arr,
                            F.element_at(F.col("codes"), s + 1) + 1)
    dist = lk(0)
    for s in range(1, m):
        dist = dist + lk(s)
    scored = codes_df.select(F.col(id_col), dist.alias("adist"))
    top = scored.orderBy("adist", id_col).limit(k)
    w = (Window.partitionBy(F.xxhash64(F.col(id_col)) % F.lit(1))
         .orderBy("adist", F.col(id_col)))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", id_col, "adist"))


def ivfpq_topk(coded: DataFrame, centroids: np.ndarray,
               codebooks: np.ndarray, query_vec: list[float],
               k: int = 10, nprobe: int = 4, rerank: int = 0,
               vectors: DataFrame | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """IVF-PQ search — the full billion-scale ANN composition (Jégou et
    al. 2011 IVFADC; what FAISS serves with): `coded` carries
    (id, list_id, codes) from ivf_assign + pq_encode — m bytes per
    vector instead of 4*dim. Probe the nprobe closest coarse cells,
    rank candidates by ADC table lookups over the codes, and (optional)
    exactly re-rank the top `rerank` codes-ranked candidates with their
    full vectors.

    Scale shape: per-query work is (nprobe/n_cells) * corpus CODE reads
    (32x smaller than vectors; partition the coded table by list_id on
    disk and probes prune at planning time like ivf_topk_from_disk);
    the re-rank join touches only `rerank` full vectors via a broadcast
    semi-join — the vector table is never shuffled. Returns
    (rank, id, score) where score = adist (rerank=0) or exact cosine
    (rerank>0); ties id asc."""
    from pyspark.sql import Window
    d2 = ((centroids - np.asarray(query_vec, dtype=np.float64)) ** 2).sum(1)
    probes = [int(j) for j in np.argsort(d2, kind="stable")[:nprobe]]
    cand = coded.where(F.col("list_id").isin(probes))
    n1 = max(k, rerank) if rerank else k
    approx = pq_adc_topk(cand, codebooks, query_vec, k=n1, id_col=id_col)
    if not rerank:
        return approx.select("rank", id_col,
                             F.col("adist").alias("score"))
    if vectors is None:
        raise ValueError("rerank > 0 needs the full `vectors` table")
    ids = approx.select(id_col)
    full = vectors.join(F.broadcast(ids), id_col, "left_semi")
    return (cosine_topk_bruteforce(full, query_vec, id_col, vec_col, k)
            .select("rank", id_col, F.col("cosine").alias("score")))

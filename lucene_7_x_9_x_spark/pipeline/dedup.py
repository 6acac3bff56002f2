"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in pyspark.sql.functions (JVM, whole-stage codegen);
no Python UDFs. Designed for 100 TB corpora: every pairwise step goes
through an inverted/blocking join (never a cross join), hot shingles are
droppable via a doc-frequency cap, and all shuffles key on bounded-size
join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = "[^a-z0-9_]+"


def tokens_col(text_col: str):
    """Analyzer-equivalent token array (lowercase word chars), JVM-side."""
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda x: x != "")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: every doc annotated with the size of its
    duplicate group. Single hash-shuffle; at scale the groupBy key is the
    64-hex sha — uniformly distributed, no skew."""
    h = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha"))
    sizes = h.groupBy("sha").agg(F.count("*").alias("dup_count"))
    return (h.join(sizes, "sha")
            .select(F.col(id_col), "sha", "dup_count"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3
             ) -> DataFrame:
    """(id, shingle) pairs: n-gram shingles over analyzer tokens.

    The repartition after tokenization is load-bearing twice over: it
    spreads the regex-tokenize across all cores even when the source is a
    single parquet file (one scan partition), and it is an exchange
    barrier that stops CollapseProject from inlining the tokenize
    expression into the per-shingle transform lambda (which would
    re-tokenize the full text once per shingle — quadratic per doc)."""
    toks = (df.select(F.col(id_col), tokens_col(text_col).alias("ts"))
            .repartition(df.sparkSession.sparkContext.defaultParallelism))
    # guard: sequence(0, -1) would DESCEND in Spark, so gate on size >= n
    idxs = F.when(F.size("ts") >= n,
                  F.sequence(F.lit(0), F.size("ts") - n)
                  ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        F.col(id_col),
        F.explode(F.transform(
            idxs, lambda i: F.concat_ws(" ", F.slice("ts", i + 1, n))
        )).alias("shingle"))
    return sh.distinct()


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index self-join
    (scalable: candidate generation is |pairs sharing a shingle|, never a
    cross join). Returns (id_a, id_b) with id_a < id_b and
    jaccard >= threshold.

    max_shingle_df drops shingles shared by more than that many docs (stop-
    shingle cap — the skew guard for 100 TB runs; exactness then holds for
    pairs that share at least one sub-cap shingle, which a threshold >= 0.5
    implies unless every common shingle is a stop-shingle). It defaults ON:
    one hot shingle otherwise makes the candidate join quadratic in its
    doc frequency. Pass None to disable (exact mode for small corpora)."""
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").count()
               .where(F.col("count") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sz_a, "id_a").join(sz_b, "id_b")
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b"))


# MinHash + banded LSH -----------------------------------------------------

_MERSENNE = (1 << 31) - 1  # 31-bit prime: a*h stays well inside int64


def md5_hash31(col):
    """31-bit hash of a string column derived from md5 hex — chosen over
    xxhash64 because every SQL engine has md5, so DuckDB/Trino oracles can
    reproduce signatures bit-for-bit (same model as textstats.fingerprint).
    Spark's conv(hex,16,10) of 8 hex chars < 2^32 fits a long exactly."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(_MERSENNE))


def md5_hash60(col):
    """60-bit positive hash (15 md5 hex chars): the widest md5 prefix that
    stays clear of long sign/overflow in both Spark ANSI mode and SQL
    oracles."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash_params(num_hashes: int, seed: int = 42):
    """Deterministic affine hash params (a*x+b) mod p."""
    import numpy as np
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 32, seed: int = 42,
                       shingles_df: DataFrame | None = None) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures over md5-derived 31-bit
    shingle hashes. One explode + one groupBy; the per-hash mins are
    computed as JVM aggregate expressions (no Python). Pass shingles_df to
    reuse an already-materialized (id, shingle) frame."""
    a, b = _hash_params(num_hashes, seed)
    sh = (shingles_df if shingles_df is not None
          else shingles(df, id_col, text_col, n)).select(
        F.col(id_col), md5_hash31(F.col("shingle")).alias("h"))
    aggs = [F.min(F.pmod(F.col("h") * F.lit(a[i]) + F.lit(b[i]),
                         F.lit(_MERSENNE))).alias(f"m{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(F.col(id_col),
                      F.array(*[f"m{i}" for i in range(num_hashes)])
                      .alias("sig"))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5, seed: int = 42) -> DataFrame:
    """Near-dup pairs: banded LSH candidate join, then exact verification
    of the candidates with n-gram Jaccard (so output has no false
    positives; recall is the LSH S-curve at `bands`)."""
    rows_per_band = num_hashes // bands
    # one shingle pass serves both the signatures and the exact verify.
    # The persist lives until the session drops it (a dedup pass is a
    # once-per-corpus job); call .unpersist() on blocks explicitly if you
    # run many passes in one long-lived session. The count() materializes
    # the cache EAGERLY: the downstream plan scans this frame three times
    # (signatures + both sides of the verify join), and with a lazy persist
    # those scans race each other before the cache is populated, each
    # recomputing the shingles from scratch (the r2 cold-plan regression)
    sh = shingles(df, id_col, text_col, n).persist()
    sh.count()
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed,
                             shingles_df=sh)
    banded = sig.select(
        F.col(id_col),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band"),
                md5_hash60(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", i * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string")))).alias("bh"))
        )).alias("bb")).select(id_col, "bb.band", "bb.bh")
    l = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    r = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    cand = (l.join(r, ["band", "bh"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    # exact verify candidates (reuses the persisted shingle frame)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"),
                  F.col("shingle").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"),
                  F.col("shingle").alias("sh_b"))
    inter = (cand.join(a, "id_a").join(
        b.withColumnRenamed("sh_b", "sh_a"), ["id_b", "sh_a"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.select(F.col(id_col).alias("id_a"),
                              F.col("sz").alias("sz_a")), "id_a")
           .join(sizes.select(F.col(id_col).alias("id_b"),
                              F.col("sz").alias("sz_b")), "id_b")
           .withColumn("jaccard",
                       F.col("inter")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b"))
    return out


def embedding_neardup_pairs(df: DataFrame, dim: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.4,
                            n_planes: int | None = 6,
                            seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH blocking
    (same-bucket candidates — per-plane collision probability 1 - θ/π, so
    near-identical vectors almost always share a bucket) followed by exact
    cosine verification of the candidates. Candidate generation is
    Σ |bucket|² / 2, never a cross join; dot products and norms are
    sequential left folds so SQL oracles reproduce the threshold test
    bit-for-bit. Returns (id_a, id_b, cosine is dropped) with id_a < id_b.

    n_planes=None derives the plane count from the corpus size
    (similarity.auto_n_planes: one narrow count, then ceil(log2(n/128)))
    so expected bucket size — and with it the quadratic-in-bucket
    candidate cost — stays constant as the corpus grows; a fixed small
    default silently degrades toward all-pairs at 100 TB."""
    from .similarity import _dot, auto_n_planes, hyperplane_bucket, with_norm
    if n_planes is None:
        n_planes = auto_n_planes(df.count())
    b = with_norm(hyperplane_bucket(df, dim, n_planes, seed, vec_col),
                  vec_col)
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"),
                    F.col("_norm").alias("na"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vb"),
                     F.col("_norm").alias("nb"), "bucket")
    return (left.join(right, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .where(_dot(F.col("va"), F.col("vb"))
                   / (F.col("na") * F.col("nb")) >= threshold)
            .select("id_a", "id_b"))


SIMHASH_BITS = 60  # md5-prefix hash width (see md5_hash60)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash over analyzer tokens (tf-weighted bit votes), fully
    JVM-side. 60 effective bits from an md5-derived token hash (oracle-
    reproducible in any SQL engine; bits 60-63 are always 0).

    Shuffle volume is exactly the (doc, token) tf frame: the per-bit votes
    are folded into one groupBy with 60 conditional-sum aggregate
    expressions — never an explode of one row per bit."""
    # same single-scan-partition guard as shingles(): parallelize the
    # tokenize before the explode fan-out
    tf = (df.select(F.col(id_col), tokens_col(text_col).alias("ts"))
          .repartition(df.sparkSession.sparkContext.defaultParallelism)
          .select(F.col(id_col), F.explode("ts").alias("tok"))
          .groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
          .withColumn("h", md5_hash60(F.col("tok"))))
    votes = [F.sum(F.when(F.shiftright("h", i).bitwiseAND(1) == 1,
                          F.col("tf")).otherwise(-F.col("tf")))
             .alias(f"v{i}") for i in range(SIMHASH_BITS)]
    v = tf.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return v.select(F.col(id_col), sim.cast("long").alias("simhash"))


# Connected components over near-dup pairs ---------------------------------
#
# A dedup pipeline's last mile: pair lists (from minhash_lsh_pairs /
# ngram_jaccard_pairs / embedding_neardup_pairs) -> duplicate CLUSTERS ->
# one representative kept per cluster. Transitivity matters at corpus
# scale: A~B and B~C must collapse to ONE kept doc even when A~C was never
# emitted as a pair (the LSH S-curve misses some edges inside a cluster).


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id, component) labels for every node appearing in `pairs`
    (columns id_a, id_b); component = the MIN node id of its connected
    component.

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): converges in
    O(log^2 n) rounds on any graph (in practice 2-4 for dedup graphs,
    whose components are near-cliques). Each round is two groupBy+join
    passes over the CURRENT edge set — never materializes a transitive
    closure, so it scales to billions of edges:

      large-star(u): for every neighbor v > u, connect v to
                     m = min(N(u) + {u})
      small-star(u): orient edges toward the larger endpoint; connect
                     every smaller neighbor (and u itself) to m = min(N(u))

    Both steps strictly shrink the sum of component-internal distances to
    the minimum; a fixpoint is a star forest rooted at component minima.
    Iteration state is localCheckpoint()ed: without it the lineage doubles
    per round and Catalyst re-analyzes an exponentially growing plan.
    The convergence probe compares a commutative (count, xor of row
    hashes) signature of consecutive edge sets — one tiny aggregate, no
    driver-side edge materialization."""
    edges = (pairs.select(F.col("id_a").cast("long").alias("u"),
                          F.col("id_b").cast("long").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())

    def _sig(e: DataFrame):
        # xor-fold, not sum: commutative like sum but cannot overflow
        # int64 (Spark ANSI mode throws on sum overflow at scale)
        r = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).first()
        return (r["n"], r["h"])

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (sym.join(m, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v")).distinct())

    def small_star(e: DataFrame) -> DataFrame:
        # orient every edge toward its larger endpoint
        o = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (o.join(m, "u")
               .where(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
        self_e = m.select(F.col("u"), F.col("m").alias("v"))
        return (nbr.union(self_e)
                .where(F.col("u") != F.col("v")).distinct())

    prev = None
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        sig = _sig(edges)
        if sig == prev:
            break
        prev = sig
    # fixpoint edges are (node -> component min) stars; the minima
    # themselves label each component
    labels = edges.union(
        edges.select(F.col("v").alias("u"), F.col("v").alias("v")))
    return (labels.distinct()
            .select(F.col("u").alias("id"), F.col("v").alias("component")))


def neardup_clusters(df: DataFrame, pairs: DataFrame, id_col: str
                     ) -> DataFrame:
    """Every doc labeled with (component, keep): component = min doc id of
    its near-dup cluster (docs in no pair are their own singleton
    component), keep = true for exactly the one representative (the min)
    per cluster — filter on keep to materialize the deduplicated corpus.

    The label frame is |nodes-in-pairs| rows — tiny next to the corpus —
    so the final annotate is a broadcast-able left join keyed on the doc
    id; the 100 TB side is never shuffled."""
    cc = connected_components(pairs).withColumnRenamed("id", id_col)
    return (df.select(id_col)
            .join(F.broadcast(cc), id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("component", F.col(id_col)).alias("component"))
            .withColumn("keep", (F.col(id_col) == F.col("component")))
            )

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


TOKEN_MATCH = "[a-z0-9_]+"  # complement of TOKEN_SPLIT: match the tokens


def tokens_col(text_col: str):
    """Analyzer-equivalent token array (lowercase word chars), JVM-side.

    regexp_extract_all of the token class — NOT split-on-separators +
    filter(!= ""): identical output (match-the-tokens is the complement
    of split-on-gaps with empties dropped; property-checked corpus-wide),
    but the filter() lambda made every tokenize call an INTERPRETED
    higher-order function at ~2 ms/doc — 96 s CPU for one sf1.0 pass vs
    1.6 s for this codegen'd form (guide §4.1: built-ins over lambdas).
    Every pipeline op inherits the 50x: this expression is the shared
    tokenizer for dedup/decontam/textstats/classify/freetext."""
    return F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_MATCH), 0)


def _keep_here(cond):
    """Filter wrapper that stays WHERE IT IS WRITTEN. Predicate pushdown
    substitutes a condition on a derived column with the column's
    defining expression and sinks it below every exchange — for a filter
    like size(shs) > 0 that means the whole tokenize+shingle pipeline is
    re-evaluated at the parquet scan, which for a single-file corpus is
    ONE partition: the entire corpus analyzed on one core (measured 114 s
    vs 6 s at sf1.0). The OR'd disjunct is always false (partition-local
    row ids are non-negative), so the predicate's value is exactly
    `cond`, but it makes the WHOLE predicate non-deterministic, which
    the optimizer may not move past an exchange (guide §4.4's
    asNondeterministic fix, applied to a filter; plan-verified). An AND
    conjunct would not work (pushdown splits conjunctions and sinks the
    deterministic half), and rand() would not either (Spark 4 constant-
    folds provably-false rand comparisons)."""
    return cond | (F.monotonically_increasing_id() < F.lit(0))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: every doc annotated with the size of its
    duplicate group. Single hash-shuffle; at scale the groupBy key is the
    64-hex sha — uniformly distributed, no skew."""
    h = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha"))
    sizes = h.groupBy("sha").agg(F.count("*").alias("dup_count"))
    return (h.join(sizes, "sha")
            .select(F.col(id_col), "sha", "dup_count"))


def window_pattern(n: int) -> str:
    """Regex producing every POSITIONAL n-token window of a space-joined
    token string: at ^ and after each space, a lookahead CAPTURES the
    next n tokens without consuming them, so windows overlap. Token
    chars are exactly [a-z0-9_] (tokens_col), so the separators are
    unambiguous. Output is bit-identical to the per-index
    transform(sequence(...), concat_ws(slice(...))) form
    (property-checked corpus-wide incl. repeated windows), but runs as
    ONE codegen'd regex pass instead of an interpreted per-window
    lambda — 5.6 s vs 56 s CPU for an sf1.0 pass (guide §4.1)."""
    return "(?:^| )(?=(" + " ".join([TOKEN_MATCH] * n) + "))"


def doc_windows(df: DataFrame, id_col: str, text_col: str, n: int = 3
                ) -> DataFrame:
    """(id, ws: array<string>) — each doc's POSITIONAL n-token windows as
    ONE array row, in token order (duplicates kept). Entirely narrow
    (scan-stage): windows are a per-doc computation, so materializing
    them as exploded rows and shuffling them (the r5 shape: explode +
    distinct exchange over ~200 bytes/shingle of strings) moved
    corpus-sized data for a decision that never leaves the row (guide
    §2.3/§2.4 — remove shuffles outright).

    The repartition comes BEFORE the tokenize select: projections do not
    collapse across a repartition, so every expression written after the
    exchange runs at full parallelism. The r5 shape tokenized first and
    repartitioned after — the Project carrying the regex split stays
    BELOW the exchange, i.e. on the SCAN's partitioning, which for a
    single-file corpus is one core for the whole corpus (plan-verified;
    the shingle fan-out was spread, the tokenize was not)."""
    base = (df.select(F.col(id_col), F.col(text_col))
            .repartition(df.sparkSession.sparkContext.defaultParallelism))
    toks = base.select(F.col(id_col), tokens_col(text_col).alias("ts"))
    return toks.select(
        F.col(id_col),
        F.regexp_extract_all(F.concat_ws(" ", "ts"),
                             F.lit(window_pattern(n)), 1).alias("ws"))


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3
                 ) -> DataFrame:
    """(id, shs: array<string>) — each doc's DISTINCT n-gram shingle set
    as ONE array row (doc_windows + per-doc array_distinct)."""
    return doc_windows(df, id_col, text_col, n).select(
        F.col(id_col), F.array_distinct("ws").alias("shs"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3
             ) -> DataFrame:
    """(id, shingle) pairs: distinct n-gram shingles over analyzer tokens.
    A narrow explode of doc_shingles — per-doc array_distinct replaces the
    r5 corpus-wide distinct() exchange (same row set: shingle sets are
    per-doc, cross-doc duplicates were never merged)."""
    return doc_shingles(df, id_col, text_col, n).select(
        F.col(id_col), F.explode("shs").alias("shingle"))


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


def _sig_expr(num_hashes: int, a: list, b: list, col: str = "shs"):
    """Per-row MinHash signature expression over a bound shingle-array
    column: ONE md5 per element (the transform is the aggregate's child
    array, so it is evaluated once per row), then a 32-wide running-min
    fold — the affine params ride a single array literal packed
    (a << 31 | b) so the inner zip_with needs no per-element array
    construction. Bit-identical to the r5 groupBy(min) form whether the
    column is distinct shingles or positional windows: min is order- and
    duplicate-independent, and every affine value stays inside
    [0, MERSENNE) (h*a < 2^62 — ANSI-safe)."""
    ab = F.lit([int((ai << 31) | bi) for ai, bi in zip(a, b)])
    mask = F.lit((1 << 31) - 1)
    hs = F.transform(F.col(col), lambda s: md5_hash31(s))
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    return F.aggregate(
        hs, init,
        lambda acc, h: F.zip_with(
            acc, ab,
            lambda m, p: F.least(m, F.pmod(
                h * F.shiftright(p, 31) + p.bitwiseAND(mask),
                F.lit(_MERSENNE)))))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 32, seed: int = 42,
                       shingles_df: DataFrame | None = None,
                       doc_shingles_df: DataFrame | None = None
                       ) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures over md5-derived 31-bit
    shingle hashes. Fully narrow (no shuffle): signatures are per-doc
    folds over the doc_shingles array — the r5 explode + 32-min groupBy
    shuffled the whole (id, shingle) frame to compute a per-row quantity
    (guide §2.4). Pass doc_shingles_df to reuse an already-materialized
    (id, shs) frame; shingles_df (exploded rows) keeps the legacy
    groupBy path for callers holding that shape."""
    a, b = _hash_params(num_hashes, seed)
    if shingles_df is not None:
        sh = shingles_df.select(
            F.col(id_col), md5_hash31(F.col("shingle")).alias("h"))
        aggs = [F.min(F.pmod(F.col("h") * F.lit(a[i]) + F.lit(b[i]),
                             F.lit(_MERSENNE))).alias(f"m{i}")
                for i in range(num_hashes)]
        sig = sh.groupBy(id_col).agg(*aggs)
        return sig.select(F.col(id_col),
                          F.array(*[f"m{i}" for i in range(num_hashes)])
                          .alias("sig"))
    feat = (doc_shingles_df if doc_shingles_df is not None
            else doc_shingles(df, id_col, text_col, n))
    # empty shingle sets fold to the init sentinel — drop them to match
    # the groupBy form (no rows -> no group)
    return (feat.where(_keep_here(F.size("shs") > 0))
            .select(F.col(id_col),
                    _sig_expr(num_hashes, a, b).alias("sig")))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5, seed: int = 42) -> DataFrame:
    """Near-dup pairs: banded LSH candidate join, then exact verification
    of the candidates with n-gram Jaccard (so output has no false
    positives; recall is the LSH S-curve at `bands`)."""
    rows_per_band = num_hashes // bands
    a, b = _hash_params(num_hashes, seed)
    spark = df.sparkSession
    sp = spark.sparkContext.defaultParallelism
    id_type = {f.name: f.dataType.simpleString()
               for f in df.schema.fields}[id_col]
    n_, nh, nb, rpb, M = n, num_hashes, bands, rows_per_band, _MERSENNE
    a_, b_ = list(a), list(b)

    def band_kernel(batches):
        """Per-doc windows -> md5 31-bit hashes -> 32 affine mins -> 8
        band hashes, in ONE Arrow pass (hashlib + numpy). Bit-identical
        to the SQL-expression form: md5 is md5, int(hex,16) == conv(hex,
        16,10), % == pmod on non-negatives, and h*a+b < 2^62 in int64.
        The JVM-builtin formulation of the same math ran as interpreted
        higher-order lambdas at ~30 us/element — 120 s CPU at sf1.0 vs
        ~12 s for this kernel (guide §4.2: hand whole batches to native
        code); token-less docs drop here like the r5 groupBy dropped
        them (no rows -> no group)."""
        import hashlib
        import numpy as np
        import pyarrow as pa
        A = np.array(a_, dtype=np.int64)
        B = np.array(b_, dtype=np.int64)
        out_t = pa.list_(pa.int64())
        for batch in batches:
            ids = batch.column(0)
            ts = batch.column(1).to_pylist()
            keep, bands_out = [], []
            for row_i, toks in enumerate(ts):
                m = len(toks) - n_ + 1
                if m <= 0:
                    continue
                ws = {" ".join(toks[i:i + n_]) for i in range(m)}
                h = np.fromiter(
                    (int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % M
                     for w in ws), np.int64, len(ws))
                sig = ((h[:, None] * A[None, :] + B[None, :]) % M).min(0)
                bh = [int(hashlib.md5(",".join(
                    str(int(x)) for x in sig[i * rpb:(i + 1) * rpb])
                    .encode()).hexdigest()[:15], 16) for i in range(nb)]
                keep.append(row_i)
                bands_out.append(bh)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(keep, type=pa.int32())),
                 pa.array(bands_out, type=out_t)],
                [id_col, "bands"])

    feats = (df.select(F.col(id_col), F.col(text_col))
             .repartition(sp)
             .select(F.col(id_col), tokens_col(text_col).alias("ts"))
             .mapInArrow(band_kernel,
                         f"{id_col} {id_type}, bands array<bigint>")
             .persist())
    banded = feats.select(F.col(id_col),
                          F.posexplode("bands").alias("band", "bh"))
    l = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    r = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    cand = (l.join(r, ["band", "bh"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    # the candidate PAIR set is consumed four times below (both sides of
    # the id filter + the inter join) — persist it or every consumer
    # re-runs the banded self-join from scratch (measured 127 s without
    # it). Both persists are LAZY: concurrent first consumers may
    # overlap-compute a partition before the cache fills, but that costs
    # bounded duplicate work on otherwise-idle cores, while an eager
    # count() is a full serial job barrier — interleaved A/B at sf1.0:
    # lazy-both 3.44 s vs eager-both 3.81 s median, identical output.
    cand = cand.persist()
    # exact verify: only CANDIDATE docs' shingle sets are ever built as
    # rows — the r5 shape ran the inter-join over the full corpus-sized
    # (id, shingle) frame; candidates are output-scale (guide §2.3:
    # shuffle fewer bytes — semi-join the heavy side down first). The
    # semi-join broadcasts the tiny id set, so the corpus is re-SCANNED
    # (cheap, pruned) but never shuffled.
    cids = (cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct())
    vdocs = (df.select(F.col(id_col), F.col(text_col))
             .join(F.broadcast(cids), id_col, "left_semi"))
    vfeat = doc_shingles(vdocs, id_col, text_col, n).persist()
    sizes = vfeat.select(F.col(id_col), F.size("shs").alias("sz"))
    vsh = vfeat.select(F.col(id_col), F.explode("shs").alias("shingle"))
    va = vsh.select(F.col(id_col).alias("id_a"),
                    F.col("shingle").alias("sh_a"))
    vb = vsh.select(F.col(id_col).alias("id_b"),
                    F.col("shingle").alias("sh_b"))
    inter = (cand.join(va, "id_a").join(
        vb.withColumnRenamed("sh_b", "sh_a"), ["id_b", "sh_a"])
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

    Fully narrow (no shuffle): the tf-weighted vote for bit i equals the
    sum of +/-1 over token OCCURRENCES (sum_t tf(t)*sign_i(t) ==
    sum_occurrences sign_i(tok)), so each doc's 60 votes are per-row
    integer folds over its own md5'd token array — the r5 shape shuffled
    the corpus-sized (doc, token, tf) frame twice (explode + groupBy(id,
    tok), then groupBy(id)) to compute a per-row quantity (guide §2.4)."""
    sp = df.sparkSession.sparkContext.defaultParallelism
    # token-less docs drop (the r5 groupBy had no rows for them): a doc
    # has >= 1 token iff lower(text) contains a [a-z0-9_] char, so the
    # exclusion is a cheap rlike SCAN predicate instead of a size(ts)
    # filter that pushdown would sink — tokenize included — into the
    # one-partition scan. The repartition of the RAW text then lets the
    # tokenize run post-exchange at full parallelism (see doc_shingles).
    toks = (df.select(F.col(id_col), F.col(text_col))
            .where(F.lower(F.col(text_col)).rlike("[a-z0-9_]"))
            .repartition(sp)
            .select(F.col(id_col), tokens_col(text_col).alias("ts")))
    # separate select: `hs` (one md5 per occurrence) stays its own Project
    # below the 60 per-bit folds — Spark 4's CollapseProject does not
    # duplicate non-cheap multi-referenced expressions (plan-verified)
    hsf = toks.select(F.col(id_col),
                      F.transform("ts", lambda t: md5_hash60(t))
                      .alias("hs"))
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    neg = F.lit(-1).cast("long")

    def _vote(i):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(1) == 1, one).otherwise(neg)

    votes = [F.aggregate("hs", zero, _vote(i))
             for i in range(SIMHASH_BITS)]
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(votes[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return hsf.select(F.col(id_col), sim.cast("long").alias("simhash"))


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

"""Benchmark harness: index build + headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
plus informational keys (docs_per_sec etc.). Run scripts/scaling.py for the
two-parallelism scaling-efficiency evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "40000"))
BM25_RUNS = int(os.environ.get("SPARK_GRAFT_BM25_RUNS", "5"))
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))


def main():
    from pyspark.sql import SparkSession, functions as F
    t_all = time.time()
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("lucene-spark-bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_7_x_9_x_spark.index import build_index, IndexSnapshot
    from lucene_7_x_9_x_spark.searcher import Searcher
    from lucene_7_x_9_x_spark.plans.query import (BooleanQuery, Occur,
                                                  PhraseQuery, TermQuery)
    from lucene_7_x_9_x_spark.sources.corpus import synth_corpus
    from lucene_7_x_9_x_spark.pipeline import dedup, similarity, textstats

    q: dict[str, float] = {}
    extra: dict = {"sf_dir": SF_DIR, "cpus": CPUS}
    tmp = tempfile.mkdtemp(prefix="lucene_bench_")

    def _env_sample() -> dict:
        """Contention telemetry: /proc/loadavg counts runnable threads
        HOST-wide (co-tenant load shows here while this pid namespace is
        idle), and cpu 'steal' jiffies count time the hypervisor gave our
        vCPUs to someone else.  Recorded so a reader can tell an inflated
        run from a regression."""
        out = {}
        try:
            out["loadavg_1m"] = float(
                open("/proc/loadavg").read().split()[0])
            cpu = open("/proc/stat").readline().split()
            out["cpu_jiffies_total"] = sum(int(x) for x in cpu[1:])
            out["cpu_jiffies_steal"] = int(cpu[8])
        except (OSError, IndexError, ValueError):
            pass
        return out

    env0 = _env_sample()

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        q[name] = round(time.time() - t0, 3)
        return out

    def timedq(name, fn):
        """Median-of-QUERY_REPS for STATELESS read ops.  This box shows
        bursty external CPU steal (vmstat st 2-4% with load from outside
        the pid namespace); a single-shot latency that catches a burst
        records a phantom 5-20x regression on one arbitrary op.  The
        median of 3 back-to-back runs recovers the steady-state number a
        quiet machine would give, and on a quiet machine equals the
        single-shot value.  Stateful ops (index/LSH builds, warmups, ops
        with internal persists whose rerun would measure a warm cache)
        keep the single-shot `timed` so their semantics match earlier
        rounds."""
        runs = []
        out = None
        for _ in range(QUERY_REPS):
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        q[name] = round(sorted(runs)[len(runs) // 2], 3)
        return out

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_docs = docs.count()

    # ---- index build on the sf documents table -------------------------
    idx = timed("index_build_documents", lambda: build_index(
        spark, docs, os.path.join(tmp, "idx_docs"), id_cols=["doc_id"],
        text_col="text", num_segments=CPUS))
    extra["documents_rows"] = n_docs
    extra["documents_docs_per_sec"] = round(
        n_docs / q["index_build_documents"], 1)

    # ---- index build on the synthetic F1 corpus (throughput headline) --
    corpus = synth_corpus(spark, SYNTH_DOCS).cache()
    n_synth = corpus.count()  # materialize so build timing excludes gen
    sidx = timed("index_build_synth", lambda: build_index(
        spark, corpus, os.path.join(tmp, "idx_synth"),
        id_cols=["repo", "path", "commit"], text_col="content",
        num_segments=CPUS * 2))
    corpus.unpersist()
    extra["synth_rows"] = n_synth
    extra["synth_docs_per_sec"] = round(n_synth / q["index_build_synth"], 1)
    extra["synth_tokens"] = sidx.stats["sum_total_term_freq"]

    searcher = Searcher(idx)
    s_syn = Searcher(sidx)

    # ---- BM25 query latency (p50 over repeats) -------------------------
    def bm25_once():
        return searcher.search(BooleanQuery(
            [(Occur.SHOULD, TermQuery("filter")),
             (Occur.SHOULD, TermQuery("join")),
             (Occur.SHOULD, TermQuery("window"))]), 10).collect()

    lat = []
    for _ in range(BM25_RUNS):
        t0 = time.time()
        bm25_once()
        lat.append(time.time() - t0)
    lat.sort()
    q["bm25_top10_p50"] = round(lat[len(lat) // 2], 3)
    extra["bm25_top10_latencies"] = [round(x, 3) for x in lat]

    timedq("bm25_conj_top10", lambda: searcher.search(BooleanQuery(
        [(Occur.MUST, TermQuery("group")), (Occur.MUST, TermQuery("query"))]),
        10).collect())
    timedq("bm25_synth_top10", lambda: s_syn.search(BooleanQuery(
        [(Occur.SHOULD, TermQuery("return")), (Occur.SHOULD, TermQuery("def")),
         (Occur.SHOULD, TermQuery("mutex"))]), 10).collect())
    timedq("phrase", lambda: searcher.search(
        PhraseQuery(["the", "fast"]), 10).collect())
    timedq("sloppy_phrase", lambda: searcher.search(
        PhraseQuery(["the", "fast"], slop=2), 10).collect())
    from lucene_7_x_9_x_spark.plans.query import (MultiPhraseQuery,
                                                  WildcardPhraseQuery)
    timedq("multi_phrase", lambda: searcher.search(MultiPhraseQuery(
        (("fast", "slow"), ("scan",))), 10).collect())
    timedq("wildcard_phrase", lambda: searcher.search(
        WildcardPhraseQuery(("s*", "scan")), 10).collect())
    timedq("term_count", lambda: searcher.count(TermQuery("filter")))
    from lucene_7_x_9_x_spark.plans.parser import parse
    timedq("parsed_query_top10", lambda: searcher.search(
        parse('group AND query OR window'), 10).collect())
    cls = Searcher(idx, similarity="classic")
    timedq("classic_top10", lambda: cls.search(BooleanQuery(
        [(Occur.SHOULD, TermQuery("filter")),
         (Occur.SHOULD, TermQuery("join")),
         (Occur.SHOULD, TermQuery("window"))]), 10).collect())

    # query throughput: 32 queries fused into one job (search_many)
    import numpy as np
    rng = np.random.RandomState(7)
    vocab = [r["term"] for r in
             s_syn.index.terms().orderBy(F.desc("doc_freq"))
             .limit(60).collect()]
    batch = {}
    for i in range(32):
        ts = [vocab[rng.randint(len(vocab))] for _ in range(3)]
        batch[f"q{i}"] = BooleanQuery(
            [(Occur.SHOULD, TermQuery(t)) for t in ts])
    t0 = time.time()
    n_res = s_syn.search_many(batch, k=10).count()
    q["batch_32_queries"] = round(time.time() - t0, 3)
    extra["batched_qps"] = round(32 / q["batch_32_queries"], 1)
    extra["batch_result_rows"] = n_res

    # hot-serving mode: postings persisted pre-partitioned by segment
    # (cache_index=True) — the page-cache-resident dedicated-search-node
    # shape; first query pays materialization (recorded as warmup)
    s_hot = Searcher(sidx, cache_index=True)
    timed("hot_warmup", lambda: s_hot.search(BooleanQuery(
        [(Occur.SHOULD, TermQuery("return")),
         (Occur.SHOULD, TermQuery("def"))]), 10).collect())
    lat_h = []
    for _ in range(BM25_RUNS):
        t0 = time.time()
        s_hot.search(BooleanQuery(
            [(Occur.SHOULD, TermQuery("return")),
             (Occur.SHOULD, TermQuery("def")),
             (Occur.SHOULD, TermQuery("mutex"))]), 10).collect()
        lat_h.append(time.time() - t0)
    lat_h.sort()
    q["bm25_hot_top10_p50"] = round(lat_h[len(lat_h) // 2], 3)
    # hot batched serving: one warmup batch primes the code path and the
    # driver-side impacts cache (per-KEY, so it stays warm across query
    # streams on a serving node), then a DIFFERENT 32-query batch is
    # timed — steady-state throughput on unseen queries
    s_hot.search_many(batch, k=10).count()
    batch2 = {}
    for i in range(32):
        ts = [vocab[rng.randint(len(vocab))] for _ in range(3)]
        batch2[f"h{i}"] = BooleanQuery(
            [(Occur.SHOULD, TermQuery(t)) for t in ts])
    t0 = time.time()
    n_hot = s_hot.search_many(batch2, k=10).count()
    q["batch_32_hot"] = round(time.time() - t0, 3)
    extra["batched_hot_qps"] = round(32 / q["batch_32_hot"], 1)
    extra["batch_hot_rows"] = n_hot
    s_hot._post_src.unpersist()
    s_hot._terms_src.unpersist()

    # ---- pipeline ops ---------------------------------------------------
    timedq("dedup_exact", lambda: dedup.exact_dup_groups(
        docs, "doc_id", "text").count())
    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5).count())
    timedq("simhash", lambda: dedup.simhash64(docs, "doc_id", "text").count())
    from lucene_7_x_9_x_spark.pipeline import decontam
    timedq("decontaminate", lambda: decontam.contaminated_docs(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        "doc_id", "text", "doc_id", "text", n=4).count())
    timedq("dup_spans", lambda: decontam.duplicate_spans(
        docs, "doc_id", "text", n=8).count())
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    embd = emb.withColumn("embedding", F.transform(
        "embedding", lambda x: x.cast("double")))
    timedq("ann_bruteforce_top10", lambda: similarity.cosine_topk_bruteforce(
        embd, qv, k=10, exclude_id=0).collect())
    # LSH: build the persisted bucket index once, then query it (hot path);
    # the one-shot cold path is build + query combined
    lsh_idx = timed("ann_lsh_build", lambda: similarity.build_lsh_index(
        embd.where(F.col("vec_id") != 0), dim=len(qv)))
    timedq("ann_lsh_top10", lambda: similarity.cosine_topk_lsh(
        None, qv, dim=len(qv), k=10, bucketed=lsh_idx).collect())
    qbatch = {f"v{i}": [float(x) for x in r["embedding"]]
              for i, r in enumerate(
                  emb.where(F.col("vec_id") < 8).collect())}
    # stateless given the persisted bucket index (each call plans a fresh
    # job over the same cached frame) — median like the other query ops
    n_lsh = timedq("ann_lsh_batch8", lambda: similarity.cosine_topk_lsh_many(
        lsh_idx, qbatch, dim=len(qv), k=10).count())
    extra["ann_lsh_batch_rows"] = n_lsh
    lsh_idx.unpersist()
    timedq("token_stats", lambda: textstats.token_stats(
        docs, "doc_id", "text").count())
    timedq("lang_id", lambda: textstats.lang_id(
        docs, "doc_id", "text").count())
    timedq("term_vectors", lambda: textstats.term_vectors(
        docs, "doc_id", "text").count())
    from lucene_7_x_9_x_spark.functions.highlight import highlight_snippets
    timedq("highlight", lambda: highlight_snippets(
        docs, ["filter", "join"]).count())
    from lucene_7_x_9_x_spark.streaming.monitor import percolate
    timedq("percolate_4q", lambda: percolate(docs, {
        "q_term": TermQuery("filter"),
        "q_conj": BooleanQuery([(Occur.MUST, TermQuery("group")),
                                (Occur.MUST, TermQuery("query"))]),
        "q_phrase": PhraseQuery(["the", "fast"]),
        "q_not": BooleanQuery(
            [(Occur.MUST, TermQuery("join")),
             (Occur.MUST_NOT, TermQuery("window"))]),
    }).count())

    # ---- round-4 surfaces: KNN, intervals, stemming ---------------------
    timedq("knn_filtered_top10", lambda: searcher.knn(
        qv, 10, filter=TermQuery("filter"), vectors=emb).collect())
    from lucene_7_x_9_x_spark.plans.query import (IntervalOr,
                                                  IntervalOrdered,
                                                  IntervalQuery,
                                                  IntervalTerm)
    timedq("intervals_ordered_top10", lambda: searcher.search(
        IntervalQuery(IntervalOrdered(
            (IntervalTerm("key"),
             IntervalOr((IntervalTerm("hash"), IntervalTerm("row")))),
            max_gaps=4)), 10).collect())
    from lucene_7_x_9_x_spark.functions.analysis import AnalyzerConfig
    sidx_stem = timed("index_build_stemmed", lambda: build_index(
        spark, docs, os.path.join(tmp, "idx_stem"), id_cols=["doc_id"],
        text_col="text", num_segments=CPUS,
        analyzer=AnalyzerConfig(stemmer="porter")))
    s_stem = Searcher(sidx_stem)
    timedq("stem_top10", lambda: s_stem.search(
        s_stem.text_query("filtering joined windows"), 10).collect())

    total = round(time.time() - t_all, 3)
    env1 = _env_sample()
    if env0 and env1:
        extra["env_loadavg_1m_start"] = env0.get("loadavg_1m")
        extra["env_loadavg_1m_end"] = env1.get("loadavg_1m")
        dt = env1.get("cpu_jiffies_total", 0) - \
            env0.get("cpu_jiffies_total", 0)
        ds = env1.get("cpu_jiffies_steal", 0) - \
            env0.get("cpu_jiffies_steal", 0)
        if dt > 0:
            extra["env_steal_pct"] = round(100.0 * ds / dt, 2)
    result = {
        "metric": "index_build_plus_query_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": q,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extra,
    }
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

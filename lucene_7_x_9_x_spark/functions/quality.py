"""Search-quality metrics — the benchmark quality package's scoring role
(solr-8.4.0/lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/:
QualityStats computes precision-at-k / recall / MRR for a judged query
set; TrecJudge holds the relevance labels). Pure driver-side arithmetic
over a ranked id list and a judged relevant set — rankings themselves
come from the engine (and its oracle), which is what the quality gate
compares."""

from __future__ import annotations


def precision_at_k(ranked: list, relevant: set, k: int) -> float:
    """P@k (QualityStats.getPrecisionAt): fraction of the top k that is
    judged relevant. Ranks past the end of `ranked` count as misses —
    the TREC convention for short result lists."""
    if k <= 0:
        raise ValueError("k must be positive")
    hits = sum(1 for d in ranked[:k] if d in relevant)
    return hits / k


def recall_at_k(ranked: list, relevant: set, k: int) -> float:
    """Fraction of the judged-relevant set retrieved in the top k."""
    if not relevant:
        return 0.0
    return sum(1 for d in ranked[:k] if d in relevant) / len(relevant)


def reciprocal_rank(ranked: list, relevant: set) -> float:
    """1/rank of the first relevant hit, 0 when none retrieved
    (QualityStats.getMRR's per-query contribution)."""
    for i, d in enumerate(ranked, 1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def quality_run(rankings: dict, judgments: dict, k: int = 10) -> dict:
    """Aggregate a judged run (QualityBenchmark.execute's summary role):
    rankings = {qid: [doc ids ranked]}, judgments = {qid: relevant set}.
    Returns per-query rows plus macro-averaged P@k / recall@k / MRR."""
    rows = {}
    for qid, ranked in sorted(rankings.items()):
        rel = judgments.get(qid, set())
        rows[qid] = {
            "p_at_k": precision_at_k(ranked, rel, k),
            "recall_at_k": recall_at_k(ranked, rel, k),
            "rr": reciprocal_rank(ranked, rel),
        }
    n = max(len(rows), 1)
    return {
        "queries": rows,
        "p_at_k": sum(r["p_at_k"] for r in rows.values()) / n,
        "recall_at_k": sum(r["recall_at_k"] for r in rows.values()) / n,
        "mrr": sum(r["rr"] for r in rows.values()) / n,
    }

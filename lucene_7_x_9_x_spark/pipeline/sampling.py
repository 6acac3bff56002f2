"""Deterministic sampling and mixture weighting for training-data
pipelines.

The operations every large-scale corpus assembly needs between cleaning
and training: reproducible subsampling, per-stratum rates, and
down-sampling to a target domain mixture (the "data mixture" step of
LLM training recipes). All selection is HASH-derived, never rand():

- same inputs -> same sample, on any cluster size, any partitioning,
  any execution order — the property rand(seed) does NOT give you on a
  cluster (Spark's rand is per-partition-seeded, so a repartition
  changes the sample);
- selection is a pure scan-stage filter (whole-stage codegen, no
  shuffle, no state);
- md5-prefix hashing (pipeline.dedup.md5_hash31 model) keeps every
  decision bit-reproducible in any SQL engine for auditing.

Scale shape: `deterministic_sample` and `stratified_sample` are
shuffle-free scans. `mixture_sample` adds ONE small groupBy(strata)
count (partial-agg, |strata| rows to the driver) to derive rates, then
the same shuffle-free filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import md5_hash31

_MERSENNE = (1 << 31) - 1


def _accept(id_col: str, rate: float, seed: int):
    """Deterministic Bernoulli(rate): md5-derived 31-bit hash of
    (seed:id) compared to an integer threshold. floor(rate * 2^31-1)
    is computed identically in any engine (one correctly-rounded
    double multiply), so the accepted id set is bit-reproducible."""
    thr = int(rate * _MERSENNE)
    h = md5_hash31(F.concat(F.lit(f"{seed}:"),
                            F.col(id_col).cast("string")))
    return h < F.lit(thr)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         seed: int = 42) -> DataFrame:
    """Reproducible Bernoulli sample: keeps rows whose hash falls under
    fraction. Pure filter — pushes to the scan, no shuffle."""
    return df.where(_accept(id_col, fraction, seed))


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict, default: float = 0.0,
                      seed: int = 42) -> DataFrame:
    """Per-stratum sampling rates (df.sampleBy's deterministic,
    repartition-stable cousin). `fractions` maps stratum value -> rate;
    unlisted strata use `default`."""
    cond = None
    for s, rate in sorted(fractions.items()):
        this = (F.col(strata_col) == s) & _accept(id_col, rate,
                                                  seed)
        cond = this if cond is None else cond | this
    if default > 0.0:
        listed = F.col(strata_col).isin(list(fractions))
        rest = (~listed) & _accept(id_col, default, seed)
        cond = rest if cond is None else cond | rest
    return df.where(cond if cond is not None else F.lit(False))


def mixture_rates(counts: dict, target: dict) -> dict:
    """Down-sampling rates that hit the target mixture exactly.

    Given observed per-stratum counts and target proportions (summing
    to <= 1 over the observed strata), the largest achievable corpus is
    N* = min_s count_s / p_s; each stratum keeps p_s * N* docs, i.e.
    rate_s = (p_s * N*) / count_s  (the binding stratum keeps 100%).
    Strata absent from `target` get rate 0. Pure-python doubles in a
    fixed evaluation order so SQL oracles reproduce the rates exactly.
    """
    ns = {s: counts[s] for s in target if counts.get(s)}
    if not ns:
        return {s: 0.0 for s in counts}
    nstar = min(ns[s] / target[s] for s in sorted(ns))
    out = {}
    for s in counts:
        if s in ns:
            out[s] = min(1.0, (target[s] * nstar) / counts[s])
        else:
            out[s] = 0.0
    return out


def mixture_sample(df: DataFrame, id_col: str, strata_col: str,
                   target: dict, seed: int = 42) -> DataFrame:
    """Down-sample to a target domain mixture: one small count agg to
    derive per-stratum rates (mixture_rates), then the shuffle-free
    deterministic filter. The binding stratum is kept whole; the rest
    are thinned so final proportions match `target`."""
    counts = {r[strata_col]: r["cnt"] for r in
              df.groupBy(strata_col).agg(F.count("*").alias("cnt"))
              .collect()}
    rates = mixture_rates(counts, target)
    return stratified_sample(df, id_col, strata_col,
                             {s: r for s, r in rates.items() if r > 0.0},
                             default=0.0, seed=seed)

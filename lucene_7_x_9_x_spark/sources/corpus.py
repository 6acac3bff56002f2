"""Deterministic synthetic source-code corpus (FIXTURES.md F1 shape):
(repo, path, commit, lang, content). Generated distributed via mapInPandas
with counter-based hashing so every row is reproducible independent of
partitioning (no RandomState sequencing) — the generator used for indexing
throughput and scaling benchmarks (BASELINE.md)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "java", "c", "go", "md"]

HOT = ("def return int if else for while self import class public void "
       "static struct func include the a of and to in is string new null "
       "true false try catch throw case break continue switch do float "
       "double long char bool var let const print len range map list set "
       "dict array vector size begin end open close read write file line "
       "value key name type data node next prev head tail left right root "
       "count index buffer stream token parse format error result status "
       "code test assert mock init main args argv env path dir tmp log "
       "debug info warn fatal lock mutex thread async await yield").split()

N_TAIL = 50_000


def _mix(a: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic mixing, vectorized."""
    x = (a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15 + salt))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_docs, 1, parts)

    hot = np.array(HOT, dtype=object)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the tail vocabulary is materialized ONCE per task (50k small
        # strings) so cell word selection is pure fancy indexing — the
        # earlier dense n x max_len matrix with per-cell int->str
        # conversion was ~100x slower and made 10M-doc generation the
        # bottleneck of the scale benchmarks (output is bit-identical)
        tail_vocab = np.array([f"fn_{i}" for i in range(N_TAIL)],
                              dtype=object)
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            n = len(ids)
            u = _mix(ids, seed) % np.uint64(10**9) / 1e9
            # lognormal-ish doc length 5..2000 tokens
            ln = np.clip((np.exp(3.2 + 1.1 * _norminv(u)) + 5).astype(int),
                         5, 2000)
            # sparse cell stream: only (row, col < ln[row]) cells exist,
            # in row-major order — the same cells, same order, same mixed
            # hashes as the dense matrix formulation
            ln64 = ln.astype(np.int64)
            ri = np.repeat(np.arange(n, dtype=np.int64), ln64)
            bounds = np.concatenate(([0], np.cumsum(ln64)))
            ci = np.arange(len(ri), dtype=np.int64) - bounds[ri]
            cell = _mix(ids[ri] * np.int64(1_000_003) + ci, seed + 1)
            is_hot = (cell % np.uint64(100)) < np.uint64(60)
            # zipf-ish over hot words: square the uniform to skew low ranks
            hsel = ((cell >> np.uint64(7)) % np.uint64(len(HOT) ** 2))
            hidx = (np.sqrt(hsel.astype(np.float64))).astype(np.int64)
            tidx = ((cell >> np.uint64(13)) % np.uint64(N_TAIL)).astype(
                np.int64)
            words = np.empty(len(cell), dtype=object)
            words[is_hot] = hot[hidx[is_hot]]
            notht = ~is_hot
            words[notht] = tail_vocab[tidx[notht]]
            contents = [" ".join(x)
                        for x in np.split(words, bounds[1:-1])]
            langs = [LANGS[int(x)] for x in _mix(ids, seed + 2)
                     % np.uint64(len(LANGS))]
            yield pd.DataFrame({
                "repo": [f"repo-{int(x):05d}" for x in
                         _mix(ids, seed + 3) % np.uint64(997)],
                "path": [f"src/pkg{int(i) % 37}/mod_{int(i)}.txt"
                         for i in ids],
                "commit": [f"{int(x):040x}"[:40] for x in
                           _mix(ids, seed + 4)],
                "lang": langs,
                "content": contents,
            })

    return base.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string,"
                    " content string")


def _norminv(u: np.ndarray) -> np.ndarray:
    """Cheap inverse-normal approximation (Acklam-lite) for synthetic
    length distributions; exactness is irrelevant, determinism is not."""
    u = np.clip(u, 1e-9, 1 - 1e-9)
    return np.sqrt(2) * _erfinv(2 * u - 1)


def _erfinv(x: np.ndarray) -> np.ndarray:
    a = 0.147
    ln1mx2 = np.log(1 - x * x)
    t = 2 / (np.pi * a) + ln1mx2 / 2
    return np.sign(x) * np.sqrt(np.sqrt(t * t - ln1mx2 / a) - t)

"""Pluggable similarities beyond BM25 (SURVEY §2.7).

ClassicSimilarity — the reference's TF-IDF model, float32-exact behavior
transcription of:
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/similarities/
    ClassicSimilarity.java:39-63
      lengthNorm(numTerms) = (float)(1.0 / sqrt(numTerms))
      tf(freq)             = (float) sqrt(freq)
      idf(df, docCount)    = (float)(log((docCount+1)/(double)(df+1)) + 1.0)
  TFIDFSimilarity.java:519-560
      normTable[i] = lengthNorm(byte4ToInt(i)) for i >= 1;
      normTable[0] = 1f / normTable[255]
      score(freq, norm) = (tf(freq) * queryWeight) * normTable[norm & 0xFF]
      with queryWeight = boost * idf (float32 product)

The norm byte is the same SmallFloat.intToByte4(dl) the index already
stores (TFIDFSimilarity.computeNorm == BM25Similarity.computeNorm), so one
index serves both similarities.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

F32 = np.float32


class LMDirichletSimilarity:
    """Dirichlet-smoothed language model, float32-exact transcription of
    solr-8.4.0/.../similarities/LMDirichletSimilarity.java:75-80 +
    LMSimilarity.DefaultCollectionModel (p(w|C) = (ttf+1)/(sumTTF+1)) +
    SimilarityBase.BasicSimScorer:227-229 (double math, final float cast,
    docLen = byte4ToInt(norm)):

        score = boost * (log(1 + freq / (mu * p_c)) + log(mu / (dl + mu)))
        clipped below at 0.

    Unlike BM25/Classic the per-term statistic is ttf (not df), so scoring
    dispatches through SegmentStats.pseudo_score rather than a scalar
    weight."""

    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              ttf: int, sum_ttf: int, boost: np.float32) -> np.ndarray:
        p_c = (ttf + 1.0) / (sum_ttf + 1.0)
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        s = float(boost) * (np.log(1.0 + f / (self.mu * p_c))
                            + np.log(self.mu / (dl + self.mu)))
        return np.where(s > 0.0, s, 0.0).astype(np.float32)


class LMJelinekMercerSimilarity:
    """Jelinek-Mercer smoothed language model, float32-exact transcription
    of solr-8.4.0/.../similarities/LMJelinekMercerSimilarity.java:60-68
    (score = boost * log(1 + ((1-lambda) * freq / docLen) /
    (lambda * p(w|C))), double math, final float cast) with
    LMSimilarity.DefaultCollectionModel p(w|C) = (ttf+1)/(sumTTF+1) and
    docLen = byte4ToInt(norm). log1p of a non-negative value, so no
    clipping is needed (unlike Dirichlet). lambda = 0.1 suits short
    queries (the class javadoc's guidance)."""

    name = "lmjelinekmercer"

    def __init__(self, lam: float = 0.1):
        self.lam = float(lam)
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              ttf: int, sum_ttf: int, boost: np.float32) -> np.ndarray:
        p_c = (ttf + 1.0) / (sum_ttf + 1.0)
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        s = float(boost) * np.log(
            1.0 + ((1.0 - self.lam) * f / dl) / (self.lam * p_c))
        return s.astype(np.float32)


class DFRInL2Similarity:
    """Divergence-from-Randomness I(n)L2 — DFRSimilarity composed of
    BasicModelIn + AfterEffectL + NormalizationH2(c=1), float32-exact
    transcription of solr-8.4.0/.../similarities/DFRSimilarity.java:96-120
    (score = boost * basicModel.score(stats, tfn, aeTimes1pTfn)) with
      NormalizationH2.tfn = freq * log2(1 + c * avgFieldLength / docLen)
      BasicModelIn.score  = (tfn / (1 + tfn)) * log2((N + 1) / (df + 0.5))
        (AfterEffectL folds to tfn/(1+tfn): scoreTimes1pTfn == 1)
    double math throughout, final float cast (SimilarityBase.BasicSimScorer);
    docLen = byte4ToInt(norm), avgFieldLength = sumTTF / (double) docCount
    (BasicStats)."""

    name = "dfr_inl2"

    def __init__(self, c: float = 1.0):
        self.c = float(c)
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              df: int, doc_count: int, sum_ttf: int,
              boost: np.float32) -> np.ndarray:
        if df <= 0:
            return np.zeros(len(np.asarray(freqs)), dtype=np.float32)
        avg_dl = sum_ttf / float(max(doc_count, 1))
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        tfn = f * np.log2(1.0 + self.c * avg_dl / dl)
        s = (float(boost) * (tfn / (1.0 + tfn))
             * np.log2((doc_count + 1.0) / (df + 0.5)))
        return np.where(s > 0.0, s, 0.0).astype(np.float32)


class DFIChiSquaredSimilarity:
    """Divergence-from-Independence with the chi-squared measure,
    float32-exact transcription of
    solr-8.4.0/.../similarities/DFISimilarity.java:42-50 +
    IndependenceChiSquared.java:26-29:
      expected = (ttf + 1) * docLen / (numberOfFieldTokens + 1)
      score    = 0                          if freq <= expected
               = boost * log2(((freq - expected)^2 / expected) + 1)
    double math, final float cast (SimilarityBase.BasicSimScorer);
    docLen = byte4ToInt(norm), numberOfFieldTokens = sumTTF
    (SimilarityBase.fillBasicStats)."""

    name = "dfi_chisquared"

    def __init__(self):
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              ttf: int, sum_ttf: int, boost: np.float32) -> np.ndarray:
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        expected = (ttf + 1.0) * dl / (sum_ttf + 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            measure = (f - expected) ** 2 / expected
            s = float(boost) * np.log2(measure + 1.0)
        return np.where(f > expected, s, 0.0).astype(np.float32)


class IBSimilarityLLH2:
    """Information-based model IB LL-DF-H2 — IBSimilarity composed of
    DistributionLL + LambdaDF + NormalizationH2(c=1), float32-exact
    transcription of solr-8.4.0/.../similarities/IBSimilarity.java:99-105
    (score = boost * distribution.score(stats, tfn, lambda)) with
      NormalizationH2.tfn   = freq * log2(1 + c * avgFieldLength / docLen)
      LambdaDF.lambda       = float32((df + 1) / (numberOfDocuments + 1)),
                              nextDown'ed if it rounds to exactly 1
                              (LambdaDF.java:32-38)
      DistributionLL.score  = -log(lambda / (tfn + lambda))
                              (DistributionLL.java:33-34)
    double math throughout, final float cast (SimilarityBase.BasicSimScorer);
    docLen = byte4ToInt(norm), avgFieldLength = sumTTF / (double) docCount
    (SimilarityBase.fillBasicStats:104-114)."""

    name = "ib_ll"

    def __init__(self, c: float = 1.0):
        self.c = float(c)
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              df: int, doc_count: int, sum_ttf: int,
              boost: np.float32) -> np.ndarray:
        if df <= 0:
            return np.zeros(len(np.asarray(freqs)), dtype=np.float32)
        lam = F32((df + 1.0) / (doc_count + 1.0))
        if lam == F32(1.0):
            lam = np.nextafter(lam, F32(0.0), dtype=np.float32)
        lam = float(lam)
        avg_dl = sum_ttf / float(max(doc_count, 1))
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        tfn = f * np.log2(1.0 + self.c * avg_dl / dl)
        s = float(boost) * -np.log(lam / (tfn + lam))
        return s.astype(np.float32)


class AxiomaticF2EXP:
    """Axiomatic retrieval model F2EXP, float32-exact transcription of
    solr-8.4.0/.../similarities/AxiomaticF2EXP.java:60-87 with the
    Axiomatic.java:104-113 composition
      score = max(0, boost * tf * ln * tfln * idf - gamma)  where for F2EXP
        tf = ln = 1, gamma = 0,
        tfln = freq / (freq + s + s * docLen / avgFieldLength)
        idf  = pow((N + 1) / df, k)
    defaults s=0.25f, k=0.35f (Axiomatic.java:100-101); double math, final
    float cast (SimilarityBase.BasicSimScorer); docLen = byte4ToInt(norm),
    avgFieldLength = sumTTF / (double) docCount."""

    name = "axiomatic_f2exp"

    def __init__(self, s: float = 0.25, k: float = 0.35):
        self.s = float(F32(s))
        self.k = float(F32(k))
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              df: int, doc_count: int, sum_ttf: int,
              boost: np.float32) -> np.ndarray:
        if df <= 0:
            return np.zeros(len(np.asarray(freqs)), dtype=np.float32)
        avg_dl = sum_ttf / float(max(doc_count, 1))
        dl = self._dl[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float64)
        tfln = f / (f + self.s + self.s * dl / avg_dl)
        s = float(boost) * tfln * ((doc_count + 1.0) / df) ** self.k
        return np.where(s > 0.0, s, 0.0).astype(np.float32)


class BooleanSimilarity:
    """solr-8.4.0/.../similarities/BooleanSimilarity.java: every matching
    doc scores exactly the query boost — no tf, no idf, no norms."""

    name = "boolean"

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        return F32(1.0)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              weight: np.float32) -> np.ndarray:
        return np.full(len(np.asarray(freqs)), weight, dtype=np.float32)


class ClassicSimilarity:
    name = "classic"

    def __init__(self):
        nt = np.empty(256, dtype=np.float32)
        # LENGTH_TABLE[i] = byte4ToInt(i); lengthNorm in double, cast f32
        nt[1:] = (1.0 / np.sqrt(LENGTH_TABLE[1:].astype(np.float64))
                  ).astype(np.float32)
        nt[0] = F32(1.0) / nt[255]
        self.norm_table = nt

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        return F32(np.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray,
              weight: np.float32) -> np.ndarray:
        tf = np.sqrt(np.asarray(freqs, dtype=np.float64)).astype(np.float32)
        raw = tf * weight  # float32 product, then normalize for field
        nv = self.norm_table[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        return (raw * nv).astype(np.float32)

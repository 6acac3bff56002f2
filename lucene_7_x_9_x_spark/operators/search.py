"""Distributed query execution — the IndexSearcher analogue.

Architecture (SURVEY.md §3.2): the driver rewrites the query, gathers global
term statistics once (IndexSearcher.java:790,803), and ships per-query
constants to executors; each segment is scored independently inside
``applyInPandas`` over a cogroup of (postings rows for the query terms) with
(the segment's docmap/norms) — the leaf-slice model of
solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/IndexSearcher.java:271-276.
Per-segment top-k results are reduced with Catalyst's TakeOrderedAndProject
(``ORDER BY score DESC, segment, docid LIMIT k``) — the TopDocs.merge
tie-break (solr-8.4.0/.../search/TopDocs.java:75,106).

TOP_SCORES mode implements block-max pruning (the WANDScorer /
BlockMaxConjunctionScorer / ImpactsDISI capability,
solr-8.4.0/.../search/WANDScorer.java:29-44,338-376, ImpactsDISI.java:95-127,
MaxScoreCache.java:61-117) in vectorized form: per-term per-block score
upper bounds come from the stored impact frontiers; the docid axis is cut
into elementary intervals at the union of all block boundaries; an interval
is skipped iff the float-safe sum of covering block bounds is below the
current top-k threshold — the same safety invariant as
ImpactsDISI.advanceTarget, so the top-k is identical to exhaustive
evaluation while only competitive blocks are decoded (SURVEY.md §7.4.3).
Within surviving intervals all docs are scored vectorized — more scoring
work per block than Lucene's per-doc pivoting, amortized by numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import bm25, codec
from ..functions.bm25 import F32
from ..plans.query import (BooleanQuery, BoostQuery, Occur, TermQuery,
                           key_field, term_key)
from .executor import Matches, SegmentStats, top_k


class SparkSegmentReader:
    """Executor-side reader over the pandas postings rows of ONE segment.
    Decodes lazily, block-granular (the Lucene84PostingsReader.refillDocs
    analogue, solr-8.4.0/.../codecs/lucene84/Lucene84PostingsReader.java:391-432)."""

    def __init__(self, postings_pdf: pd.DataFrame, norms: np.ndarray,
                 max_doc: int, field_norms: dict | None = None):
        """norms: default-field norm bytes; field_norms: {field: uint8[]}
        for named non-default fields (per-field norms files,
        solr-8.4.0/.../index/FieldInfos.java — norms are per field).
        Postings rows with a non-null field column are keyed (field, term);
        null/absent field means the default field (bare term key)."""
        if "field" in postings_pdf.columns:
            # null field (None or NaN from Arrow) = default field: bare key
            self._rows = {
                ((r.field, r.term) if isinstance(r.field, str) else r.term): r
                for r in postings_pdf.itertuples()}
        else:
            self._rows = {r.term: r for r in postings_pdf.itertuples()}
        self._norms = norms
        self._field_norms = field_norms or {}
        self._max_doc = max_doc
        self._block_cache: dict = {}
        self._full_cache: dict = {}
        self._blockx_cache: dict = {}
        self.blocks_decoded = 0

    def block_max_x(self, term: str, cache: np.ndarray) -> np.ndarray | None:
        """Per-block max of x = float32(freq) * cache[norm] over the stored
        impact frontier. score(f, n) = w - w/(1 + x) is weakly monotone in x
        under float32 rounding, so the block score upper bound for ANY
        weight w > 0 is w - w/(1 + max_x) — bit-identical to maximizing the
        scored pairs. Cached per term: in search_many one frontier reduction
        serves every query in the batch (the index-time MaxScoreCache
        strengthening of SURVEY §2.6, realized as a per-(segment, cache)
        memo). Returns None if any block's frontier is empty (defensive)."""
        got = self._blockx_cache.get(term)
        if got is not None and got[0] is cache:
            return got[1]
        r = self._rows.get(term)
        if r is None:
            return None
        lens = np.fromiter((len(x) for x in r.imp_freqs), dtype=np.int64,
                           count=len(r.imp_freqs))
        if len(lens) == 0 or not (lens > 0).all():
            return None
        all_f = np.concatenate([np.asarray(x, dtype=np.int64)
                                for x in r.imp_freqs])
        all_n = np.concatenate([np.asarray(x, dtype=np.int64)
                                for x in r.imp_norms])
        x = all_f.astype(np.float32) * cache[all_n & 0xFF]
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        bx = np.maximum.reduceat(x, starts).astype(np.float32)
        self._blockx_cache[term] = (cache, bx)
        return bx

    def row(self, term):
        return self._rows.get(term)

    def n_blocks(self, term) -> int:
        r = self._rows.get(term)
        return 0 if r is None else len(r.block_ns)

    def decode_blocks(self, term, block_idx: np.ndarray):
        """Decode selected blocks -> (docids, freqs) concatenated in docid
        order. block_idx must be sorted ascending."""
        r = self._rows.get(term)
        if r is None:
            return None
        ds, fs = [], []
        for j in block_idx:
            j = int(j)
            key = (term, j)
            got = self._block_cache.get(key)
            if got is None:
                base = int(r.block_max_docs[j - 1]) if j > 0 else -1
                n = int(r.block_ns[j])
                d = codec.decode_doc_block(bytes(r.block_docs[j]), n, base)
                f = codec.decode_freq_block(bytes(r.block_freqs[j]), n)
                got = (d, f)
                self._block_cache[key] = got
                self.blocks_decoded += 1
            ds.append(got[0])
            fs.append(got[1])
        if not ds:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        return np.concatenate(ds), np.concatenate(fs)

    def postings(self, term):
        if term in self._full_cache:
            return self._full_cache[term]
        r = self._rows.get(term)
        out = None if r is None else self.decode_blocks(
            term, np.arange(len(r.block_ns)))
        self._full_cache[term] = out
        return out

    def flat_positions(self, term):
        """(docids, counts, flat_pos): ALL docs' positions decoded in one
        vectorized pass. Each doc's slice of the .pos blob is independent
        delta-varbyte (first delta from 0) and varints are self-terminating,
        so one vint_decode over the whole blob yields every delta; a
        segmented cumsum (reset at doc starts, boundaries = freqs) restores
        absolute positions. No per-doc Python — the scale path the
        ExactPhraseMatcher capability needs on high-df terms."""
        key = ("__flatpos__", term)
        got = self._full_cache.get(key)
        if got is not None:
            return got
        r = self._rows.get(term)
        if r is None or getattr(r, "pos_data", None) is None:
            return None
        p = self.postings(term)
        if p is None:
            return None
        docids, freqs = p
        offs = np.asarray(r.pos_offsets, dtype=np.int64)
        data = bytes(r.pos_data)
        deltas = codec.vint_decode(
            data[offs[0]:offs[-1]]).astype(np.int64)
        counts = freqs.astype(np.int64)
        cs = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bases = np.where(starts > 0, cs[starts - 1], 0)
        flat = cs - np.repeat(bases, counts)
        out = (docids, counts, flat)
        self._full_cache[key] = out
        return out

    def positions(self, term):
        fp = self.flat_positions(term)
        if fp is None:
            return None
        docids, counts, flat = fp
        bounds = np.cumsum(counts)[:-1]
        return docids, np.split(flat, bounds)

    def norms(self):
        return self._norms

    def norms_for(self, field: str | None):
        if field is None:
            return self._norms
        return self._field_norms[field]

    def all_docids(self):
        return np.arange(self._max_doc, dtype=np.int64)


# --------------------------------------------------------------------------
# TOP_SCORES plan shape
# --------------------------------------------------------------------------

def classify_blockmax(q) -> dict | None:
    """If the (rewritten) query is a term-clause Boolean — the WAND /
    BlockMaxConjunction shape (Boolean2ScorerSupplier.java:100-207) — return
    {'must': [(term,boost)], 'should': [...], 'filter': [terms],
     'must_not': [terms], 'msm': n}; else None -> exhaustive fallback."""
    def term_of(sub):
        if isinstance(sub, TermQuery):
            return (term_key(sub.field, sub.term), sub.boost)
        if isinstance(sub, BoostQuery) and isinstance(sub.query, TermQuery):
            return (term_key(sub.query.field, sub.query.term),
                    sub.boost * sub.query.boost)
        return None

    if isinstance(q, (TermQuery, BoostQuery)):
        t = term_of(q)
        return None if t is None else {
            "must": [], "should": [t], "filter": [], "must_not": [], "msm": 0}
    if not isinstance(q, BooleanQuery):
        return None
    out = {"must": [], "should": [], "filter": [], "must_not": [],
           "msm": q.minimum_should_match}
    for c in q.clauses:
        if c.occur in (Occur.SHOULD, Occur.MUST):
            t = term_of(c.query)
            if t is None:
                return None
            out["should" if c.occur == Occur.SHOULD else "must"].append(t)
        elif isinstance(c.query, TermQuery):
            out["filter" if c.occur == Occur.FILTER
                else "must_not"].append(
                    term_key(c.query.field, c.query.term))
        else:
            return None
    if not (out["should"] or out["must"]):
        return None
    return out


def blockmax_topk(reader: SparkSegmentReader, stats: SegmentStats,
                  plan: dict, k: int, chunk_intervals: int = 32,
                  deleted: np.ndarray | None = None):
    """Vectorized block-max top-k, rank-identical to exhaustive evaluation.
    deleted: sorted unique docids tombstoned in this segment (liveDocs);
    they are excluded like a MUST_NOT set, before top-k, so k semantics are
    exact. Returns (docids, scores, frac_blocks_decoded)."""
    n_must_req = len(plan["must"])
    scoring = []  # (key, weight, row, is_must)
    for term, boost in plan["must"]:
        r = reader.row(term)
        if r is None:  # a required term absent from this segment -> no hits
            return np.zeros(0, np.int64), np.zeros(0, np.float32), 0.0
        scoring.append((term, F32(F32(boost) * stats.idf(term)), r, True))
    for term, boost in plan["should"]:
        r = reader.row(term)
        if r is not None:
            scoring.append((term, F32(F32(boost) * stats.idf(term)), r, False))
    if not scoring:
        return np.zeros(0, np.int64), np.zeros(0, np.float32), 0.0
    filt_terms = []
    for t in plan["filter"]:
        if reader.row(t) is None:
            return np.zeros(0, np.int64), np.zeros(0, np.float32), 0.0
        filt_terms.append(t)

    # per-term per-block upper bounds from stored impact frontiers. The
    # frontier reduction (max of x = f32(freq) * cache[norm] per block) is
    # weight-independent and cached on the reader, so in search_many it runs
    # ONCE per term per segment for the whole batch; applying the weight is
    # one vectorized op per block. Monotonicity of w - w/(1+x) in x under
    # float32 rounding makes this bit-identical to maximizing scored pairs
    # (the MaxScoreCache fill, amortized across blocks AND queries)
    one = np.float32(1.0)
    term_ends, term_ubs = [], []
    total_blocks = 0
    for term, w, r, _ in scoring:
        ends = np.asarray(r.block_max_docs, dtype=np.int64)
        fcache = stats.cache_for(key_field(term))
        bx = reader.block_max_x(term, fcache)
        if bx is not None:
            ub = (w - w / (one + bx)).astype(np.float64)
        else:  # defensive: empty frontier block (shouldn't occur)
            ub = np.array([bm25.max_score_for_block(
                np.asarray(ff, dtype=np.int64),
                np.asarray(nn, dtype=np.int64), w, fcache)
                for ff, nn in zip(r.imp_freqs, r.imp_norms)],
                dtype=np.float64)
        term_ends.append(ends)
        term_ubs.append(ub)
        total_blocks += len(ends)

    # elementary intervals: interval i covers docids (bps[i-1], bps[i]]
    bps = np.unique(np.concatenate(term_ends))
    n_int = len(bps)
    int_lo = np.concatenate(([0], bps[:-1] + 1))
    int_hi = bps
    ub_int = np.zeros(n_int, dtype=np.float64)
    cover_cnt = np.zeros(n_int, dtype=np.int64)
    term_block_of_int = []
    for (term, w, r, is_must), ends, ub in zip(scoring, term_ends, term_ubs):
        bi = np.searchsorted(ends, int_hi)
        covered = bi < len(ends)
        contrib = np.zeros(n_int, dtype=np.float64)
        contrib[covered] = ub[bi[covered]]
        ub_int += contrib
        if is_must:
            cover_cnt += covered.astype(np.int64)
        term_block_of_int.append((bi, covered))
    viable = cover_cnt == n_must_req
    ub_safe = np.nextafter(ub_int.astype(np.float32), np.float32(np.inf))

    must_not_sets = []
    for t in plan["must_not"]:
        p = reader.postings(t)
        if p is not None:
            must_not_sets.append(p[0])
    if deleted is not None and len(deleted):
        must_not_sets.append(deleted)

    msm = max(plan["msm"], 0)
    top_d = np.zeros(0, np.int64)
    top_s = np.zeros(0, np.float32)
    theta = None  # min competitive score once heap is full

    # best-first interval order (a strengthening over Lucene's doc-order
    # traversal that our precomputed bounds allow): theta converges after
    # the first chunks, and because bounds are visited descending we can
    # STOP outright once the best remaining bound is non-competitive.
    # Safety unchanged: an interval is skipped only when ub_safe < theta
    # (strict), which excludes score ties, so the final (score desc, docid
    # asc) top-k is still exactly the exhaustive one.
    masked_ub = np.where(viable, ub_int, -np.inf)
    visit = np.argsort(-masked_ub, kind="stable")[: int(viable.sum())]
    # warm-up schedule: tiny first chunks establish theta before committing
    # to big decodes, then chunks grow to amortize vectorization
    cs, step = 0, 2
    while cs < len(visit):
        idx = visit[cs:cs + step]
        cs += step
        step = min(step * 2, max(chunk_intervals, 2))
        if theta is not None:
            if ub_safe[idx[0]] < theta:
                break  # descending bounds: nothing further can compete
            idx = idx[ub_safe[idx] >= theta]
        live = np.sort(idx)
        if len(live) == 0:
            continue
        lo, hi = int_lo[live], int_hi[live]
        parts_d, parts_s, parts_is_must = [], [], []
        for ti, (term, w, r, is_must) in enumerate(scoring):
            bi, covered = term_block_of_int[ti]
            need = np.unique(bi[live][covered[live]])
            if len(need) == 0:
                continue
            d, f = reader.decode_blocks(term, need)
            a = np.searchsorted(d, lo)
            b = np.searchsorted(d, hi, side="right")
            segs = [np.arange(x, y) for x, y in zip(a, b) if y > x]
            if not segs:
                continue
            take = np.concatenate(segs)
            fld = key_field(term)
            sc = bm25.score_term(f[take],
                                 reader.norms_for(fld)[d[take]], w,
                                 stats.cache_for(fld))
            parts_d.append(d[take])
            parts_s.append(sc)
            parts_is_must.append(np.full(len(take), is_must))
        if not parts_d:
            continue
        cd = np.concatenate(parts_d)
        csc = np.concatenate(parts_s).astype(np.float64)
        cim = np.concatenate(parts_is_must)
        docs_u, inv = np.unique(cd, return_inverse=True)
        acc = np.zeros(len(docs_u), dtype=np.float64)
        np.add.at(acc, inv, csc)
        mcnt = np.zeros(len(docs_u), dtype=np.int64)
        np.add.at(mcnt, inv, cim.astype(np.int64))
        scnt = np.zeros(len(docs_u), dtype=np.int64)
        np.add.at(scnt, inv, (~cim).astype(np.int64))
        ok = mcnt >= n_must_req
        if msm > 0:
            ok &= scnt >= msm
        elif n_must_req == 0:
            ok &= scnt >= 1
        for t in filt_terms:
            fd, _ = reader.postings(t)
            ok &= np.isin(docs_u, fd, assume_unique=True)
        for nd in must_not_sets:
            ok &= ~np.isin(docs_u, nd, assume_unique=True)
        docs_u = docs_u[ok]
        if len(docs_u) == 0:
            continue
        sc_u = acc[ok].astype(np.float32)
        top_d = np.concatenate([top_d, docs_u])
        top_s = np.concatenate([top_s, sc_u])
        if len(top_d) >= k:
            top_d, top_s = top_k(Matches(top_d, top_s), k)
            if len(top_d) == k:
                theta = np.float32(top_s[-1])
    top_d, top_s = top_k(Matches(top_d, top_s), k)
    frac = reader.blocks_decoded / max(total_blocks, 1)
    return top_d, top_s, frac

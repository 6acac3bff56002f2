"""Pure pandas/numpy reference engine ("the Lucene oracle").

Builds an in-memory inverted index with exactly the reference's semantics
(analysis chain, SmallFloat norms, float32 BM25) and answers queries through
the shared executor. This is milestone M0 of SURVEY.md §7.2: it pins
semantics before any distribution, and every Spark result is tested against
it (the CheckHits.checkTopScores model,
solr-8.4.0/lucene/test-framework/src/java/org/apache/lucene/search/CheckHits.java:577-601).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.analysis import AnalyzerConfig, tokenize_to_flat
from .functions.editdist import levenshtein_le, osa_distance
from .functions.smallfloat import int_to_byte4
from .operators.executor import Matches, SegmentStats, evaluate, top_k
from .plans.query import Query, RewriteContext, rewrite as rewrite_query
from .plans import query as Q


class InMemoryReader:
    """Reader protocol over dict-of-numpy postings (single segment).
    Multi-field: named-field postings use (field, term) tuple keys and
    their norms live in field_norms (the per-field .nvd role)."""

    def __init__(self, postings: dict, norms: np.ndarray, max_doc: int,
                 positions: dict | None = None,
                 field_norms: dict | None = None):
        self._postings = postings      # term -> (docids, freqs)
        self._positions = positions or {}  # term -> (docids, [pos arrays])
        self._norms = norms
        self._max_doc = max_doc
        self._field_norms = field_norms or {}

    def norms_for(self, field: str):
        return self._field_norms[field]

    def postings(self, term):
        return self._postings.get(term)

    def positions(self, term):
        return self._positions.get(term)

    def norms(self):
        return self._norms

    def all_docids(self):
        return np.arange(self._max_doc, dtype=np.int64)

    def terms(self):
        # default-field dictionary only (string keys); named-field keys
        # are (field, term) tuples — see term_keys()
        return sorted(t for t in self._postings if isinstance(t, str))

    def term_keys(self):
        """Every term KEY in the reader (bare default-field strings and
        (field, term) tuples)."""
        return set(self._postings.keys())


def index_token_lists(token_lists: list[list[str]],
                      similarity: str = "bm25"):
    """Build an InMemoryReader + SegmentStats from explicit per-doc token
    lists (docid = list index) — the shape of the reference's golden tests
    (LT/search/TestWANDScorer.java:88-101)."""
    rows = []
    for docid, toks in enumerate(token_lists):
        for pos, t in enumerate(toks):
            rows.append((t, docid, pos))
    dl = np.array([len(t) for t in token_lists], dtype=np.int64)
    norms = int_to_byte4(dl)
    postings, positions = {}, {}
    if rows:
        df = pd.DataFrame(rows, columns=["term", "docid", "pos"])
        for term, g in df.groupby("term", sort=True):
            gg = g.groupby("docid", sort=True)
            docids = np.array(sorted(gg.groups.keys()), dtype=np.int64)
            freqs = gg.size().reindex(docids).to_numpy(dtype=np.int64)
            pos_arrays = [g2["pos"].to_numpy(np.int64)
                          for _, g2 in gg]
            postings[term] = (docids, freqs)
            positions[term] = (docids, pos_arrays)
    doc_freqs = {t: len(p[0]) for t, p in postings.items()}
    ttfs = {t: int(p[1].sum()) for t, p in postings.items()}
    stats = SegmentStats(
        doc_count=int((dl > 0).sum()),
        sum_total_term_freq=int(dl.sum()),
        doc_freqs=doc_freqs, total_term_freqs=ttfs, similarity=similarity)
    return InMemoryReader(postings, norms, len(token_lists), positions), stats


def index_corpus(df: pd.DataFrame, text_col: str = "content",
                 cfg: AnalyzerConfig | None = None,
                 similarity: str = "bm25",
                 extra_fields: list | None = None,
                 field_analyzers: dict | None = None):
    """Tokenize a corpus DataFrame (docid = positional order) and index it.

    extra_fields: [(field_name, column)] — named fields indexed alongside
    the default one with (field, term) tuple keys, per-field norms and
    per-field collection stats (the FieldInfos model; per-field analyzer
    chains via field_analyzers = the PerFieldAnalyzerWrapper model)."""

    def _invert(series, fcfg, key_of):
        """One lexsort + run-boundary scan inverts the whole flat token
        stream (the nested pandas groupby-per-term form cost ~2 s CPU per
        1.5k-doc partition — pure groupby overhead; this is ~40x less).
        Output is bit-identical: docids ascend per term, freqs are run
        lengths, position arrays are stable-sorted slices so posIncr-0
        duplicates keep their token order."""
        ri, po, fl, fdl = tokenize_to_flat(series, fcfg)
        post, posi = {}, {}
        if len(fl):
            terms, codes = np.unique(np.asarray(fl, dtype=object),
                                     return_inverse=True)
            ri = np.asarray(ri, dtype=np.int64)
            pv0 = np.asarray(po, dtype=np.int64)
            order = np.lexsort((pv0, ri, codes))
            tc, di, pv = codes[order], ri[order], pv0[order]
            tchg = np.r_[True, tc[1:] != tc[:-1]]
            dchg = tchg | np.r_[True, di[1:] != di[:-1]]
            dstart = np.flatnonzero(dchg)          # (term, doc) run starts
            dcount = np.diff(np.r_[dstart, len(tc)])   # tf per run
            d_t, d_d = tc[dstart], di[dstart]
            tstart = np.flatnonzero(np.r_[True, d_t[1:] != d_t[:-1]])
            tcnt = np.diff(np.r_[tstart, len(d_t)])
            pos_split = np.split(pv, dstart[1:])
            terms_l = terms.tolist()
            for k in range(len(terms_l)):
                lo = tstart[k]
                hi = lo + tcnt[k]
                key = key_of(terms_l[k])
                post[key] = (d_d[lo:hi], dcount[lo:hi])
                posi[key] = (d_d[lo:hi], pos_split[lo:hi])
        return post, posi, fdl

    postings, positions, dl = _invert(df[text_col], cfg, lambda t: t)
    norms = int_to_byte4(dl)
    field_norms, fstats = {}, {}
    for fname, fcol in (extra_fields or []):
        fcfg = (field_analyzers or {}).get(fname, cfg)
        fp, fpos, fdl = _invert(df[fcol], fcfg,
                                lambda t, fn=fname: (fn, t))
        postings.update(fp)
        positions.update(fpos)
        field_norms[fname] = int_to_byte4(fdl)
        fstats[fname] = (int((fdl > 0).sum()), int(fdl.sum()))
    doc_freqs = {t: len(p[0]) for t, p in postings.items()}
    ttfs = {t: int(p[1].sum()) for t, p in postings.items()}
    stats = SegmentStats(
        doc_count=int((dl > 0).sum()),
        sum_total_term_freq=int(dl.sum()),
        doc_freqs=doc_freqs, total_term_freqs=ttfs, similarity=similarity,
        field_stats=fstats)
    return InMemoryReader(postings, norms, len(df), positions,
                          field_norms=field_norms), stats


class OracleEngine:
    """Brute-force reference engine: COMPLETE evaluation + exact top-k."""

    def __init__(self, reader: InMemoryReader, stats: SegmentStats):
        self.reader = reader
        self.stats = stats
        self._rewrite_ctx = RewriteContext(
            expand_terms=self._expand,
            term_doc_freqs=lambda keys: {
                k: self.stats.doc_freqs.get(k, 0) for k in keys},
            doc_count=self.stats.doc_count)

    def _expand(self, q):
        import re as _re
        terms = self.reader.terms()
        if isinstance(q, Q.PrefixQuery):
            sel = [t for t in terms if t.startswith(q.prefix)]
        elif isinstance(q, Q.WildcardQuery):
            rx = _re.compile(q.to_regex())
            sel = [t for t in terms if rx.match(t)]
        elif isinstance(q, Q.RegexpQuery):
            rx = _re.compile("^(?:" + q.pattern + ")$")
            sel = [t for t in terms if rx.match(t)]
        elif isinstance(q, Q.TermRangeQuery):
            sel = [t for t in terms
                   if (q.lower is None or t > q.lower
                       or (q.include_lower and t == q.lower))
                   and (q.upper is None or t < q.upper
                        or (q.include_upper and t == q.upper))]
        elif isinstance(q, Q.FuzzyQuery):
            sel = [t for t in terms
                   if (q.prefix_length == 0
                       or t.startswith(q.term[:q.prefix_length]))
                   and abs(len(t) - len(q.term)) <= q.max_edits
                   and ((osa_distance(t, q.term) <= q.max_edits)
                        if q.transpositions
                        else levenshtein_le(t, q.term, q.max_edits))]
        else:
            return None
        return sel[: self._rewrite_ctx.max_expansions]

    def rewrite(self, q: Query) -> Query:
        return rewrite_query(q, self._rewrite_ctx)

    def matches(self, q: Query) -> Matches:
        return evaluate(self.reader, self.stats, self.rewrite(q))

    def search(self, q: Query, k: int) -> pd.DataFrame:
        m = self.matches(q)
        d, s = top_k(m, k)
        return pd.DataFrame({
            "rank": np.arange(1, len(d) + 1, dtype=np.int64),
            "docid": d, "score": s.astype(np.float32)})

    def count(self, q: Query) -> int:
        return len(evaluate(self.reader, self.stats, self.rewrite(q),
                            needs_scores=False).docids)



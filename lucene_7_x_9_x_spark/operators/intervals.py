"""Minimal-interval evaluation — the intervals module's per-document
algebra (solr-8.4.0/lucene/queries/src/java/org/apache/lucene/queries/
intervals/: OrderedIntervalsSource, UnorderedIntervalsSource,
DisjunctionIntervalsSource, MinimizingConjunctionIntervalsSource,
Intervals.maxgaps).

Every node yields this doc's MINIMAL intervals: sorted (start asc), no
interval containing another.  An interval is (start, end, covered) where
covered = the total leaf positions the interval accounts for, so
gaps = (end - start + 1) - covered — equal to Lucene's sum of child gaps
plus between-child gaps when children are disjoint, clamped at 0 for
overlapping unordered children.

The composition is the point (ordered inside unordered inside or — which
the classic span queries cannot express); per-doc evaluation is a Python
tree walk over numpy position arrays, the same cost class as the k>=3
span walks (executor.py) and only paid by candidate docs."""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

from ..plans import query as Q
from ..plans.query import term_key


def minimize(iv: list) -> list:
    """Keep only minimal intervals: drop any (s, e, c) containing another
    interval (s', e') with s' >= s and e' <= e (duplicates collapse to
    one; among same-(s, e) survivors the max-covered one is kept, i.e.
    fewest gaps).  Sort (start asc, end desc, covered asc); scanning from
    the right, an interval survives iff its end is strictly below every
    later interval's end."""
    iv = sorted(iv, key=lambda t: (t[0], -t[1], t[2]))
    out: list = []
    best = None
    for t in reversed(iv):
        if best is None or t[1] < best:
            out.append(t)
            best = t[1]
    out.reverse()
    return out


def _gaps_filter(iv: list, max_gaps) -> list:
    if max_gaps is None:
        return iv
    return [t for t in iv
            if max(0, t[1] - t[0] + 1 - t[2]) <= max_gaps]


def eval_source(src, pos: dict) -> list:
    """Minimal intervals of `src` for one doc; pos maps term ->
    ascending position array (absent term -> missing key)."""
    if isinstance(src, Q.IntervalTerm):
        p = pos.get(src.term)
        if p is None:
            return []
        return [(int(x), int(x), 1) for x in p]
    if isinstance(src, Q.IntervalOr):
        iv: list = []
        for s in src.sources:
            iv.extend(eval_source(s, pos))
        return minimize(iv)
    if isinstance(src, Q.IntervalOrdered):
        child = [eval_source(s, pos) for s in src.sources]
        if any(not c for c in child):
            return []
        starts = [[t[0] for t in c] for c in child]
        cands = []
        for a in child[0]:
            # greedy earliest chain: within a minimal child list starts
            # AND ends both strictly increase, so the first interval with
            # start > prev.end also has the least end
            # (OrderedIntervalsSource.nextInterval)
            s0, e_prev, cov = a
            ok = True
            for cl, st in zip(child[1:], starts[1:]):
                j = bisect_right(st, e_prev)
                if j == len(cl):
                    ok = False
                    break
                e_prev = cl[j][1]
                cov += cl[j][2]
            if not ok:
                break  # later first-child intervals start even later
            cands.append((s0, e_prev, cov))
        return _gaps_filter(minimize(cands), src.max_gaps)
    if isinstance(src, Q.IntervalUnordered):
        child = [eval_source(s, pos) for s in src.sources]
        if any(not c for c in child):
            return []
        ptr = [0] * len(child)
        cands = []
        while True:
            fronts = [c[p] for c, p in zip(child, ptr)]
            s = min(f[0] for f in fronts)
            e = max(f[1] for f in fronts)
            cands.append((s, e, sum(f[2] for f in fronts)))
            # advance the child whose front starts earliest (ties: lowest
            # index) — the plane-sweep enumeration of candidate windows
            j = min(range(len(fronts)), key=lambda i: (fronts[i][0], i))
            ptr[j] += 1
            if ptr[j] == len(child[j]):
                break
        return _gaps_filter(minimize(cands), src.max_gaps)
    if isinstance(src, Q.IntervalFilter):
        sv = eval_source(src.source, pos)
        if not sv:
            return []
        rv = eval_source(src.reference, pos)

        def contains(a, b):   # a contains b
            return a[0] <= b[0] and b[1] <= a[1]

        def overlaps(a, b):
            return not (b[1] < a[0] or b[0] > a[1])

        kind = src.kind
        if kind == "containing":
            keep = lambda s: any(contains(s, r) for r in rv)
        elif kind == "not_containing":
            keep = lambda s: not any(contains(s, r) for r in rv)
        elif kind == "contained_by":
            keep = lambda s: any(contains(r, s) for r in rv)
        elif kind == "not_contained_by":
            keep = lambda s: not any(contains(r, s) for r in rv)
        elif kind == "overlapping":
            keep = lambda s: any(overlaps(s, r) for r in rv)
        else:  # non_overlapping
            keep = lambda s: not any(overlaps(s, r) for r in rv)
        # a filtered subset of a minimal list stays minimal
        return [s for s in sv if keep(s)]
    raise TypeError(f"unknown interval source {type(src).__name__}")


def _required_docids(src, term_docs: dict) -> np.ndarray:
    """Candidate docids: ordered/unordered need every child, or needs any
    (the ConjunctionDISI / DisjunctionDISI role for the interval tree)."""
    if isinstance(src, Q.IntervalTerm):
        return term_docs.get(src.term,
                             np.empty(0, dtype=np.int64))
    if isinstance(src, Q.IntervalFilter):
        return _filter_required(src, term_docs)
    parts = [_required_docids(s, term_docs) for s in src.sources]
    if isinstance(src, Q.IntervalOr):
        return np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.int64)
    out = parts[0]
    for p in parts[1:]:
        out = np.intersect1d(out, p, assume_unique=True)
    return out


def _filter_required(src, term_docs):
    """Candidates for an IntervalFilter node: positive kinds need BOTH
    sides present; negative kinds need only the source (docs without the
    reference keep every source interval)."""
    s_req = _required_docids(src.source, term_docs)
    if src.kind in ("containing", "contained_by", "overlapping"):
        return np.intersect1d(
            s_req, _required_docids(src.reference, term_docs),
            assume_unique=True)
    return s_req


def interval_match(reader, q) -> tuple:
    """(docids, sloppy_freqs) for an IntervalQuery over one segment:
    per candidate doc, freq = float32-accumulated sum of 1/(1 + gaps)
    over the source's minimal intervals (SpanScorer.java:83-121
    sloppyFreq applied to interval gaps)."""
    terms = sorted(Q.interval_terms(q.source))
    per_term: dict = {}
    term_docs: dict = {}
    for t in terms:
        got = reader.positions(term_key(q.field, t))
        if got is None:
            continue
        d, plists = got
        per_term[t] = (d, plists)
        term_docs[t] = d
    cand = _required_docids(q.source, term_docs)
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    # per-doc position lookup indexes (docids are sorted within a term)
    docids_out, freqs_out = [], []
    f32 = np.float32
    for doc in cand:
        pos = {}
        for t, (d, plists) in per_term.items():
            j = np.searchsorted(d, doc)
            if j < len(d) and d[j] == doc:
                pos[t] = plists[j]
        iv = eval_source(q.source, pos)
        if not iv:
            continue
        acc = f32(0.0)
        for s, e, c in iv:
            acc = f32(acc + f32(1.0 / (1.0 + max(0, e - s + 1 - c))))
        docids_out.append(int(doc))
        freqs_out.append(acc)
    return (np.asarray(docids_out, dtype=np.int64),
            np.asarray(freqs_out, dtype=np.float32))

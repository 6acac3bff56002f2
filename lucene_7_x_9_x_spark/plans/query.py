"""Logical query model + normalization rewrites.

Mirrors the reference's Query tree and BooleanQuery rewrite semantics
(behavior, not code):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:44,78-113,235-335
  solr-8.4.0/.../search/BooleanClause.java (Occur = MUST/SHOULD/FILTER/MUST_NOT)
  solr-8.4.0/.../search/IndexSearcher.java:674-680 (fixpoint rewrite loop)
Multi-term queries (prefix/wildcard/regexp/range/set) expand against the
terms dictionary and reuse the Boolean path
(solr-8.4.0/.../search/ScoringRewrite.java, TopTermsRewrite.java).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class Occur(str, Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    FILTER = "FILTER"
    MUST_NOT = "MUST_NOT"


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    """field=None means the index's default field (the single-field case and
    the unqualified-parser case); a named field scopes the term to that
    field's postings/stats/norms (solr-8.4.0/.../index/Term.java — every
    Term is (field, bytes); per-field stats per IndexSearcher.java:790-803)."""
    term: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def __init__(self, terms, slop=0, boost=1.0, field=None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with a term SET per position (solr-8.4.0/lucene/core/src/
    java/org/apache/lucene/search/MultiPhraseQuery.java): slot i matches
    when ANY of its terms sits at the right relative position — a slot's
    postings are the positional UNION of its terms' postings
    (UnionPostingsEnum, :420-470, duplicates kept) — and the sim weight
    is built from the stats of EVERY (slot, term) occurrence with df > 0
    (:229-251: a term listed in two slots contributes its idf twice).
    term_arrays is a tuple of per-position term tuples."""
    term_arrays: tuple
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def __init__(self, term_arrays, slop=0, boost=1.0, field=None):
        object.__setattr__(self, "term_arrays",
                           tuple(tuple(a) for a in term_arrays))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class WildcardPhraseQuery(Query):
    """Phrase whose slots may be wildcard patterns — PhraseWildcardQuery
    (solr-8.4.0/lucene/sandbox/src/java/org/apache/lucene/search/
    PhraseWildcardQuery.java; the query ComplexPhraseQueryParser surfaces
    for '"fa* scan"').  At rewrite, each pattern slot (containing * or ?)
    expands against the terms dictionary into a MultiPhraseQuery slot;
    literal slots pass through.  The reference budgets expansions with
    maxMultiTermExpansions and fails over it (the TooManyClauses
    discipline) — same here, per slot, against a GLOBAL dictionary (the
    reference expands per segment)."""
    patterns: tuple
    slop: int = 0
    boost: float = 1.0
    field: str | None = None
    max_expansions: int = 128

    def __init__(self, patterns, slop=0, boost=1.0, field=None,
                 max_expansions=128):
        object.__setattr__(self, "patterns", tuple(patterns))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "max_expansions", max_expansions)


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one pseudo-term: freqs summed per doc
    (solr-8.4.0/.../search/SynonymQuery.java:55,281-344)."""
    terms: tuple
    boost: float = 1.0
    field: str | None = None

    def __init__(self, terms, boost=1.0, field=None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score match of any term in the set
    (solr-8.4.0/.../search/TermInSetQuery.java)."""
    terms: tuple
    field: str | None = None

    def __init__(self, terms, field=None):
        object.__setattr__(self, "terms", tuple(sorted(set(terms))))
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    field: str | None = None


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # * = any seq, ? = one char
    field: str | None = None

    def to_regex(self) -> str:
        out = []
        for ch in self.pattern:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(re.escape(ch))
        return "^" + "".join(out) + "$"


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str  # anchored, like Lucene RegexpQuery
    field: str | None = None


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str | None = None


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Damerau edit-distance expansion. transpositions=True counts an
    adjacent-character swap as ONE edit (the reference default,
    solr-8.4.0/.../search/FuzzyQuery.java:35,85); prefix_length requires
    that many leading characters to match exactly (FuzzyQuery.java:46)."""
    term: str
    max_edits: int = 2
    transpositions: bool = True
    prefix_length: int = 0
    field: str | None = None


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity over term spans (solr-8.4.0/.../search/spans/
    SpanNearQuery.java). in_order=True (NearSpansOrdered.java:40): docs
    holding occurrences p_1 < p_2 < ... < p_k (one per clause,
    non-overlapping unit-length term spans) whose total gap
    sum(start_{i+1} - end_i) = p_k - p_1 - (k-1) is <= slop.
    in_order=False (NearSpansUnordered.atMatch): one occurrence per clause
    in ANY order with maxEnd - minStart - k = (max_p - min_p + 1) - k <=
    slop; duplicate terms are rejected (distinct sub-spans would be
    needed). Matching AND scoring are exact: SpanScorer's sloppyFreq
    (float32-accumulated sum of 1/(1+width) over the enumerated spans,
    SpanScorer.java:83-121) scored with the SpanWeight sim scorer over
    every distinct term's stats (see executor)."""
    terms: tuple
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0
    field: str | None = None

    def __init__(self, terms, slop=0, in_order=True, boost=1.0, field=None):
        if not in_order and len(set(terms)) != len(tuple(terms)):
            raise NotImplementedError(
                "unordered span-near with repeated terms is not supported")
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "in_order", in_order)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """Union of term spans (solr-8.4.0/.../search/spans/SpanOrQuery.java
    over SpanTermQuery clauses): matches docs holding ANY member term;
    sloppyFreq = total occurrence count across clauses (every enumerated
    span is zero-width, TermSpans.width() == 0, so each weighs 1), scored
    with the SpanWeight summed-idf weight — which is what distinguishes it
    from SynonymQuery's max-df pseudo-term."""
    terms: tuple
    boost: float = 1.0
    field: str | None = None

    def __init__(self, terms, boost=1.0, field=None):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Spans ending within the first `end` positions (solr-8.4.0/.../
    search/spans/SpanFirstQuery.java = SpanPositionRangeQuery with
    start 0) over a term span: occurrences at position < end qualify;
    sloppyFreq = qualifying-occurrence count (zero-width spans)."""
    term: str
    end: int
    boost: float = 1.0
    field: str | None = None


# ---- intervals module (minimal-interval semantics) ------------------------
# The modern proximity algebra of the reference's queries module
# (solr-8.4.0/lucene/queries/src/java/org/apache/lucene/queries/intervals/:
# Intervals.ordered/unordered/or/maxgaps with OrderedIntervalsSource /
# UnorderedIntervalsSource / MinimizingConjunctionIntervalsSource): every
# source yields, per document, its MINIMAL intervals (no interval
# containing another), and sources COMPOSE — ordered inside unordered
# inside or — which the classic span queries cannot.  Evaluation in
# operators/intervals.py.


@dataclass(frozen=True)
class IntervalTerm:
    """Leaf source: one [p, p] interval per occurrence of `term`."""
    term: str


@dataclass(frozen=True)
class IntervalOrdered:
    """Minimal intervals containing one interval of each child IN ORDER,
    successive child intervals non-overlapping (next.start > prev.end —
    OrderedIntervalsSource.nextInterval). max_gaps filters the node's
    minimal intervals on gaps = width - covered (Intervals.maxgaps)."""
    sources: tuple
    max_gaps: int | None = None

    def __init__(self, sources, max_gaps=None):
        object.__setattr__(self, "sources", tuple(sources))
        object.__setattr__(self, "max_gaps", max_gaps)


@dataclass(frozen=True)
class IntervalUnordered:
    """Minimal windows containing one interval of each child in ANY order
    (overlaps allowed — UnorderedIntervalsSource)."""
    sources: tuple
    max_gaps: int | None = None

    def __init__(self, sources, max_gaps=None):
        object.__setattr__(self, "sources", tuple(sources))
        object.__setattr__(self, "max_gaps", max_gaps)


@dataclass(frozen=True)
class IntervalOr:
    """Union of the children's intervals, minimized
    (DisjunctionIntervalsSource)."""
    sources: tuple

    def __init__(self, sources):
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class IntervalPrefix:
    """Multi-term leaf: union of the intervals of every dictionary term
    with this prefix (Intervals.prefix); expanded against the terms
    dictionary at rewrite time like PrefixQuery."""
    prefix: str


@dataclass(frozen=True)
class IntervalWildcard:
    """Multi-term leaf: union over dictionary terms matching the
    wildcard pattern (Intervals.wildcard); rewrite-time expansion."""
    pattern: str


_FILTER_KINDS = ("containing", "not_containing", "contained_by",
                 "not_contained_by", "overlapping", "non_overlapping")


@dataclass(frozen=True)
class IntervalFilter:
    """Filtered view of `source`'s minimal intervals against a
    `reference` source — the intervals module's filter operators
    (queries/intervals/ ContainingIntervalsSource,
    ContainedByIntervalsSource, NotContainingIntervalsSource,
    NotContainedByIntervalsSource, OverlappingIntervalsSource,
    NonOverlappingIntervalsSource; Intervals.containing/notContaining/
    containedBy/notContainedBy/overlapping/nonOverlapping):
      containing        source intervals that contain a reference interval
      not_containing    ... that contain none
      contained_by      source intervals inside a reference interval
      not_contained_by  ... inside none
      overlapping       source intervals overlapping a reference interval
      non_overlapping   ... overlapping none
    Positive kinds require the reference to match the doc too; negative
    kinds keep all source intervals in docs without the reference."""
    source: object
    reference: object
    kind: str

    def __init__(self, source, reference, kind):
        if kind not in _FILTER_KINDS:
            raise ValueError(f"unknown interval filter kind {kind!r}")
        object.__setattr__(self, "source", source)
        object.__setattr__(self, "reference", reference)
        object.__setattr__(self, "kind", kind)


def interval_terms(src) -> set:
    """All leaf terms of an interval source tree (expanded sources only —
    prefix/wildcard leaves must be rewritten first)."""
    if isinstance(src, IntervalTerm):
        return {src.term}
    if isinstance(src, (IntervalPrefix, IntervalWildcard)):
        raise ValueError(
            "interval prefix/wildcard sources must be rewritten against "
            "the terms dictionary first (Searcher.rewrite does this)")
    if isinstance(src, IntervalFilter):
        return interval_terms(src.source) | interval_terms(src.reference)
    return set().union(*[interval_terms(s) for s in src.sources]) \
        if src.sources else set()


def map_interval_sources(src, f):
    """Rebuild an interval source tree with every LEAF mapped through
    f(leaf) (structure nodes rebuilt around the mapped children)."""
    if isinstance(src, (IntervalTerm, IntervalPrefix, IntervalWildcard)):
        return f(src)
    if isinstance(src, IntervalFilter):
        return IntervalFilter(map_interval_sources(src.source, f),
                              map_interval_sources(src.reference, f),
                              src.kind)
    kids = tuple(map_interval_sources(s, f) for s in src.sources)
    if isinstance(src, IntervalOrdered):
        return IntervalOrdered(kids, src.max_gaps)
    if isinstance(src, IntervalUnordered):
        return IntervalUnordered(kids, src.max_gaps)
    return IntervalOr(kids)


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Query over an interval source (queries/intervals/IntervalQuery.java):
    matches docs where the source yields at least one interval; scored with
    the SpanScorer-style sloppyFreq sum(1/(1+gaps)) over the doc's minimal
    intervals and the summed-idf span weight (the reference scores interval
    freq through the same per-interval saturation idea)."""
    source: object
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """queries/CommonTermsQuery.java: terms partition by document
    frequency against `max_term_frequency` (a ratio of docCount when < 1,
    an absolute df otherwise). LOW-frequency terms form the selective
    clause with `low_freq_occur` (the reference's lowFreqOccur; MUST =
    all rare terms required); HIGH-frequency terms become a SHOULD-only
    sibling that influences scoring but cannot match alone — the
    stop-word-resilient query shape. With no low-frequency terms the
    high clause stands alone with `high_freq_occur` per term (the
    reference's degenerate case). Rewrites against the terms dictionary
    (RewriteContext.term_doc_freqs); terms absent from the index count
    as low-frequency, exactly as the reference's zero-df handling."""
    terms: tuple
    max_term_frequency: float = 0.01
    low_freq_occur: "Occur" = Occur.SHOULD
    high_freq_occur: "Occur" = Occur.SHOULD
    boost: float = 1.0
    field: str | None = None

    def __init__(self, terms, max_term_frequency=0.01,
                 low_freq_occur=Occur.SHOULD,
                 high_freq_occur=Occur.SHOULD, boost=1.0, field=None):
        if Occur.MUST_NOT in (low_freq_occur, high_freq_occur):
            raise ValueError("MUST_NOT makes no sense for "
                             "CommonTermsQuery occurs")
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "max_term_frequency",
                           max_term_frequency)
        object.__setattr__(self, "low_freq_occur", low_freq_occur)
        object.__setattr__(self, "high_freq_occur", high_freq_occur)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "field", field)


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    # score contribution is 1.0 * enclosing boost


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    queries: tuple
    tie_breaker: float = 0.0

    def __init__(self, queries, tie_breaker=0.0):
        object.__setattr__(self, "queries", tuple(queries))
        object.__setattr__(self, "tie_breaker", tie_breaker)


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple
    minimum_should_match: int = 0

    def __init__(self, clauses, minimum_should_match=0):
        cl = tuple(c if isinstance(c, BooleanClause) else BooleanClause(*c)
                   for c in clauses)
        if len(cl) > 1024:
            raise ValueError("too many clauses (max 1024)")  # BooleanQuery.java:44
        object.__setattr__(self, "clauses", cl)
        object.__setattr__(self, "minimum_should_match", minimum_should_match)


@dataclass
class RewriteContext:
    """Driver-side stats for rewrites that need the term dictionary."""
    expand_terms: object = None  # callable(Query) -> list[str] | None
    max_expansions: int = 1024
    # callable(set of term KEYS) -> {key: doc_freq} and the collection
    # doc count — used by df-dependent rewrites (CommonTermsQuery)
    term_doc_freqs: object = None
    doc_count: int = 0


def rewrite(q: Query, ctx: RewriteContext | None = None) -> Query:
    """Fixpoint normalization (IndexSearcher.java:674-680)."""
    for _ in range(16):
        q2 = _rewrite_once(q, ctx)
        if q2 == q:
            return q2
        q = q2
    return q


def _rewrite_once(q: Query, ctx) -> Query:
    if isinstance(q, BoostQuery):
        inner = _rewrite_once(q.query, ctx)
        if isinstance(inner, TermQuery):
            return TermQuery(inner.term, inner.boost * q.boost, inner.field)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if isinstance(inner, BoostQuery):
            return BoostQuery(inner.query, inner.boost * q.boost)
        return BoostQuery(inner, q.boost)

    if isinstance(q, CommonTermsQuery) and ctx is not None \
            and ctx.term_doc_freqs is not None:
        keys = {term_key(q.field, t) for t in q.terms}
        dfs = ctx.term_doc_freqs(keys)
        cutoff = (q.max_term_frequency if q.max_term_frequency >= 1
                  else q.max_term_frequency * max(ctx.doc_count, 1))
        low, high = [], []
        for t in q.terms:
            (high if dfs.get(term_key(q.field, t), 0) > cutoff
             else low).append(t)
        def bq(ts, occur):
            return BooleanQuery([(occur, TermQuery(t, field=q.field))
                                 for t in ts])
        if not low:
            out = bq(high, q.high_freq_occur)
        elif not high:
            out = bq(low, q.low_freq_occur)
        else:
            # the reference's two-clause form: the low (selective) clause
            # is REQUIRED, the high clause only adds score
            out = BooleanQuery([(Occur.MUST, bq(low, q.low_freq_occur)),
                                (Occur.SHOULD, bq(high, Occur.SHOULD))])
        return BoostQuery(out, q.boost) if q.boost != 1.0 else out

    if isinstance(q, IntervalQuery) and ctx is not None and ctx.expand_terms:
        def xleaf(leaf):
            if isinstance(leaf, IntervalPrefix):
                got = ctx.expand_terms(PrefixQuery(leaf.prefix,
                                                   field=q.field))
            elif isinstance(leaf, IntervalWildcard):
                got = ctx.expand_terms(WildcardQuery(leaf.pattern,
                                                     field=q.field))
            else:
                return leaf
            # empty expansion -> a source with no terms (never matches)
            return IntervalOr(tuple(IntervalTerm(t) for t in (got or [])))
        src2 = map_interval_sources(q.source, xleaf)
        if src2 != q.source:
            return IntervalQuery(src2, q.boost, q.field)

    if isinstance(q, WildcardPhraseQuery) and ctx is not None \
            and ctx.expand_terms:
        slots = []
        for p in q.patterns:
            if "*" in p or "?" in p:
                got = ctx.expand_terms(WildcardQuery(p, field=q.field))
                if got is None:
                    return q  # dictionary unavailable: leave unrewritten
                if not got:
                    return MatchNoDocsQuery()
                if len(got) > q.max_expansions:
                    raise ValueError(
                        f"wildcard phrase slot {p!r} expands to "
                        f"{len(got)} terms > max_expansions="
                        f"{q.max_expansions} (the PhraseWildcardQuery "
                        "maxMultiTermExpansions / TooManyClauses guard)")
                slots.append(tuple(sorted(got)))
            else:
                slots.append((p,))
        if all(len(s) == 1 for s in slots):
            return PhraseQuery([s[0] for s in slots], q.slop, q.boost,
                               q.field)
        return MultiPhraseQuery(slots, q.slop, q.boost, q.field)

    if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery,
                      FuzzyQuery)) and ctx is not None and ctx.expand_terms:
        terms = ctx.expand_terms(q)
        if terms is not None:
            if not terms:
                return MatchNoDocsQuery()
            return ConstantScoreQuery(TermInSetQuery(terms, field=q.field))

    if not isinstance(q, BooleanQuery):
        return q

    clauses = [BooleanClause(c.occur, _rewrite_once(c.query, ctx))
               for c in q.clauses]

    # BooleanQuery.java rewrite region (~:235-335), behaviorally:
    if len(clauses) == 0:
        return MatchNoDocsQuery()
    # 1-clause simplifications. minimum_should_match constrains SHOULD
    # clauses only: a lone SHOULD absorbs msm <= 1, but a lone MUST/FILTER/
    # MUST_NOT with msm >= 1 has no SHOULD clause to satisfy it and matches
    # nothing (the msm > |SHOULD| rule below)
    if len(clauses) == 1:
        c = clauses[0]
        if c.occur == Occur.SHOULD and q.minimum_should_match <= 1:
            return c.query
        if q.minimum_should_match == 0:
            if c.occur == Occur.MUST:
                return c.query
            if c.occur == Occur.FILTER:
                return BoostQuery(ConstantScoreQuery(c.query), 0.0)
            if c.occur == Occur.MUST_NOT:
                return MatchNoDocsQuery()
    # drop MatchNone SHOULD/ MUST_NOT MatchNone; MatchAll MUST_NOT -> none
    out = []
    for c in clauses:
        if isinstance(c.query, MatchNoDocsQuery):
            if c.occur in (Occur.MUST, Occur.FILTER):
                return MatchNoDocsQuery()
            continue  # SHOULD/MUST_NOT MatchNone: drop
        if isinstance(c.query, MatchAllDocsQuery) and c.occur == Occur.MUST_NOT:
            return MatchNoDocsQuery()
        out.append(c)
    clauses = out
    # dedup FILTER / MUST_NOT
    seen, dedup = set(), []
    for c in clauses:
        key = (c.occur, c.query)
        if c.occur in (Occur.FILTER, Occur.MUST_NOT) and key in seen:
            continue
        seen.add(key)
        dedup.append(c)
    clauses = dedup
    # MUST n MUST_NOT on same query -> MatchNone
    musts = {c.query for c in clauses if c.occur in (Occur.MUST, Occur.FILTER)}
    if any(c.occur == Occur.MUST_NOT and c.query in musts for c in clauses):
        return MatchNoDocsQuery()
    # FILTER duplicated by MUST -> drop the FILTER
    must_only = {c.query for c in clauses if c.occur == Occur.MUST}
    clauses = [c for c in clauses
               if not (c.occur == Occur.FILTER and c.query in must_only)]
    if not clauses:
        return MatchNoDocsQuery()
    # msm demands more SHOULD matches than SHOULD clauses exist -> nothing
    # can satisfy it (matches _evaluate_boolean's empty result)
    n_should = sum(1 for c in clauses if c.occur == Occur.SHOULD)
    if q.minimum_should_match > n_should:
        return MatchNoDocsQuery()
    return BooleanQuery(tuple(clauses), q.minimum_should_match)


def term_key(field: str | None, term: str):
    """Kernel/stats lookup key: the bare term for the default field (the
    single-field fast path keeps string keys), a (field, term) tuple for a
    named non-default field."""
    return term if field is None else (field, term)


def key_field(key) -> str | None:
    """Inverse of term_key: the field a lookup key is scoped to."""
    return None if isinstance(key, str) else key[0]


def key_term(key) -> str:
    return key if isinstance(key, str) else key[1]


def scoring_terms(q: Query) -> set:
    """All term KEYS whose postings the executor must read (bare term =
    default field, (field, term) tuple = named field; see term_key)."""
    if isinstance(q, TermQuery):
        return {term_key(q.field, q.term)}
    if isinstance(q, (PhraseQuery, SynonymQuery, SpanNearQuery,
                      SpanOrQuery)):
        return {term_key(q.field, t) for t in q.terms}
    if isinstance(q, SpanFirstQuery):
        return {term_key(q.field, q.term)}
    if isinstance(q, MultiPhraseQuery):
        return {term_key(q.field, t)
                for slot in q.term_arrays for t in slot}
    if isinstance(q, IntervalQuery):
        return {term_key(q.field, t) for t in interval_terms(q.source)}
    if isinstance(q, CommonTermsQuery):
        return {term_key(q.field, t) for t in q.terms}
    if isinstance(q, TermInSetQuery):
        return {term_key(q.field, t) for t in q.terms}
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return scoring_terms(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        return set().union(*[scoring_terms(s) for s in q.queries]) if q.queries else set()
    if isinstance(q, BooleanQuery):
        return set().union(*[scoring_terms(c.query) for c in q.clauses]) if q.clauses else set()
    return set()


def map_fields(q: Query, f) -> Query:
    """Rebuild the query tree with each field-carrying leaf's field mapped
    through f(field) (used by the Searcher to canonicalize the index's
    default-field NAME to None and to validate field names)."""
    if isinstance(q, TermQuery):
        return TermQuery(q.term, q.boost, f(q.field))
    if isinstance(q, PhraseQuery):
        return PhraseQuery(q.terms, q.slop, q.boost, f(q.field))
    if isinstance(q, MultiPhraseQuery):
        return MultiPhraseQuery(q.term_arrays, q.slop, q.boost, f(q.field))
    if isinstance(q, WildcardPhraseQuery):
        return WildcardPhraseQuery(q.patterns, q.slop, q.boost, f(q.field),
                                   q.max_expansions)
    if isinstance(q, SynonymQuery):
        return SynonymQuery(q.terms, q.boost, f(q.field))
    if isinstance(q, TermInSetQuery):
        return TermInSetQuery(q.terms, f(q.field))
    if isinstance(q, PrefixQuery):
        return PrefixQuery(q.prefix, f(q.field))
    if isinstance(q, WildcardQuery):
        return WildcardQuery(q.pattern, f(q.field))
    if isinstance(q, RegexpQuery):
        return RegexpQuery(q.pattern, f(q.field))
    if isinstance(q, TermRangeQuery):
        return TermRangeQuery(q.lower, q.upper, q.include_lower,
                              q.include_upper, f(q.field))
    if isinstance(q, SpanNearQuery):
        return SpanNearQuery(q.terms, q.slop, q.in_order, q.boost,
                             f(q.field))
    if isinstance(q, SpanOrQuery):
        return SpanOrQuery(q.terms, q.boost, f(q.field))
    if isinstance(q, SpanFirstQuery):
        return SpanFirstQuery(q.term, q.end, q.boost, f(q.field))
    if isinstance(q, IntervalQuery):
        return IntervalQuery(q.source, q.boost, f(q.field))
    if isinstance(q, CommonTermsQuery):
        return CommonTermsQuery(q.terms, q.max_term_frequency,
                                q.low_freq_occur, q.high_freq_occur,
                                q.boost, f(q.field))
    if isinstance(q, FuzzyQuery):
        return FuzzyQuery(q.term, q.max_edits, q.transpositions,
                          q.prefix_length, f(q.field))
    if isinstance(q, BoostQuery):
        return BoostQuery(map_fields(q.query, f), q.boost)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(map_fields(q.query, f))
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery([map_fields(s, f) for s in q.queries],
                                   q.tie_breaker)
    if isinstance(q, BooleanQuery):
        return BooleanQuery([BooleanClause(c.occur, map_fields(c.query, f))
                             for c in q.clauses], q.minimum_should_match)
    return q

"""Query monitoring / percolation — the reference monitor module's core
capability (solr-8.4.0/lucene/monitor/src/java/org/apache/lucene/monitor/
Monitor.java: register queries once, stream documents through
Monitor.match(), report which registered queries match each document —
reverse search / alerting).

Spark-first shape: queries are the SMALL side and documents the big side —
the opposite of normal search — so the registered query set is BROADCAST,
and each input partition builds a short-lived in-memory index of its batch
(the MemoryIndex / DocumentBatch.of model, monitor/DocumentBatch.java) and
evaluates queries against it via the shared executor. A
TermFilteredPresearcher-style prefilter (monitor/TermFilteredPresearcher.java
capability) skips queries none of whose terms appear in the batch
vocabulary: with many registered queries, only those sharing vocabulary
with a batch are evaluated at all.

Works identically on batch and streaming DataFrames (percolation is
per-document stateless, so mapInPandas needs no state store); for streams,
feed the result straight to writeStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.analysis import AnalyzerConfig
from ..plans import query as Q


def _query_terms(q) -> set:
    """Term keys from REQUIRED/OPTIONAL context only: the presearcher may
    skip a query only when NO batch term could let it match, and MUST_NOT
    terms never help a query match — including them would wrongly skip
    `MatchAll AND NOT x` in batches that lack x (the batches it matches
    completely). This is the reference presearcher's rule too
    (TermFilteredPresearcher indexes only the positive-context terms)."""
    if isinstance(q, Q.BooleanQuery):
        out = set()
        for c in q.clauses:
            if c.occur != Q.Occur.MUST_NOT:
                out |= _query_terms(c.query)
        return out
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return _query_terms(q.query)
    if isinstance(q, Q.DisjunctionMaxQuery):
        return (set().union(*[_query_terms(s) for s in q.queries])
                if q.queries else set())
    return Q.scoring_terms(q)


def _cover_terms(q, weight) -> set | None:
    """MINIMAL covering term set for the indexed presearcher — the
    reference's QueryAnalyzer tree walk (monitor/QueryAnalyzer.java +
    TermFilteredPresearcher.java): a doc can match `q` only if it contains
    at least one term of the returned set. Conjunctions contribute ONLY
    their most selective child (the TermWeightor idea — indexing a
    conjunction's stop-term alongside its rare term would pair the query
    with nearly every doc in the candidate join for zero benefit);
    disjunctions must contribute every child. Returns None when the
    subtree can match a doc containing none of its terms (MatchAll)."""
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return _cover_terms(q.query, weight)
    if isinstance(q, Q.MatchAllDocsQuery):
        return None
    if isinstance(q, Q.BooleanQuery):
        conj = [c.query for c in q.clauses
                if c.occur in (Q.Occur.MUST, Q.Occur.FILTER)]
        if conj:
            best = None
            for c in conj:
                cov = _cover_terms(c, weight)
                if cov is None or not cov:
                    continue  # a MatchAll/term-free child can't cover
                if best is None or _set_weight(cov, weight) > \
                        _set_weight(best, weight):
                    best = cov
            return best  # None when every required child is term-free
        out: set = set()
        for c in q.clauses:
            if c.occur == Q.Occur.MUST_NOT:
                continue
            cov = _cover_terms(c.query, weight)
            if cov is None:
                return None  # one term-free disjunct voids the cover
            out |= cov
        return out if out else None
    if isinstance(q, Q.DisjunctionMaxQuery):
        out = set()
        for s in q.queries:
            cov = _cover_terms(s, weight)
            if cov is None:
                return None
            out |= cov
        return out if out else None
    if isinstance(q, (Q.PhraseQuery, Q.SpanNearQuery)):
        # a phrase/span-near is a conjunction of its terms: index only the
        # most selective one (term KEYS — bare strings or (field, term))
        ts = set(Q.scoring_terms(q))
        if not ts:
            return set()
        return {max(ts, key=lambda t: (weight(t), repr(t)))}
    if isinstance(q, Q.MultiPhraseQuery):
        # a multi-phrase is a conjunction of slots, each slot a
        # disjunction: a valid cover is ONE slot's full term set — pick
        # the slot whose weakest alternative is the most selective
        slots = [{Q.term_key(q.field, t) for t in slot}
                 for slot in q.term_arrays if slot]
        if not slots:
            return set()
        return max(slots, key=lambda sl: _set_weight(sl, weight))
    return set(Q.scoring_terms(q))


def _set_weight(cov: set, weight) -> tuple:
    """Selectivity of a covering set = its WEAKEST term (the most frequent
    term dominates the candidate-join cost); ties prefer smaller sets.
    Keys mix bare strings and (field, term) tuples — compare via repr."""
    return (min(weight(t) for t in cov), -len(cov),
            min((repr(t) for t in cov)))


# one definition of "contains MatchAll" for the whole engine — the
# searcher's coverage logic and the presearcher must never disagree
from ..searcher import _contains_matchall  # noqa: E402


def register_queries(spark, queries: dict, term_df: dict | None = None):
    """Build the indexed-presearcher tables for percolate_indexed — the
    reference Monitor's query index (Monitor.register /
    QueryIndex.java: queries are themselves indexed so candidate
    selection is a SEARCH, not a scan):
      qterms (query_id, term)  — each query's MINIMAL covering term set
                                 (TermFilteredPresearcher extraction:
                                 conjunctions index only their most
                                 selective term, so a stop-term inside an
                                 AND never floods the candidate join)
      qdefs  (query_id, qdef)  — pickled query trees for the verify stage
      plus the list of match-anything query ids (MatchAll-containing or
      term-free), which bypass the candidate join.
    term_df: optional {term: doc_freq} corpus statistics (e.g. from an
    IndexSnapshot's terms table) — the TermWeightor: lower df = more
    selective. Without it, token length is the selectivity proxy (longer
    terms are rarer; the reference's default weighting combines the same
    signals, monitor/TermWeightor.java).
    Scales to millions of registered queries: both tables are plain
    DataFrames, nothing is broadcast."""
    import pickle
    from ..plans.query import key_field, key_term
    if term_df:
        def weight(t):
            return (-term_df.get(t, 0), len(key_term(t)))
    else:
        def weight(t):
            return (len(key_term(t)),)
    qterm_rows, qdef_rows, match_all = [], [], []
    for qid, q in sorted(queries.items()):
        cover = _cover_terms(q, weight)
        if cover is None or _contains_matchall(q):
            match_all.append(qid)
            cover = set()
        elif not cover:
            raise ValueError(
                f"query {qid!r} has no terms and no MatchAll — rewrite "
                "dictionary-dependent queries before registering")
        qdef_rows.append((qid, bytearray(pickle.dumps(q))))
        # field '' = the default field (a non-null sentinel so the
        # candidate equi-join needs no null-safe comparison)
        for t in sorted(cover, key=repr):
            qterm_rows.append((qid, key_field(t) or "", key_term(t)))
    qterms = spark.createDataFrame(qterm_rows or [("", "", "")],
                                   "query_id string, field string, "
                                   "term string")
    if not qterm_rows:
        qterms = qterms.where(F.lit(False))
    qdefs = spark.createDataFrame(qdef_rows,
                                  "query_id string, qdef binary")
    return qterms, qdefs, match_all


def percolate_indexed(docs: DataFrame, qterms: DataFrame, qdefs: DataFrame,
                      match_all: list, id_col: str = "doc_id",
                      text_col: str = "text",
                      analyzer: AnalyzerConfig | None = None,
                      extra_fields: list | None = None) -> DataFrame:
    """percolate() for LARGE registered-query sets: instead of
    broadcasting every query to every task, candidates come from a
    relational presearcher join — (doc, distinct term) x (query_id, term)
    — and only a doc's candidate queries are verified against that doc
    (the reference's QueryIndex search + MemoryIndex verify split,
    monitor/Monitor.java match()). All stages are keyed shuffles (term,
    then query_id, then doc): nothing scales with |queries| x |docs|
    except the true candidate pairs. MatchAll-containing queries bypass
    the join and are verified against every doc.

    extra_fields: [(field_name, column)] — field-scoped registered
    queries match against their field's column: the candidate side unions
    each field's distinct tokens tagged with the field name and joins on
    (field, term); the verify stage builds a multi-field memory index.
    A query term on a field NOT supplied here simply never matches (the
    field has no postings), which is also what a real index would do.

    Batch DataFrames only: the candidate join + per-doc grouped verify are
    multi-shuffle stateful plans that Structured Streaming's grouped-map
    UDF support does not cover — for streams, use percolate() (stateless
    mapInPandas) or drive this from foreachBatch."""
    if docs.isStreaming:
        raise ValueError("percolate_indexed requires a batch DataFrame; "
                         "for streams use percolate() or call this from "
                         "foreachBatch")
    spark = docs.sparkSession
    n_par = spark.sparkContext.defaultParallelism
    xf = list(extra_fields or [])
    src = docs.select(id_col, text_col,
                      *[c for _, c in xf]).repartition(n_par)
    from ..pipeline.dedup import tokens_col

    def toks_of(col):
        return F.array_distinct(tokens_col(col))

    if analyzer is not None and (
            analyzer.stopwords
            or analyzer.token_regex != "[a-z0-9_]+"
            or analyzer.max_token_length
            != AnalyzerConfig().max_token_length
            or analyzer.stemmer is not None):
        # the JVM-side candidate vocabulary above must agree with the
        # verify-time tokenizer (incl. oversize-token splitting) or a
        # query on a split-chunk term would silently never be a candidate
        raise ValueError("percolate_indexed presearcher supports the "
                         "default analyzer only (candidate terms must "
                         "match the verify-time tokenizer)")
    # (field, term) candidate rows; '' = the default field (same sentinel
    # as register_queries, so the join is a plain two-column equi-join)
    doc_terms = src.select(id_col, F.lit("").alias("field"),
                           F.explode(toks_of(text_col)).alias("term"))
    for fname, fcol in xf:
        doc_terms = doc_terms.unionByName(
            src.select(id_col, F.lit(fname).alias("field"),
                       F.explode(toks_of(fcol)).alias("term")))
    cand = (doc_terms.join(qterms, ["field", "term"])
            .select(id_col, "query_id").distinct())
    if match_all:
        ma = spark.createDataFrame([(q,) for q in match_all],
                                   "query_id string")
        cand = cand.unionByName(
            src.select(id_col).crossJoin(F.broadcast(ma))
            .select(id_col, "query_id")).distinct()
    # candidates aggregate per doc BEFORE the text join, so each doc's
    # full text is shuffled exactly ONCE however many candidate queries it
    # has (joining text per candidate pair duplicated hot docs' text
    # thousands of times at skew — the round-3 scale hazard); the qdef
    # join stays per-pair but qdefs are small pickled trees, and both
    # joins are plain equi-joins AQE's skew-join splitting can rebalance
    per_doc = (cand.join(qdefs, "query_id")
               .groupBy(id_col)
               .agg(F.collect_list(F.struct("query_id", "qdef"))
                    .alias("cands"))
               .join(src, id_col)
               .select(id_col, text_col, *[c for _, c in xf], "cands"))

    cfg = analyzer
    xf_local = xf  # plain list: safe to close over (no Spark objects)
    id_type = dict((f.name, f.dataType.simpleString())
                   for f in docs.schema.fields)[id_col]

    def verify(batches):
        import pickle
        import pandas as pd
        from ..oracle import index_corpus
        from ..operators.executor import evaluate
        memo: dict = {}
        for pdf in batches:
            out_q, out_i = [], []
            for r in pdf.itertuples():
                cols = {text_col: [getattr(r, text_col)]}
                for _, c in xf_local:
                    cols[c] = [getattr(r, c)]
                reader, stats = index_corpus(
                    pd.DataFrame(cols), text_col=text_col, cfg=cfg,
                    extra_fields=xf_local)
                rid = getattr(r, id_col)
                for c in r.cands:
                    qid = c["query_id"]
                    q = memo.get(qid)
                    if q is None:
                        q = memo[qid] = pickle.loads(bytes(c["qdef"]))
                    m = evaluate(reader, stats, q, needs_scores=False)
                    if len(m.docids):
                        out_q.append(qid)
                        out_i.append(rid)
            yield pd.DataFrame({"query_id": out_q, id_col: out_i})

    # explicit repartition: the verify UDF is compute-bound (per-doc
    # memory index + query evaluation), and AQE would otherwise coalesce
    # the grouped-UDF shuffle to ~64MB partitions (the repo's documented
    # AQE landmine — see build_index hash mode)
    return (per_doc.repartition(n_par, id_col)
            .mapInPandas(verify,
                         schema=f"query_id string, {id_col} {id_type}"))


def percolate(docs: DataFrame, queries: dict, id_col: str = "doc_id",
              text_col: str = "text",
              analyzer: AnalyzerConfig | None = None,
              extra_fields: list | None = None) -> DataFrame:
    """Match every registered query against every document: returns
    DataFrame(query_id string, <id_col>) with one row per (query, matching
    doc). `queries` maps query_id -> a term-based Query tree (queries
    needing dictionary rewrites — wildcard/fuzzy/prefix — must be
    rewritten against a real index first; the reference Monitor likewise
    decomposes queries at registration time, monitor/QueryDecomposer.java).

    extra_fields: [(field_name, column)] — the per-batch memory index is
    MULTI-FIELD (MemoryIndex.addField per field): field-scoped query
    terms match against their field's column with per-field norms/stats.
    Queries may only reference registered field names.

    Matching only (ScoreMode.COMPLETE_NO_SCORES): the reference's
    Monitor.match with QueryMatch.SIMPLE_MATCHER."""
    xf = list(extra_fields or [])
    known = {n for n, _ in xf}
    qitems = sorted(queries.items())
    for qid, q in qitems:
        terms = Q.scoring_terms(q)
        bad = {t[0] for t in terms
               if not isinstance(t, str) and t[0] not in known}
        if bad:
            raise ValueError(
                f"query {qid!r} is field-scoped on unregistered "
                f"field(s) {sorted(bad)} — pass extra_fields=[(name, "
                "column)] to percolate against named fields")
        if terms == set() and not _contains_matchall(q) \
                and not isinstance(q, Q.MatchNoDocsQuery):
            raise ValueError(
                f"query {qid!r} has no terms and no MatchAll — rewrite "
                "dictionary-dependent queries before registering")
    bc = docs.sparkSession.sparkContext.broadcast(qitems)
    cfg = analyzer

    def run(batches):
        import pandas as pd
        from ..oracle import index_corpus
        from ..operators.executor import evaluate
        for pdf in batches:
            if not len(pdf):
                continue
            reader, stats = index_corpus(pdf, text_col=text_col, cfg=cfg,
                                         extra_fields=xf)
            vocab = reader.term_keys()
            ids = pdf[id_col].to_numpy()
            out_q, out_i = [], []
            for qid, q in bc.value:
                need = _query_terms(q)
                if need and not (need & vocab) \
                        and not _contains_matchall(q):
                    continue  # presearcher skip
                m = evaluate(reader, stats, q, needs_scores=False)
                if len(m.docids):
                    out_q.extend([qid] * len(m.docids))
                    out_i.extend(ids[m.docids].tolist())
            yield pd.DataFrame({"query_id": out_q, id_col: out_i})

    id_type = dict((f.name, f.dataType.simpleString())
                   for f in docs.schema.fields)[id_col]
    src = docs.select(id_col, text_col, *[c for _, c in xf])
    if not docs.isStreaming:
        # single-file corpora scan as ONE partition (the repo's documented
        # CollapseProject/single-partition landmine): spread the per-batch
        # indexing across cores. Streaming sources keep their micro-batch
        # partitioning (repartition would force a shuffle per batch).
        src = src.repartition(
            docs.sparkSession.sparkContext.defaultParallelism)
    return src.mapInPandas(run,
                           schema=f"query_id string, {id_col} {id_type}")

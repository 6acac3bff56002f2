"""Classic query-string parser -> plans.query tree.

Behavior transcription of the reference's classic QueryParser grammar subset
(solr-8.4.0/lucene/queryparser/src/java/org/apache/lucene/queryparser/
classic/QueryParser.jj and QueryParserBase.java:374-420 addClause):

  query      := ( conjunction? modifier? clause )*
  conjunction:= AND | && | OR | ||
  modifier   := + | - | NOT | !
  clause     := (field ":")? ( term | "phrase"(~slop)? | [a TO b]
                | {a TO b} | ( query ) )
  suffixes   := ^boost (terms, phrases, groups), ~edits (fuzzy, terms only)
  wildcards  := * (any sequence) and ? (one char) inside a term

Clause occurrence follows QueryParserBase.addClause exactly: an AND
retroactively upgrades the preceding non-prohibited clause to MUST; with
default operator AND an OR downgrades it to SHOULD; the current clause is
MUST if introduced by AND or '+', MUST_NOT for '-'/NOT, else SHOULD under
the default OR operator (required unless introduced by OR under AND).

Terms are analyzed with the engine's analyzer (lowercase [a-z0-9_]+): a term
that analyzes to nothing is dropped (the analyzer-filtered null query of
addClause); one that splits into several tokens becomes an exact phrase.
A ``field:`` prefix scopes the following clause to that field
(QueryParserBase.java:66-87 field handling); on a group ``field:(a b)`` it
applies to every leaf inside that has no explicit field of its own. The
Searcher maps the index's default-field name to the unqualified form.
"""

from __future__ import annotations

import re

from . import query as Q

_TOKEN_RE = re.compile(r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<boost>\^(?P<boost_val>\d+(?:\.\d+)?))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<field>(?P<field_name>[A-Za-z_][A-Za-z0-9_]*):)
  | (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?)
  | (?P<range>(?P<lb>[\[{])(?P<lo>[^\]}\s]+)\s+TO\s+(?P<hi>[^\]}\s]+)
       (?P<rb>[\]}]))
  | (?P<term>(?:\\.|[^\s()!"^+\-\\])(?:\\.|[^\s()"^\\])*)
  | (?P<ws>\s+)
""", re.VERBOSE)

_ANALYZE_RE = re.compile(r"[a-z0-9_]+")


class QueryParseError(ValueError):
    pass


def _tokenize(s: str) -> list:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if m is None:
            raise QueryParseError(f"cannot tokenize at {s[i:i + 20]!r}")
        i = m.end()
        kind = m.lastgroup if m.lastgroup != "ws" else None
        # named subgroups make lastgroup unreliable; resolve explicitly
        for k in ("lparen", "rparen", "boost", "and", "or", "not", "plus",
                  "minus", "field", "phrase", "range", "term"):
            if m.group(k):
                out.append((k, m))
                break
    return out


def _analyze(text: str) -> list[str]:
    return _ANALYZE_RE.findall(text.lower())


def _unescape(text: str) -> str:
    return re.sub(r"\\(.)", r"\1", text)


def _has_unescaped(text: str, chars: str) -> bool:
    i = 0
    while i < len(text):
        if text[i] == "\\":
            i += 2
            continue
        if text[i] in chars:
            return True
        i += 1
    return False


def _term_clause(text: str):
    """One bare term token -> Query (fuzzy / wildcard / prefix / analyzed).
    Backslash escapes make specials literal (QueryParserBase.escape):
    an escaped * ? ~ is just a character the analyzer will strip."""
    fm = re.fullmatch(r"(.*[^~\\])~(\d?)", text)
    if fm and not _has_unescaped(fm.group(1), "*?"):
        base = _analyze(_unescape(fm.group(1)))
        if not base:
            return None
        edits = int(fm.group(2)) if fm.group(2) else 2
        return Q.FuzzyQuery(base[-1], max_edits=min(edits, 2))
    if _has_unescaped(text, "*?"):
        # wildcard pattern keeps UNESCAPED metacharacters; escaped ones
        # become literals (dropped by the term charset downstream anyway)
        low = text.lower()
        if (low.endswith("*") and not low.endswith("\\*")
                and not _has_unescaped(low[:-1], "*?")):
            return Q.PrefixQuery(_unescape(low[:-1]))
        return Q.WildcardQuery(low)
    toks = _analyze(_unescape(text))
    if not toks:
        return None
    if len(toks) == 1:
        return Q.TermQuery(toks[0])
    return Q.PhraseQuery(toks)  # analyzer split one token into several


def _boost(q, b: float):
    if isinstance(q, Q.TermQuery):
        return Q.TermQuery(q.term, q.boost * b, q.field)
    return Q.BoostQuery(q, b)


def _add_clause(clauses: list, conj: str | None, mod: str | None, q,
                default_and: bool) -> None:
    """QueryParserBase.addClause semantics (QueryParserBase.java:374-420)."""
    if clauses and conj == "and":
        last = clauses[-1]
        if last.occur != Q.Occur.MUST_NOT:
            clauses[-1] = Q.BooleanClause(Q.Occur.MUST, last.query)
    if clauses and default_and and conj == "or":
        last = clauses[-1]
        if last.occur != Q.Occur.MUST_NOT:
            clauses[-1] = Q.BooleanClause(Q.Occur.SHOULD, last.query)
    if q is None:  # analyzer filtered the term away
        return
    prohibited = mod == "not"
    if default_and:
        required = not prohibited and conj != "or"
    else:
        required = (mod == "req") or (conj == "and" and not prohibited)
    occur = (Q.Occur.MUST_NOT if prohibited
             else Q.Occur.MUST if required else Q.Occur.SHOULD)
    clauses.append(Q.BooleanClause(occur, q))


def _finish(clauses: list):
    if not clauses:
        return Q.MatchNoDocsQuery()
    if len(clauses) == 1 and clauses[0].occur == Q.Occur.SHOULD:
        return clauses[0].query
    return Q.BooleanQuery(tuple(clauses))


def parse(s: str, default_operator: str = "OR") -> Q.Query:
    """Parse a classic query string into a Query tree. default_operator is
    "OR" (Lucene's default) or "AND"."""
    toks = _tokenize(s)
    default_and = default_operator.upper() == "AND"
    q, i = _parse_query(toks, 0, default_and)
    if i != len(toks):
        raise QueryParseError("unbalanced ')'")
    return q


def _parse_query(toks: list, i: int, default_and: bool):
    clauses: list = []
    while i < len(toks):
        kind, m = toks[i]
        if kind == "rparen":
            return _finish(clauses), i
        conj = None
        if kind in ("and", "or"):
            conj, i = kind, i + 1
            if i >= len(toks):
                break
            kind, m = toks[i]
        mod = None
        if kind in ("plus", "minus", "not"):
            mod = "req" if kind == "plus" else "not"
            i += 1
            if i >= len(toks):
                raise QueryParseError("dangling modifier")
            kind, m = toks[i]
        fieldname = None
        if kind == "field":
            fieldname = m.group("field_name")
            i += 1
            if i >= len(toks):
                raise QueryParseError("dangling field prefix")
            kind, m = toks[i]
        if kind == "lparen":
            sub, i = _parse_query(toks, i + 1, default_and)
            if i >= len(toks) or toks[i][0] != "rparen":
                raise QueryParseError("missing ')'")
            i += 1
            q = sub if not isinstance(sub, Q.MatchNoDocsQuery) else None
        elif kind == "phrase":
            body = m.group("phrase_body")
            slop = int(m.group("slop")) if m.group("slop") else 0
            if _has_unescaped(body, "*?"):
                # ComplexPhraseQueryParser role (solr-8.4.0/lucene/
                # queryparser/.../complexPhrase/ComplexPhraseQueryParser
                # .java): wildcards inside a quoted phrase build a
                # dictionary-expanded phrase (PhraseWildcardQuery)
                pats = re.findall(r"[a-z0-9_*?]+",
                                  _unescape(body).lower())
                q = (None if not pats
                     else Q.WildcardQuery(pats[0]) if len(pats) == 1
                     else Q.WildcardPhraseQuery(pats, slop=slop))
            else:
                terms = _analyze(body)
                q = (None if not terms
                     else Q.TermQuery(terms[0]) if len(terms) == 1
                     else Q.PhraseQuery(terms, slop=slop))
            i += 1
        elif kind == "range":
            lo = _analyze(m.group("lo"))
            hi = _analyze(m.group("hi"))
            q = Q.TermRangeQuery(
                lo[0] if lo else None, hi[0] if hi else None,
                include_lower=m.group("lb") == "[",
                include_upper=m.group("rb") == "]")
            i += 1
        elif kind == "term":
            q = _term_clause(m.group("term"))
            i += 1
        elif kind == "field":
            # a second colon-prefixed token inside a clause ("a:b:c"):
            # treat it as term text (the analyzer strips the colon anyway)
            q = _term_clause(m.group("field_name"))
            i += 1
        elif kind == "boost":
            raise QueryParseError("boost without a preceding clause")
        else:
            raise QueryParseError(f"unexpected token {kind}")
        if q is not None and fieldname is not None:
            # scope the clause (or every unscoped leaf of a group) to the
            # named field; explicit inner fields win
            q = Q.map_fields(
                q, lambda f, _fn=fieldname: _fn if f is None else f)
        if q is not None and i < len(toks) and toks[i][0] == "boost":
            q = _boost(q, float(toks[i][1].group("boost_val")))
            i += 1
        _add_clause(clauses, conj, mod, q, default_and)
    return _finish(clauses), i

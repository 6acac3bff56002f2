"""Surround query language — the queryparser/surround module
(solr-8.4.0/lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj and query/*.java): the classic
proximity-operator syntax

    3W(a, b, c)        ordered within distance 3  (infix: a 3W b)
    5N(a, OR(b, c*))   unordered within distance 5, nestable, wildcards
    AND(x, NOT(y))     boolean composition at the top level

re-targeted at the INTERVALS module instead of the reference's span
queries: a distance subquery becomes an IntervalOrdered/IntervalUnordered
tree (max_gaps = distance - 1: surround's `nW` is SpanNearQuery(slop=n-1),
and for minimal windows slop == gaps), OR inside a distance op becomes
IntervalOr, and `pre*` / `a?c` leaves become IntervalPrefix /
IntervalWildcard (DistanceQuery / OrQuery / SrndTermQuery /
SrndPrefixQuery / SrndTruncQuery roles).  Top-level AND/OR/NOT build a
BooleanQuery; a bare distance expression becomes an IntervalQuery.

Deliberate divergences, documented: the reference scores surround matches
through constant-weight span scorers; here a top-level distance query is
a scored IntervalQuery (the intervals module's native scoring).  Infix
chains associate LEFT (`a W b W c` == `W(W(a,b),c)` — the reference
groups the whole chain into one DistanceQuery; write the prefix form for
that).  Both syntaxes accept the same operators: W/N with an optional
leading distance, AND/OR/NOT, parentheses, commas in prefix form.
"""

from __future__ import annotations

import re

from . import query as Q

_TOKEN = re.compile(r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<op>(?:\d+)?[wWnN]|AND|OR|NOT|and|or|not)(?=[\s(,)]|$)
  | (?P<term>[^\s(),]+)
""", re.VERBOSE)


class SurroundParseError(ValueError):
    pass


def _lex(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        if text[i].isspace():
            i += 1
            continue
        m = _TOKEN.match(text, i)
        if not m:
            raise SurroundParseError(f"bad token at {text[i:]!r}")
        out.append((m.lastgroup, m.group(0)))
        i = m.end()
    return out


def _dist(op: str) -> tuple[str, int]:
    """('w'|'n', max_gaps) from an operator token like '3W' or 'n'."""
    kind = op[-1].lower()
    n = int(op[:-1]) if len(op) > 1 else 1
    if n < 1:
        raise SurroundParseError(f"distance must be >= 1 in {op!r}")
    return kind, n - 1


def _leaf_interval(term: str):
    t = term.lower()
    if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
        return Q.IntervalPrefix(t[:-1])
    if "*" in t or "?" in t:
        return Q.IntervalWildcard(t)
    return Q.IntervalTerm(t)


def _as_interval(node):
    """Coerce a parsed node into an intervals SOURCE (distance-subquery
    context: terms, OR, W/N allowed; AND/NOT are not — same restriction
    as the reference's DistanceQuery.getSpanNearQuery)."""
    if isinstance(node, tuple) and node[0] == "or":
        return Q.IntervalOr(tuple(_as_interval(c) for c in node[1]))
    if isinstance(node, tuple) and node[0] in ("w", "n"):
        cls = Q.IntervalOrdered if node[0] == "w" else Q.IntervalUnordered
        return cls(tuple(_as_interval(c) for c in node[2]),
                   max_gaps=node[1])
    if isinstance(node, tuple):
        raise SurroundParseError(
            f"{node[0].upper()} is not allowed inside a distance operator")
    return _leaf_interval(node)


def _as_query(node) -> Q.Query:
    """Coerce a parsed node into a top-level Query."""
    if isinstance(node, str):
        t = node.lower()
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return Q.PrefixQuery(t[:-1])
        if "*" in t or "?" in t:
            return Q.WildcardQuery(t)
        return Q.TermQuery(t)
    kind = node[0]
    if kind in ("w", "n"):
        return Q.IntervalQuery(_as_interval(node))
    if kind == "or":
        return Q.BooleanQuery([(Q.Occur.SHOULD, _as_query(c))
                               for c in node[1]])
    if kind == "and":
        clauses = []
        for c in node[1]:
            if isinstance(c, tuple) and c[0] == "not":
                clauses.append((Q.Occur.MUST_NOT, _as_query(c[1][0])))
            else:
                clauses.append((Q.Occur.MUST, _as_query(c)))
        return Q.BooleanQuery(clauses)
    if kind == "not":
        raise SurroundParseError("NOT needs a positive side (use AND)")
    raise SurroundParseError(f"unexpected node {kind!r}")


def _parse_expr(toks: list, i: int):
    """One expression: prefix-op form, parenthesized infix, or a term.
    Returns (node, next_i); nodes are terms (str) or
    (op, args...) tuples: ('w'|'n', max_gaps, children),
    ('and'|'or', children), ('not', [child])."""
    node, i = _parse_atom(toks, i)
    # infix chain: a 3W b AND c ... (left-associative)
    while i < len(toks) and toks[i][0] == "op":
        op = toks[i][1]
        low = op.lower()
        if low == "not":
            raise SurroundParseError("infix NOT is not in the grammar; "
                                     "use AND(a, NOT(b))")
        rhs, i2 = _parse_atom(toks, i + 1)
        if low in ("and", "or"):
            node = (low, [node, rhs])
        else:
            kind, gaps = _dist(op)
            node = (kind, gaps, [node, rhs])
        i = i2
    return node, i


def _parse_atom(toks: list, i: int):
    if i >= len(toks):
        raise SurroundParseError("unexpected end of query")
    kind, val = toks[i]
    if kind == "op":
        # prefix form: OP ( args... )
        if i + 1 >= len(toks) or toks[i + 1][0] != "lparen":
            # a bare W/N/AND word used as a term (the reference requires
            # operators be followed by '('; treat as term like it does)
            return val, i + 1
        args, j = _parse_args(toks, i + 2)
        low = val.lower()
        if low in ("and", "or"):
            return (low, args), j
        if low == "not":
            if len(args) != 1:
                raise SurroundParseError("NOT takes exactly one argument")
            return ("not", args), j
        k, gaps = _dist(val)
        if len(args) < 2:
            raise SurroundParseError(f"{val} needs >= 2 arguments")
        return (k, gaps, args), j
    if kind == "lparen":
        node, j = _parse_expr(toks, i + 1)
        if j >= len(toks) or toks[j][0] != "rparen":
            raise SurroundParseError("missing ')'")
        return node, j + 1
    if kind == "term":
        return val, i + 1
    raise SurroundParseError(f"unexpected {val!r}")


def _parse_args(toks: list, i: int) -> tuple[list, int]:
    args = []
    while True:
        node, i = _parse_expr(toks, i)
        args.append(node)
        if i < len(toks) and toks[i][0] == "comma":
            i += 1
            continue
        if i < len(toks) and toks[i][0] == "rparen":
            return args, i + 1
        raise SurroundParseError("expected ',' or ')' in argument list")


def parse_surround(text: str) -> Q.Query:
    toks = _lex(text)
    if not toks:
        return Q.MatchNoDocsQuery()
    node, i = _parse_expr(toks, 0)
    if i != len(toks):
        raise SurroundParseError(f"trailing input at {toks[i][1]!r}")
    return _as_query(node)

"""SimpleQueryParser — the lenient end-user syntax of the reference's
queryparser/simple module, transcribed from
solr-8.4.0/lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java (all operator flags enabled):

  +   AND            |   OR           -    NOT (prefix; -- cancels)
  "…" phrase         "…"~N  near     (…)  precedence
  t*  prefix         t~N    fuzzy    \\c   escape
  *   (alone) MatchAllDocsQuery      whitespace = the default operator

The parser NEVER errors: extraneous/unterminated operators degrade to
literal text or are ignored (parse:147-177, consumeSubQuery's
index-reset), which is the module's whole point. Operator precedence is
simple right-to-left: an operator CHANGE wraps the accumulated tree as
one clause of a new BooleanQuery (buildQueryTree:436-474) — e.g.
``a | b + c`` parses as ``(a OR b) AND c``. A negated branch becomes
``BooleanQuery[MUST_NOT branch, SHOULD MatchAll]`` (buildQueryTree:
439-446). Token text runs through the engine analyzer (newDefaultQuery /
createBooleanQuery): multi-token text becomes a Boolean of the default
operator, single tokens a TermQuery, empty analyses vanish without
consuming the pending operator.
"""

from __future__ import annotations

import re

from . import query as Q

_ANALYZE_RE = re.compile(r"[a-z0-9_]+")
_WS = " \t\n\r"
_OCCUR = {"SHOULD": Q.Occur.SHOULD, "MUST": Q.Occur.MUST,
          "OR": Q.Occur.SHOULD, "AND": Q.Occur.MUST}


def _analyze(text: str) -> list[str]:
    return _ANALYZE_RE.findall(text.lower())


class _State:
    __slots__ = ("data", "index", "length", "top", "current_op",
                 "previous_op", "not_count")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top = None
        self.current_op = None
        self.previous_op = None
        self.not_count = 0


def parse_simple(text: str, default_operator: str = "OR") -> Q.Query:
    """Parse a simple-syntax query string (never raises on bad syntax).
    default_operator: "OR"/"SHOULD" (the reference default) or
    "AND"/"MUST"."""
    dop = _OCCUR[default_operator.upper()]
    if text.strip() == "*":
        return Q.MatchAllDocsQuery()
    st = _State(text, 0, len(text))
    _parse_sub(st, dop)
    return st.top if st.top is not None else Q.MatchNoDocsQuery()


def _parse_sub(st: _State, dop) -> None:
    while st.index < st.length:
        c = st.data[st.index]
        if c == "(":
            _consume_sub(st, dop)
        elif c == ")":
            st.index += 1
        elif c == '"':
            _consume_phrase(st, dop)
        elif c == "+":
            if st.current_op is None and st.top is not None:
                st.current_op = Q.Occur.MUST
            st.index += 1
        elif c == "|":
            if st.current_op is None and st.top is not None:
                st.current_op = Q.Occur.SHOULD
            st.index += 1
        elif c == "-":
            st.not_count += 1
            st.index += 1
            continue  # do not reset `not` before the next char
        elif c in _WS:
            st.index += 1
        else:
            _consume_token(st, dop)
        st.not_count = 0


def _consume_sub(st: _State, dop) -> None:
    start = st.index = st.index + 1
    precedence = 1
    escaped = False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == "(":
                precedence += 1
            elif c == ")":
                precedence -= 1
                if precedence == 0:
                    break
        escaped = False
        st.index += 1
    if st.index == st.length:
        st.index = start  # unterminated: the '(' is extraneous
    elif st.index == start:
        st.current_op = None  # "()" consumes the pending operator
        st.index += 1
    else:
        sub = _State(st.data, start, st.index)
        _parse_sub(sub, dop)
        _build(st, sub.top, dop)
        st.index += 1


def _consume_phrase(st: _State, dop) -> None:
    start = st.index = st.index + 1
    buf = []
    escaped = False
    has_slop = False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == '"':
                if (st.length > st.index + 1
                        and st.data[st.index + 1] == "~"):
                    st.index += 1
                    if st.length > st.index + 1:
                        has_slop = True
                    break
                break
        escaped = False
        buf.append(st.data[st.index])
        st.index += 1
    if st.index == st.length:
        st.index = start  # unterminated: the '"' is extraneous
    elif st.index == start:
        st.current_op = None  # empty phrase consumes the operator
        st.index += 1
    else:
        slop = _parse_fuzziness(st) if has_slop else 0
        toks = _analyze("".join(buf))
        branch = (None if not toks
                  else Q.TermQuery(toks[0]) if len(toks) == 1
                  else Q.PhraseQuery(toks, slop=slop))
        _build(st, branch, dop)
        st.index += 1


def _token_finished(st: _State) -> bool:
    c = st.data[st.index]
    return c in '"|+()' or c in _WS


def _consume_token(st: _State, dop) -> None:
    buf = []
    escaped = False
    prefix = False
    fuzzy = False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                prefix = False
                st.index += 1
                continue
            if _token_finished(st):
                break
            if buf and c == "~":
                fuzzy = True
                break
            prefix = bool(buf) and c == "*"
        escaped = False
        buf.append(st.data[st.index])
        st.index += 1
    if not buf:
        return
    token = "".join(buf)
    if fuzzy:
        fuzziness = min(_parse_fuzziness(st), 2)
        toks = _analyze(token)
        if fuzziness == 0 or len(toks) != 1:
            branch = _default_query(token, dop)
        else:
            branch = Q.FuzzyQuery(toks[0], max_edits=fuzziness)
    elif prefix:
        toks = _analyze(token[:-1])
        branch = Q.PrefixQuery(toks[-1]) if toks else None
    else:
        branch = _default_query(token, dop)
    _build(st, branch, dop)


def _default_query(token: str, dop):
    toks = _analyze(token)
    if not toks:
        return None
    if len(toks) == 1:
        return Q.TermQuery(toks[0])
    return Q.BooleanQuery([(dop, Q.TermQuery(t)) for t in toks])


def _parse_fuzziness(st: _State) -> int:
    if st.index >= st.length or st.data[st.index] != "~":
        return 0
    digits = []
    while st.index < st.length:
        st.index += 1
        if st.index < st.length:
            if _token_finished(st):
                break
            digits.append(st.data[st.index])
    txt = "".join(digits)
    if txt == "":
        return 2
    try:
        return max(int(txt), 0)
    except ValueError:
        return 0


def _build(st: _State, branch, dop) -> None:
    if branch is None:
        return
    if st.not_count % 2 == 1:
        branch = Q.BooleanQuery([(Q.Occur.MUST_NOT, branch),
                                 (Q.Occur.SHOULD, Q.MatchAllDocsQuery())])
    if st.top is None:
        st.top = branch
    else:
        if st.current_op is None:
            st.current_op = dop
        if st.previous_op != st.current_op:
            # operator CHANGE: the accumulated tree becomes one clause of
            # a fresh BooleanQuery (right-to-left precedence)
            st.top = Q.BooleanQuery([(st.current_op, st.top)])
        st.top = Q.BooleanQuery(
            list(st.top.clauses) + [Q.BooleanClause(st.current_op, branch)],
            st.top.minimum_should_match)
        st.previous_op = st.current_op
    st.current_op = None

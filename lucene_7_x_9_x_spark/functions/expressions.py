"""Compiled scoring expressions — the Lucene expressions module role
(solr-8.4.0/lucene/expressions/src/java/org/apache/lucene/expressions/
js/JavascriptCompiler.java, Expression.java, SimpleBindings.java): an
arithmetic expression over the query score (``_score``) and per-doc
numeric docvalues compiles ONCE into a plan-side SQL expression that
whole-stage codegen evaluates — never a per-row Python UDF.

The grammar is the cross-engine-deterministic subset of the reference's
Javascript-like language: ``+ - * /``, unary minus, parentheses, numeric
literals, variables, and the IEEE-exact functions ``sqrt``/``abs``/
``min``/``max`` plus ``pow`` with a non-negative integer literal
exponent (expanded to left-associated repeated multiplication).
Transcendentals (``ln``/``exp``/``log10`` — the reference binds
``Math.*``) are deliberately excluded: libm results differ across
runtimes, which would break the engine==oracle rank-identity contract.
The SAME emitted string runs under Spark (``F.expr``) and DuckDB — one
parse tree, one operation order, bit-identical IEEE evaluation on both
engines (every literal and variable is CAST to DOUBLE at emission, so
neither engine ever routes through DECIMAL or integer division).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"\s*(?:(\d+\.\d+|\d+)|([A-Za-z_][A-Za-z0-9_]*)"
                    r"|([-+*/(),]))")

#: function name -> (SQL name, arity); min/max map to the two-argument
#: scalar forms both engines share.
_FUNCS = {"sqrt": ("sqrt", 1), "abs": ("abs", 1),
          "min": ("least", 2), "max": ("greatest", 2)}


class ExpressionError(ValueError):
    pass


class _Num:
    def __init__(self, text):
        self.text = text

    def sql(self, bindings):
        return f"CAST({self.text} AS DOUBLE)"


class _Var:
    def __init__(self, name):
        self.name = name

    def sql(self, bindings):
        if self.name in bindings:
            return f"({bindings[self.name]})"
        return f"CAST({self.name} AS DOUBLE)"


class _Unary:
    def __init__(self, child):
        self.child = child

    def sql(self, bindings):
        return f"(- {self.child.sql(bindings)})"


class _Bin:
    def __init__(self, op, left, right):
        self.op, self.left, self.right = op, left, right

    def sql(self, bindings):
        return (f"({self.left.sql(bindings)} {self.op} "
                f"{self.right.sql(bindings)})")


class _Call:
    def __init__(self, fn, args):
        self.fn, self.args = fn, args

    def sql(self, bindings):
        args = ", ".join(a.sql(bindings) for a in self.args)
        return f"{self.fn}({args})"


class CompiledExpression:
    """One parsed expression; ``variables`` is every identifier it reads
    (``_score`` plus docvalues columns). ``sql(bindings)`` emits the
    engine-shared SQL string, substituting any variable present in
    ``bindings`` with the given SQL fragment (parenthesized); unbound
    variables emit as ``CAST(name AS DOUBLE)`` column references."""

    def __init__(self, source: str, root, variables: set):
        self.source = source
        self._root = root
        self.variables = variables

    def sql(self, bindings: dict | None = None) -> str:
        return self._root.sql(bindings or {})


def _tokenize(src: str) -> list:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ExpressionError(
                    f"unexpected character {src[pos:].strip()[0]!r} "
                    f"in expression {src!r}")
            break
        num, ident, op = m.groups()
        if num is not None:
            out.append(("num", num))
        elif ident is not None:
            out.append(("ident", ident))
        else:
            out.append(("op", op))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self.variables: set = set()

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None,
                                                                  None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, op: str):
        kind, val = self._next()
        if kind != "op" or val != op:
            raise ExpressionError(f"expected {op!r} in {self.src!r}")

    def parse(self):
        node = self._expr()
        if self.i != len(self.toks):
            raise ExpressionError(f"trailing tokens in {self.src!r}")
        return node

    def _expr(self):
        node = self._term()
        while self._peek() == ("op", "+") or self._peek() == ("op", "-"):
            _, op = self._next()
            node = _Bin(op, node, self._term())
        return node

    def _term(self):
        node = self._factor()
        while self._peek() == ("op", "*") or self._peek() == ("op", "/"):
            _, op = self._next()
            node = _Bin(op, node, self._factor())
        return node

    def _factor(self):
        if self._peek() == ("op", "-"):
            self._next()
            return _Unary(self._factor())
        return self._atom()

    def _atom(self):
        kind, val = self._next()
        if kind == "num":
            return _Num(val)
        if kind == "op" and val == "(":
            node = self._expr()
            self._expect(")")
            return node
        if kind == "ident":
            if self._peek() == ("op", "("):
                return self._call(val)
            self.variables.add(val)
            return _Var(val)
        raise ExpressionError(f"unexpected token in {self.src!r}")

    def _call(self, name: str):
        self._expect("(")
        args = [self._expr()]
        while self._peek() == ("op", ","):
            self._next()
            args.append(self._expr())
        self._expect(")")
        if name == "pow":
            # IEEE-exact pow: non-negative integer literal exponent only,
            # expanded to left-assoc multiplication (libm pow varies)
            if len(args) != 2 or not isinstance(args[1], _Num) \
                    or "." in args[1].text:
                raise ExpressionError(
                    "pow() needs a non-negative integer literal exponent")
            n = int(args[1].text)
            if n == 0:
                return _Num("1")
            node = args[0]
            for _ in range(n - 1):
                node = _Bin("*", node, args[0])
            return node
        if name not in _FUNCS:
            raise ExpressionError(
                f"unknown function {name!r} (deterministic subset: "
                f"{sorted(_FUNCS)} + pow with integer exponent; "
                f"transcendentals are excluded for cross-engine "
                f"reproducibility)")
        sql_name, arity = _FUNCS[name]
        if len(args) != arity:
            raise ExpressionError(f"{name}() takes {arity} argument(s)")
        return _Call(sql_name, args)


def compile_expression(source: str,
                       allowed_vars: set | None = None
                       ) -> CompiledExpression:
    """Parse ``source`` once; raises ExpressionError on syntax errors,
    unknown functions, or (when ``allowed_vars`` is given) variables
    outside the binding set — the JavascriptCompiler.compile +
    SimpleBindings validation step."""
    p = _Parser(source)
    root = p.parse()
    if allowed_vars is not None:
        extra = p.variables - set(allowed_vars)
        if extra:
            raise ExpressionError(
                f"unbound variables {sorted(extra)} (bindings: "
                f"{sorted(allowed_vars)})")
    return CompiledExpression(source, root, p.variables)

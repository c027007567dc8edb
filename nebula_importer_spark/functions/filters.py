"""Record-filter expression → Catalyst Column translator.

The reference compiles a tiny `expr-lang` boolean over ``Record[i]`` and
evaluates it per record inside the statement builder
(``/root/reference/pkg/spec/base/filter.go:8-34``; operator surface documented
in ``docs/filter-expression.md``: comparisons ``== != < > <= >=``, logical
``not/! and/&& or/||``, membership ``in [..]``). We parse the same grammar
once at plan time and emit a boolean Column, so Catalyst can push the
predicate into the parquet/CSV scan instead of evaluating it per row in the
sink loop like the reference does.

Values are strings (the reference record is ``[]string``), so comparisons are
lexicographic string comparisons, matching expr-lang's typed-string behavior.
"""

from __future__ import annotations

import re
from typing import List, Tuple, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op>\|\||&&|==|!=|<=|>=|[()!<>\[\],])
    )""",
    re.VERBOSE,
)


class FilterSyntaxError(ValueError):
    pass


def _tokenize(expr: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            if expr[pos:].strip() == "":
                break
            raise FilterSyntaxError(f"bad token at {pos}: {expr[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("string", "number", "name", "op"):
            val = m.group(kind)
            if val is not None:
                tokens.append((kind, val))
                break
    return tokens


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


class _Parser:
    def __init__(
        self,
        tokens: List[Tuple[str, str]],
        record: Column | None,
        variables: dict | None = None,
    ):
        self.tokens = tokens
        self.i = 0
        self.record = record
        self.variables = variables or {}

    def peek(self) -> Tuple[str, str]:
        return self.tokens[self.i] if self.i < len(self.tokens) else ("eof", "")

    def next(self) -> Tuple[str, str]:
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, val: str) -> None:
        kind, v = self.next()
        if v != val:
            raise FilterSyntaxError(f"expected {val!r}, got {v!r}")

    def parse(self) -> Column:
        c = self.parse_or()
        if self.peek()[0] != "eof":
            raise FilterSyntaxError(f"trailing tokens: {self.tokens[self.i:]}")
        return c

    def parse_or(self) -> Column:
        left = self.parse_and()
        while self.peek()[1] in ("||", "or"):
            self.next()
            left = left | self.parse_and()
        return left

    def parse_and(self) -> Column:
        left = self.parse_not()
        while self.peek()[1] in ("&&", "and"):
            self.next()
            left = left & self.parse_not()
        return left

    def parse_not(self) -> Column:
        if self.peek()[1] in ("!", "not"):
            self.next()
            return ~self.parse_not()
        return self.parse_cmp()

    def parse_cmp(self) -> Column:
        left = self.parse_term()
        kind, op = self.peek()
        if op in ("==", "!=", "<", ">", "<=", ">="):
            self.next()
            right = self.parse_term()
            lc, rc = _as_column(left), _as_column(right)
            return {
                "==": lc == rc,
                "!=": lc != rc,
                "<": lc < rc,
                ">": lc > rc,
                "<=": lc <= rc,
                ">=": lc >= rc,
            }[op]
        if op == "in":
            self.next()
            items = self.parse_list()
            return _as_column(left).isin([str(x) for x in items])
        if isinstance(left, Column):
            return left  # bare boolean sub-expression
        raise FilterSyntaxError(f"bare literal {left!r} is not a boolean")

    def parse_list(self) -> List[str]:
        self.expect("[")
        items: List[str] = []
        while True:
            kind, v = self.next()
            if kind == "string":
                items.append(_unquote(v))
            elif kind == "number":
                items.append(v)
            else:
                raise FilterSyntaxError(f"bad list item {v!r}")
            kind, v = self.next()
            if v == "]":
                return items
            if v != ",":
                raise FilterSyntaxError(f"expected , or ] got {v!r}")

    def parse_term(self) -> Union[Column, str]:
        kind, v = self.next()
        if v == "(":
            inner = self.parse_or()
            self.expect(")")
            return inner
        if kind == "string":
            return _unquote(v)
        if kind == "number":
            return v  # compared as string: the record is []string
        if kind == "name" and v in self.variables:
            return self.variables[v]
        if kind == "name" and v == "Record":
            if self.record is None:
                raise FilterSyntaxError("Record[] not available in this context")
            self.expect("[")
            ikind, idx = self.next()
            if ikind != "number":
                raise FilterSyntaxError(f"Record index must be int, got {idx!r}")
            self.expect("]")
            return F.coalesce(F.element_at(self.record, int(idx) + 1), F.lit(""))
        if kind == "name" and v in ("true", "false"):
            return F.lit(v == "true")
        raise FilterSyntaxError(f"unexpected token {v!r}")


def _as_column(x: Union[Column, str]) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def compile_filter(
    expr: str, record: Column | None = None, variables: dict | None = None
) -> Column:
    """Compile a reference filter expression into a boolean Column.

    ``record`` is the ``array<string>`` column holding the CSV record
    (``Record[i]`` references); ``variables`` binds bare names to Columns —
    the prop-level guard env is ``{"val": <full "name = value" clause>}``
    (``pkg/spec/v3/prop.go:69-75,130-153``).
    """
    if not expr or not expr.strip():
        raise FilterSyntaxError("empty filter expression")
    return _Parser(_tokenize(expr), record, variables).parse()

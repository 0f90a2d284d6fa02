"""AST for the pq program + PromQL-subset query language.

Mirrors the reference's AST shape (src/query/parser/ast.rs,
src/program.rs) as plain dataclasses; the parser in ``parser.py``
reproduces the reference grammar's precedence and keyword set.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# Query expressions
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class NumberLiteral:
    value: float


@dataclass(frozen=True)
class LabelMatcher:
    """One label matcher; regex ops are fully anchored ``^(?:v)$`` exactly
    like the reference (src/model/labels.rs:79-84)."""

    label: str
    op: str  # '=', '!=', '=~', '!~'
    value: str

    def compiled(self):
        return _re.compile(f"^(?:{self.value})$")

    def matches(self, v: str | None) -> bool:
        # missing label never matches (src/query/vector.rs:60-63)
        if v is None:
            return False
        if self.op == "=":
            return self.value == v
        if self.op == "!=":
            return self.value != v
        m = self.compiled().search(v) is not None
        return m if self.op == "=~" else not m


@dataclass(frozen=True)
class VectorSelector:
    name: str | None
    matchers: tuple[LabelMatcher, ...] = ()
    range_ms: int | None = None  # None → instant selector
    # EXTENSION (reference leaves offset as a TODO, src/query/parser/
    # expr.rs:33): evaluate the selector `offset_ms` further in the past
    # — tick T reads samples from (T - d - offset, T - offset].
    offset_ms: int = 0

    def all_matchers(self) -> tuple[LabelMatcher, ...]:
        """Matchers incl. the auto-added __name__ matcher
        (src/query/parser/ast.rs:387-416)."""
        ms = list(self.matchers)
        if self.name is not None:
            ms.insert(0, LabelMatcher("__name__", "=", self.name))
        return tuple(ms)


@dataclass(frozen=True)
class Parentheses:
    expr: "Expr"


@dataclass(frozen=True)
class Unary:
    op: str  # '+', '-'
    expr: "Expr"


@dataclass(frozen=True)
class Binary:
    op: str  # + - * / % ^ == != > >= < <= and unless or
    lhs: "Expr"
    rhs: "Expr"
    bool_modifier: bool = False
    # label matching: ("on"|"ignoring", frozenset[str]) or None
    matching: tuple[str, frozenset] | None = None
    # group modifier: ("left"|"right", tuple[str, ...]) or None
    grouping: tuple[str, tuple] | None = None

    @property
    def kind(self) -> str:
        if self.op in ("+", "-", "*", "/", "%", "^", "atan2"):
            return "arithmetic"
        if self.op in ("==", "!=", ">", ">=", "<", "<="):
            return "comparison"
        return "logical"


@dataclass(frozen=True)
class Aggregate:
    op: str  # sum min max avg count group topk bottomk (+ parse-only ones)
    expr: "Expr"
    # ("by"|"without", frozenset[str]) or None
    modifier: tuple[str, frozenset] | None = None
    argument: float | str | None = None  # k for topk/bottomk, q for quantile


@dataclass(frozen=True)
class FunctionCall:
    name: str  # sum_over_time etc.
    args: tuple = ()  # mix of Expr / float / str


@dataclass(frozen=True)
class Subquery:
    """EXTENSION — PromQL subquery ``<expr>[range:step]``: evaluate the
    inner expression on a step-spaced tick grid, then re-window those
    points into range-vector segments on the outer query's grid.  Not
    part of the reference grammar (src/query/parser/vector.rs has no
    ':' production) — parse_expr(extensions=True) only."""

    expr: "Expr"
    range_ms: int
    step_ms: int


Expr = (
    NumberLiteral
    | VectorSelector
    | Parentheses
    | Unary
    | Binary
    | Aggregate
    | FunctionCall
    | Subquery
)


PRECEDENCE = {
    "or": 10,
    "and": 20,
    "unless": 20,
    "==": 30,
    ">=": 30,
    ">": 30,
    "<": 30,
    "<=": 30,
    "!=": 30,
    "+": 40,
    "-": 40,
    "*": 50,
    "/": 50,
    "%": 50,
    "atan2": 50,  # PromQL: same precedence as * / % (extension-only)
    "^": 60,
}


def find_smallest_range_ms(node: Expr) -> int | None:
    """Smallest range duration in the query → default interval
    (src/query/evaluator.rs:154-182)."""
    if isinstance(node, Parentheses):
        return find_smallest_range_ms(node.expr)
    if isinstance(node, Aggregate):
        return find_smallest_range_ms(node.expr)
    if isinstance(node, Unary):
        return find_smallest_range_ms(node.expr)
    if isinstance(node, Binary):
        l = find_smallest_range_ms(node.lhs)
        r = find_smallest_range_ms(node.rhs)
        if l is None:
            return r
        if r is None:
            return l
        return min(l, r)
    if isinstance(node, FunctionCall):
        for a in node.args:
            if not isinstance(a, (float, str)):
                return find_smallest_range_ms(a)
        return None
    if isinstance(node, VectorSelector):
        return node.range_ms
    if isinstance(node, Subquery):
        # the inner expression's own ranges dominate (they're smaller by
        # construction); a rangeless inner contributes the subquery range
        inner = find_smallest_range_ms(node.expr)
        return inner if inner is not None else node.range_ms
    return None


# --------------------------------------------------------------------------
# Program AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class RegexDecoder:
    regex: str


@dataclass(frozen=True)
class JsonDecoder:
    pass


@dataclass(frozen=True)
class NamedDecoder:
    """A registry decoder invoked by name (the reference's planned
    plugin surface, src/program.rs:31-44): ``csv(";") | map {...}``.
    ``args`` are the string-literal constructor arguments."""

    name: str
    args: tuple[str, ...] = ()


@dataclass(frozen=True)
class MapperField:
    # loc: int (positional) or str (named); Const fields use loc=name
    loc: int | str
    typ: str  # 'auto' | 'num' | 'str' | 'ts' | 'const'
    ts_format: str | None = None
    const_value: str | None = None
    alias: str | None = None

    @property
    def end_name(self) -> str:
        if self.alias:
            return self.alias
        if isinstance(self.loc, str):
            return self.loc
        return f"f{self.loc}"


@dataclass(frozen=True)
class Program:
    decoder: RegexDecoder | JsonDecoder | NamedDecoder
    mapper: tuple[MapperField, ...] | None = None
    query: Expr | None = None
    formatter: str | None = None  # 'to_json' | 'to_promapi' | None

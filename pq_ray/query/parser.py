"""Recursive-descent parser for the pq program + PromQL-subset grammar.

Reproduces the reference grammar (src/query/parser/expr.rs,
src/query/parser/vector.rs, src/program.rs):

- binary precedence table or=10 < and/unless=20 < comparisons=30 <
  add/sub=40 < mul/div/mod=50 < pow=60, all LEFT-associative (the
  reference breaks the climb on ``prec <= min_prec``, including pow);
- unary +/- parses its operand with min precedence = Mul, so
  ``-age * 2^3`` is ``(-age) * (2^3)``;
- number literals are nom's ``double``: optional sign, ``1.``/``.1``,
  scientific, Inf/Infinity/NaN case-insensitive — so ``-2`` lexes as a
  literal (literal is tried before unary, as in the reference);
- after a complete expression only EOF, ',', ')' or '|' may follow —
  anything else must parse as a binary operator;
- vector selectors: ``metric{l=~"v"}[5m]``, regex matchers fully
  anchored, auto __name__ matcher;
- keyword matching is case-insensitive.

Divergence (documented): the reference's nom ``alt`` tries aggregate /
function keywords as bare prefixes, so metric names like ``summary``
or calls like ``count_values(...)`` fail to parse there; we only treat
a keyword as aggregate/function when followed by '(' / by / without,
and we accept ``avg_over_time`` (missing from the reference's
function-name list though present in its enum). Neither changes any
conformance scenario.
"""

from __future__ import annotations

import re

from ..model import parse_duration_ms
from .ast import (
    Aggregate,
    Binary,
    FunctionCall,
    JsonDecoder,
    LabelMatcher,
    MapperField,
    NamedDecoder,
    NumberLiteral,
    Parentheses,
    Program,
    RegexDecoder,
    Subquery,
    Unary,
    VectorSelector,
    PRECEDENCE,
)


class ParseError(ValueError):
    def __init__(self, message: str, pos: int = 0):
        super().__init__(f"{pos}: parse error: {message}")
        self.pos = pos


_NUMBER = re.compile(
    r"[+-]?(?:(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|[iI][nN][fF](?:[iI][nN][iI][tT][yY])?|[nN][aA][nN])"
)
_LABEL_ID = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
_METRIC_ID = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")
_DURATION = re.compile(r"(?:\d+(?:ms|s|m|h|d|w|y))+")

AGG_OPS = [
    "bottomk",
    "count_values",
    "count",
    "group",
    "max",
    "min",
    "quantile",
    "stddev",
    "stdvar",
    "sum",
    "topk",
    "avg",
]
FUNC_NAMES = [
    "avg_over_time",  # extension: parseable here, enum-only in the reference
    "first_over_time",  # extension
    "increase",  # extension
    "delta",  # extension
    "rate",  # extension (the reference's README lists it as coming soon)
    "count_over_time",
    "last_over_time",
    "max_over_time",
    "min_over_time",
    "sum_over_time",
    "clamp_max",
    "clamp_min",
    "clamp",
    "label_replace",
    "vector",
]
# Extension-only function names — NOT in the reference's FunctionName
# enum (src/query/parser/ast.rs:294-331), so by default they must fail
# to parse exactly like any unknown identifier followed by '(' does in
# the reference.  ``parse_expr(..., extensions=True)`` turns them on.
EXT_FUNC_NAMES = [
    # elementwise instant-vector math (PromQL semantics)
    "absent",
    "abs",
    "ceil",
    "floor",
    "round",
    "sqrt",
    "exp",
    "ln",
    "log2",
    "log10",
    "sgn",
    "sort_desc",
    "sort",
    "histogram_quantile",
    "absent_over_time",
    # trig + conversions
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "deg", "rad",
    # time components of the sample value (epoch seconds) / sample ts
    "minute", "hour", "day_of_week", "day_of_month", "day_of_year",
    "days_in_month", "month", "year", "timestamp",
    "label_join",
    # windowed (range-vector) kernels
    "stddev_over_time",
    "stdvar_over_time",
    "present_over_time",
    "quantile_over_time",
    "deriv",
    "predict_linear",
    "holt_winters",
    "changes",
    "resets",
    "irate",
    "idelta",
]
BINARY_OPS = ["==", ">=", "<=", "!=", "+", "-", "*", "/", "%", "^", ">", "<"]
WORD_OPS = ["and", "unless", "or"]


class _P:
    def __init__(self, text: str, extensions: bool = False):
        self.t = text
        self.i = 0
        self.extensions = extensions

    # -- low-level helpers --------------------------------------------------
    def ws(self):
        while self.i < len(self.t) and self.t[self.i].isspace():
            self.i += 1

    def peek(self) -> str | None:
        j = self.i
        while j < len(self.t) and self.t[j].isspace():
            j += 1
        return self.t[j] if j < len(self.t) else None

    def eat(self, s: str, ci: bool = False) -> bool:
        self.ws()
        frag = self.t[self.i : self.i + len(s)]
        if (frag.lower() == s.lower()) if ci else (frag == s):
            self.i += len(s)
            return True
        return False

    def expect(self, s: str, wherein: str):
        if not self.eat(s):
            raise ParseError(f"{wherein}: expected {s!r}", self.i)

    def regex(self, rx: re.Pattern) -> str | None:
        self.ws()
        m = rx.match(self.t, self.i)
        if not m:
            return None
        self.i = m.end()
        return m.group(0)

    def string_literal(self) -> str | None:
        """Naive '"..."' string, no escapes — exactly the reference
        (src/utils/parse/string.rs)."""
        self.ws()
        if self.i >= len(self.t) or self.t[self.i] != '"':
            return None
        end = self.t.find('"', self.i + 1)
        if end < 0:
            return None
        s = self.t[self.i + 1 : end]
        self.i = end + 1
        return s

    # -- expressions ---------------------------------------------------------
    def expr(self, min_prec: int | None = None) -> object:
        lhs = self._primary()
        while True:
            nxt = self.peek()
            if nxt is None or nxt in (",", ")", "|"):
                break
            save = self.i
            op = self._binary_op()
            if op is None:
                raise ParseError("binary expression: expected binary operator", self.i)
            if min_prec is not None and PRECEDENCE[op] <= min_prec:
                self.i = save
                break
            bool_mod = self._keyword("bool")
            matching = self._label_matching()
            grouping = self._group_modifier()
            rhs = self.expr(PRECEDENCE[op])
            lhs = Binary(op, lhs, rhs, bool_mod, matching, grouping)
        return lhs

    def _keyword(self, kw: str) -> bool:
        save = self.i
        self.ws()
        m = _LABEL_ID.match(self.t, self.i)
        if m and m.group(0).lower() == kw:
            self.i = m.end()
            return True
        self.i = save
        return False

    def _binary_op(self) -> str | None:
        self.ws()
        for op in BINARY_OPS:
            if self.t.startswith(op, self.i):
                self.i += len(op)
                return op
        m = _LABEL_ID.match(self.t, self.i)
        if m and m.group(0).lower() in WORD_OPS:
            self.i = m.end()
            return m.group(0).lower()
        # extension-only word operator (PromQL trig binary op)
        if self.extensions and m and m.group(0).lower() == "atan2":
            self.i = m.end()
            return "atan2"
        return None

    def _label_matching(self):
        for kw, kind in (("on", "on"), ("ignoring", "ignoring")):
            save = self.i
            if self._keyword(kw):
                labels = self._grouping_labels()
                if labels is None:
                    raise ParseError("label matching: expected label list", self.i)
                return (kind, frozenset(labels))
            self.i = save
        return None

    def _group_modifier(self):
        for kw, kind in (("group_left", "left"), ("group_right", "right")):
            save = self.i
            if self._keyword(kw):
                labels = self._grouping_labels()
                return (kind, tuple(labels or ()))
            self.i = save
        return None

    def _grouping_labels(self) -> list[str] | None:
        save = self.i
        if not self.eat("("):
            self.i = save
            return None
        labels = []
        while True:
            self.ws()
            if self.eat(")"):
                return labels
            name = self.regex(_LABEL_ID)
            if name is None:
                raise ParseError('grouping labels: expected label or ")"', self.i)
            labels.append(name)
            self.ws()
            if self.eat(","):
                continue
            self.expect(")", "grouping labels")
            return labels

    def _primary(self) -> object:
        self.ws()
        # order mirrors the reference alternation: function call, aggregate,
        # parens, number literal, unary, vector selector
        fc = self._function_call()
        if fc is not None:
            return self._maybe_subquery(fc)
        agg = self._aggregate()
        if agg is not None:
            return self._maybe_subquery(agg)
        if self.peek() == "(":
            self.eat("(")
            inner = self.expr(None)
            self.expect(")", "parentheses")
            return self._maybe_subquery(Parentheses(inner))
        num = self._number()
        if num is not None:
            return NumberLiteral(num)
        if self.peek() in ("+", "-"):
            self.ws()
            op = self.t[self.i]
            self.i += 1
            inner = self.expr(PRECEDENCE["*"])
            return Unary(op, inner)
        sel = self._vector_selector()
        if sel is not None:
            return sel
        raise ParseError("expected expression", self.i)

    def _maybe_subquery(self, node):
        """EXTENSION postfix ``[range:step]`` after a function call,
        aggregate or parenthesized expression.  Step is mandatory (no
        PromQL default-step shorthand — pq has no global step to fall
        back on)."""
        if not self.extensions:
            return node
        self.ws()
        if self.i >= len(self.t) or self.t[self.i] != "[":
            return node
        save = self.i
        self.i += 1
        d = self.regex(_DURATION)
        if d is None or self.peek() != ":":
            self.i = save  # not a subquery — leave for the caller's error
            return node
        self.eat(":")
        s = self.regex(_DURATION)
        if s is None:
            raise ParseError("subquery: expected step duration", self.i)
        self.expect("]", "subquery")
        return Subquery(node, parse_duration_ms(d), parse_duration_ms(s))

    def _number(self) -> float | None:
        save = self.i
        s = self.regex(_NUMBER)
        if s is None:
            return None
        # don't lex "inf"/"nan" when it's actually an identifier like
        # "infinity_total" — the reference's nom double has the same
        # greedy-prefix behavior, but identifiers here would misparse;
        # only guard the word forms:
        j = self.i
        if s[-1].isalpha() and j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "_:"):
            self.i = save
            return None
        return float(s.lower().replace("infinity", "inf"))

    def _function_call(self):
        save = self.i
        self.ws()
        names = FUNC_NAMES + EXT_FUNC_NAMES if self.extensions else FUNC_NAMES
        for name in names:
            if self.t[self.i : self.i + len(name)].lower() == name:
                j = self.i + len(name)
                # must be a call: identifier must end here and '(' must follow
                k = j
                while k < len(self.t) and self.t[k].isspace():
                    k += 1
                if (
                    k < len(self.t)
                    and self.t[k] == "("
                    and not (j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "_:"))
                ):
                    self.i = k + 1
                    args = self._function_args(name)
                    self.expect(")", "function call")
                    return FunctionCall(name, tuple(args))
        self.i = save
        return None

    def _function_args(self, name: str) -> list:
        if name in (
            "avg_over_time",
            "count_over_time",
            "last_over_time",
            "first_over_time",
            "max_over_time",
            "min_over_time",
            "sum_over_time",
            "rate",
            "increase",
            "delta",
            # extension single-expr functions
            "abs",
            "absent",
            "ceil",
            "floor",
            "sqrt",
            "exp",
            "ln",
            "log2",
            "log10",
            "sgn",
            "sort",
            "sort_desc",
            "stddev_over_time",
            "stdvar_over_time",
            "present_over_time",
            "deriv",
            "changes",
            "resets",
            "irate",
            "idelta",
            # trig / conversions / time components / timestamp
            "sin", "cos", "tan", "asin", "acos", "atan",
            "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
            "deg", "rad",
            "minute", "hour", "day_of_week", "day_of_month", "day_of_year",
            "days_in_month", "month", "year", "timestamp",
            "absent_over_time",
        ):
            return [self.expr(None)]
        if name == "label_join":
            # (v, dst, sep, src1, src2, ...) — variadic string tail
            args = [self.expr(None)]
            for _ in range(2):
                self.expect(",", "function call")
                s = self.string_literal()
                if s is None:
                    raise ParseError("label_join: expected string literal", self.i)
                args.append(s)
            while self.eat(","):
                s = self.string_literal()
                if s is None:
                    raise ParseError("label_join: expected string literal", self.i)
                args.append(s)
            return args
        if name == "round":
            # round(v [, to_nearest])
            args: list = [self.expr(None)]
            if self.eat(","):
                n = self._number()
                if n is None:
                    raise ParseError("round: expected number literal", self.i)
                args.append(n)
            return args
        if name in ("histogram_quantile", "quantile_over_time"):
            # (phi, v)
            n = self._number()
            if n is None:
                raise ParseError(f"{name}: expected number literal", self.i)
            self.expect(",", "function call")
            return [n, self.expr(None)]
        if name == "predict_linear":
            # (v, t_seconds)
            args = [self.expr(None)]
            self.expect(",", "function call")
            n = self._number()
            if n is None:
                raise ParseError("predict_linear: expected number literal", self.i)
            args.append(n)
            return args
        if name == "holt_winters":
            # (v, smoothing_factor, trend_factor)
            args = [self.expr(None)]
            for _ in range(2):
                self.expect(",", "function call")
                n = self._number()
                if n is None:
                    raise ParseError("holt_winters: expected number literal", self.i)
                args.append(n)
            return args
        if name == "vector":
            n = self._number()
            if n is None:
                raise ParseError("vector(): expected number literal", self.i)
            return [n]
        if name in ("clamp", "clamp_max", "clamp_min"):
            args: list = [self.expr(None)]
            n_nums = 2 if name == "clamp" else 1
            for _ in range(n_nums):
                self.expect(",", "function call")
                n = self._number()
                if n is None:
                    raise ParseError("expected number literal", self.i)
                args.append(n)
            return args
        if name == "label_replace":
            # (v, dst, replacement, src, regex) — four string args
            # (reference expr.rs:448-454)
            args = [self.expr(None)]
            for _ in range(4):
                self.expect(",", "function call")
                s = self.string_literal()
                if s is None:
                    raise ParseError("label_replace: expected string literal", self.i)
                args.append(s)
            return args
        raise ParseError(f"unknown function {name}", self.i)

    def _aggregate(self):
        save = self.i
        self.ws()
        for op in AGG_OPS:
            if self.t[self.i : self.i + len(op)].lower() == op:
                j = self.i + len(op)
                if j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "_:"):
                    continue  # identifier continues: not this keyword
                self.i = j
                modifier = self._aggregate_modifier()
                self.ws()
                if not self.eat("("):
                    # not an aggregate call after all (e.g. metric named
                    # "min_temp" won't reach here due to boundary check;
                    # bare "sum" with no parens) — backtrack
                    self.i = save
                    return None
                argument = None
                if op in ("topk", "bottomk", "quantile"):
                    argument = self._number()
                    if argument is None:
                        raise ParseError(f"{op}: expected number literal", self.i)
                    self.expect(",", f"{op} operator")
                elif op == "count_values":
                    argument = self.string_literal()
                    if argument is None:
                        raise ParseError("count_values: expected string literal", self.i)
                    self.expect(",", "count_values operator")
                inner = self.expr(None)
                self.expect(")", "aggregate expression")
                if modifier is None:
                    modifier = self._aggregate_modifier()
                return Aggregate(op, inner, modifier, argument)
        self.i = save
        return None

    def _aggregate_modifier(self):
        for kw, kind in (("by", "by"), ("without", "without")):
            save = self.i
            if self._keyword(kw):
                labels = self._grouping_labels()
                if labels is None:
                    raise ParseError("aggregation: expected label list", self.i)
                return (kind, frozenset(labels))
            self.i = save
        return None

    def _vector_selector(self):
        self.ws()
        name = self.regex(_METRIC_ID)
        matchers = self._label_matchers()
        if name is None and matchers is None:
            return None
        if matchers is None:
            matchers = []
        range_ms = None
        subquery: tuple[int, int] | None = None
        self.ws()
        if self.i < len(self.t) and self.t[self.i] == "[":
            self.i += 1
            d = self.regex(_DURATION)
            if d is None:
                raise ParseError("range vector selector: expected duration", self.i)
            if self.extensions and self.peek() == ":":
                # EXTENSION: m[range:step] — subquery over the instant selector
                self.eat(":")
                s = self.regex(_DURATION)
                if s is None:
                    raise ParseError("subquery: expected step duration", self.i)
                subquery = (parse_duration_ms(d), parse_duration_ms(s))
            else:
                range_ms = parse_duration_ms(d)
            self.expect("]", "range vector selector")
        # VectorSelector::new validation (reference ast.rs:396-410):
        # an explicit metric name plus a __name__ matcher is ambiguous;
        # without a name, at least one matcher must NOT match the empty
        # string (else the selector would match everything)
        if name is not None and any(m.label == "__name__" for m in matchers):
            raise ParseError("potentially ambiguous metric name match", self.i)
        if name is None and all(self._matches_empty(m) for m in matchers):
            raise ParseError(
                "vector selector must contain at least one non-empty matcher", self.i
            )
        offset_ms = 0
        if self.extensions:
            save = self.i
            if self._keyword("offset"):
                # EXTENSION: `offset <duration>` (reference TODO at
                # src/query/parser/expr.rs:33).  PromQL also allows a
                # negative offset (look into the "future").
                self.ws()
                neg = self.eat("-")
                d = self.regex(_DURATION)
                if d is None:
                    raise ParseError("offset: expected duration", self.i)
                offset_ms = parse_duration_ms(d) * (-1 if neg else 1)
            else:
                self.i = save
        sel = VectorSelector(name, tuple(matchers), range_ms, offset_ms)
        if subquery is not None:
            return Subquery(sel, subquery[0], subquery[1])
        return sel

    @staticmethod
    def _matches_empty(m) -> bool:
        if m.op == "=":
            return m.value == ""
        if m.op == "!=":
            return m.value != ""
        hit = m.compiled().search("") is not None
        return hit if m.op == "=~" else not hit

    def _label_matchers(self) -> list[LabelMatcher] | None:
        self.ws()
        if self.i >= len(self.t) or self.t[self.i] != "{":
            return None
        self.i += 1
        out: list[LabelMatcher] = []
        while True:
            self.ws()
            if self.eat("}"):
                return out
            label = self.regex(_LABEL_ID)
            if label is None:
                raise ParseError('label matching: expected identifier or "}"', self.i)
            self.ws()
            op = None
            for o in ("=~", "!~", "!=", "="):
                if self.t.startswith(o, self.i):
                    op = o
                    self.i += len(o)
                    break
            if op is None:
                raise ParseError(
                    'label matching: expected one of "=", "!=", "=~", "!~"', self.i
                )
            value = self.string_literal()
            if value is None:
                raise ParseError(
                    "label matching: expected label value as string literal", self.i
                )
            if op in ("=~", "!~"):
                re.compile(f"^(?:{value})$")  # validate now, like the reference
            out.append(LabelMatcher(label, op, value))
            self.ws()
            if self.eat(","):
                continue
            self.expect("}", "label matching")
            return out


def parse_expr(text: str, extensions: bool = False):
    p = _P(text, extensions=extensions)
    e = p.expr(None)
    p.ws()
    if p.i != len(p.t):
        raise ParseError("expected EOF", p.i)
    return e


# --------------------------------------------------------------------------
# Program parsing:  <decoder> | map {...} | select <expr> | <formatter>
# --------------------------------------------------------------------------


def _find_unescaped(s: str, needle: str) -> int:
    armed = False
    for i, c in enumerate(s):
        if not armed and c == "\\":
            armed = True
            continue
        if not armed and c == needle:
            return i
        armed = False
    return -1


_DECODER_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(?::[A-Za-z0-9_]+)?")


def _try_named_decoder(p: _P) -> NamedDecoder | None:
    """Registry decoder by name with optional string-literal args:
    ``csv``, ``csv(";")``, ``nginx:combined`` — the reference's planned
    plugin names (src/program.rs:31-44).  Unknown names leave the
    parser untouched so the caller raises the reference's exact
    unknown-parser error."""
    save = p.i
    name = p.regex(_DECODER_NAME)
    if name is None:
        return None
    from ..registry import decoder_names

    if name not in decoder_names():
        p.i = save
        return None
    args: list[str] = []
    if p.eat("("):
        while True:
            p.ws()
            s = p.string_literal()
            if s is None:
                if not args and p.eat(")"):
                    break
                raise ParseError(f"{name}: expected string literal argument", p.i)
            args.append(s)
            if p.eat(","):
                continue
            p.expect(")", name)
            break
    return NamedDecoder(name, tuple(args))


def parse_program(text: str, extensions: bool = False) -> Program:
    p = _P(text.strip(), extensions=extensions)

    # decoder
    decoder: RegexDecoder | JsonDecoder
    p.ws()
    if p.i < len(p.t) and p.t[p.i] == "/":
        end = _find_unescaped(p.t[p.i + 1 :], "/")
        if end < 0:
            raise ParseError("regex: expected closing '/'", p.i)
        decoder = RegexDecoder(p.t[p.i + 1 : p.i + 1 + end].replace(r"\/", "/"))
        p.i += end + 2
    elif p.eat("json", ci=True):
        decoder = JsonDecoder()
    else:
        decoder = _try_named_decoder(p)
        if decoder is None:
            raise ParseError(
                "a valid pq program must start from a known parser "
                "(supported parsers: regex /.../, json)",
                p.i,
            )

    mapper = None
    query = None
    formatter = None

    def try_pipe() -> bool:
        save = p.i
        if p.eat("|"):
            return True
        p.i = save
        return False

    while try_pipe():
        p.ws()
        if mapper is None and query is None and formatter is None and p.eat("map", ci=True):
            mapper = _parse_mapper_fields(p)
            continue
        if query is None and formatter is None and p.eat("select ", ci=True):
            query = p.expr(None)
            continue
        if formatter is None and p.eat("to_json", ci=True):
            formatter = "to_json"
            continue
        if formatter is None and p.eat("to_promapi", ci=True):
            formatter = "to_promapi"
            continue
        # the reference's planned PromQL formatter (src/program.rs:97-98)
        if formatter is None and p.eat("to_promql", ci=True):
            formatter = "to_promql"
            continue
        raise ParseError("unexpected program stage", p.i)

    p.ws()
    if p.i != len(p.t):
        raise ParseError("program: expected EOF", p.i)
    return Program(decoder, mapper, query, formatter)


def _parse_mapper_fields(p: _P) -> tuple[MapperField, ...]:
    p.ws()
    p.expect("{", "map expression")
    fields: list[MapperField] = []
    while True:
        p.ws()
        if p.eat("}"):
            break
        fields.append(_parse_mapper_field(p))
        p.ws()
        if p.eat(","):
            continue
        p.expect("}", "map expression")
        break

    # validations (src/program.rs:203-250)
    if not fields:
        raise ParseError(
            "map expression must have at least one field definition", p.i
        )
    names = set()
    n_ts = n_pos = n_name = 0
    for f in fields:
        if f.typ == "ts":
            n_ts += 1
        if f.end_name in names:
            raise ParseError(
                f"ambiguous field name in map expression '{f.end_name}'", p.i
            )
        names.add(f.end_name)
        if f.typ != "const":
            if isinstance(f.loc, int):
                n_pos += 1
            else:
                n_name += 1
    if n_ts > 1:
        raise ParseError(
            "map expression cannot have more than one timestamp field definition",
            p.i,
        )
    if n_pos and n_name:
        raise ParseError(
            "all field definition must be either position-based or name-based", p.i
        )
    return tuple(fields)


def _parse_mapper_field(p: _P) -> MapperField:
    p.ws()
    if p.t[p.i] == ".":
        p.i += 1
        m = re.compile(r"\d+").match(p.t, p.i)
        if m:
            loc: int | str = int(m.group(0))
            p.i = m.end()
        else:
            name = p.regex(_LABEL_ID)
            if name is None:
                raise ParseError(
                    "map expression: expected field position or name", p.i
                )
            loc = name
        typ = "auto"
        ts_format = None
        save = p.i
        if p.eat(":"):
            p.ws()
            if p.eat("str", ci=True):
                typ = "str"
            elif p.eat("num", ci=True):
                typ = "num"
            elif p.eat("ts", ci=True):
                typ = "ts"
                ts_format = p.string_literal()
            else:
                raise ParseError("map expression: expected type (str, num, or ts)", p.i)
        else:
            p.i = save
        alias = None
        save = p.i
        if p.eat("as ", ci=True):
            alias = p.regex(_LABEL_ID)
            if alias is None:
                raise ParseError("map expression: expected alias", p.i)
        else:
            p.i = save
        return MapperField(loc, typ, ts_format, None, alias)

    # const label field:  name: "value"
    name = p.regex(_LABEL_ID)
    if name is None:
        raise ParseError("map expression: expected field definition", p.i)
    p.expect(":", "map expression")
    value = p.string_literal()
    if value is None:
        raise ParseError("map expression: expected string literal", p.i)
    return MapperField(name, "const", None, value, None)

"""Parser unit tests — grammar cases derived from the reference's
co-located tests (src/query/parser/expr.rs:555-798,
src/query/parser/vector.rs:131-397, src/program.rs:430-480)."""

import pytest

from pq_ray.query.ast import (
    Aggregate,
    Binary,
    FunctionCall,
    JsonDecoder,
    NumberLiteral,
    Parentheses,
    RegexDecoder,
    Unary,
    VectorSelector,
)
from pq_ray.query.parser import ParseError, parse_expr, parse_program


def test_precedence_left_assoc():
    e = parse_expr("1 - 2 - 3")
    assert isinstance(e, Binary) and e.op == "-"
    assert isinstance(e.lhs, Binary) and e.lhs.op == "-"
    assert e.lhs.lhs == NumberLiteral(1.0)


def test_pow_binds_tighter_than_mul():
    e = parse_expr("2 * 3 ^ 4")
    assert e.op == "*"
    assert isinstance(e.rhs, Binary) and e.rhs.op == "^"


def test_unary_binds_at_mul_level():
    # -age * 2^3 == (-age) * (2^3)  (reference: expr_unary parses its
    # operand with min precedence = Mul)
    e = parse_expr("-age * 2^3")
    assert e.op == "*"
    assert isinstance(e.lhs, Unary)
    assert isinstance(e.rhs, Binary) and e.rhs.op == "^"


def test_negative_literal_is_a_literal():
    # nom's double lexes "-2" before unary is tried
    e = parse_expr("1 - -2")
    assert e.op == "-" and e.rhs == NumberLiteral(-2.0)


def test_number_forms():
    assert parse_expr("1.") == NumberLiteral(1.0)
    assert parse_expr(".1") == NumberLiteral(0.1)
    assert parse_expr("2e-5") == NumberLiteral(2e-5)
    assert parse_expr("+Inf") == NumberLiteral(float("inf"))
    assert parse_expr("-Inf") == NumberLiteral(float("-inf"))


def test_selector_with_matchers_and_range():
    e = parse_expr('metric{l1=~"v.*", l2!="x"}[5m]')
    assert isinstance(e, VectorSelector)
    assert e.name == "metric" and e.range_ms == 300_000
    assert [m.op for m in e.matchers] == ["=~", "!="]
    # auto __name__ matcher added
    assert e.all_matchers()[0].label == "__name__"


def test_selector_matcher_only():
    e = parse_expr('{job="nginx"}')
    assert isinstance(e, VectorSelector) and e.name is None


def test_aggregate_modifier_prefix_and_suffix():
    a = parse_expr("sum by(a, b) (m)")
    b = parse_expr("sum(m) by(a, b)")
    assert isinstance(a, Aggregate) and a.modifier == b.modifier
    assert a.modifier[0] == "by" and a.modifier[1] == frozenset({"a", "b"})


def test_topk_argument():
    e = parse_expr("topk(3, m) by(x)")
    assert e.op == "topk" and e.argument == 3.0


def test_bool_and_matching_modifiers():
    e = parse_expr('a > bool b')
    assert e.bool_modifier
    e = parse_expr('a + on(x, y) b')
    assert e.matching == ("on", frozenset({"x", "y"}))
    e = parse_expr('a + ignoring(z) group_left b')
    assert e.matching == ("ignoring", frozenset({"z"}))
    assert e.grouping == ("left", ())


def test_function_calls():
    e = parse_expr("count_over_time(m[1s])")
    assert isinstance(e, FunctionCall)
    (arg,) = e.args
    assert isinstance(arg, VectorSelector) and arg.range_ms == 1000


def test_keyword_prefix_metric_names():
    # metric names that merely *start* with keywords still parse as
    # selectors (boundary check — saner than the reference's nom alt)
    e = parse_expr("summary")
    assert isinstance(e, VectorSelector) and e.name == "summary"
    e = parse_expr("counter{}")
    assert e.name == "counter"


def test_parse_errors():
    for bad in ["", "sum(", "m{l=}", "m[", "m[5]", "1 +", "m{l='x'}"]:
        with pytest.raises(ParseError):
            parse_expr(bad)


def test_program_grammar():
    p = parse_program('json | map {.foo:str as bar, c: "v"} | select sum(bar) | to_json')
    assert isinstance(p.decoder, JsonDecoder)
    assert p.mapper[1].typ == "const" and p.mapper[1].const_value == "v"
    assert p.formatter == "to_json"
    p = parse_program(r"/a\/b/")
    assert isinstance(p.decoder, RegexDecoder) and p.decoder.regex == "a/b"


def test_program_validations():
    with pytest.raises(ParseError):  # two timestamp fields
        parse_program('json | map {.a:ts, .b:ts}')
    with pytest.raises(ParseError):  # ambiguous end names
        parse_program('json | map {.a as x, .b as x}')
    with pytest.raises(ParseError):  # mixed positional and named
        parse_program('json | map {.0, .foo}')
    with pytest.raises(ParseError):  # unknown decoder
        parse_program('csv | map {.0}')


def test_parentheses():
    e = parse_expr("(1 + 2) * 3")
    assert e.op == "*" and isinstance(e.lhs, Parentheses)


def test_selector_validation_reference_vectors():
    """The reference's VectorSelector::new validation cases
    (src/query/parser/vector.rs:136-192, ast.rs:396-410) verbatim."""
    valid = [
        'foo', 'foo[1h5m]', 'foo{}', 'foo {}', 'foo {}[5ms]',
        'foo {}  [1m3s]', 'foo  {   }', '{__name__="foo"}',
        '{__name__=~"foo"}', '{__name__=~"foo",__name__=~"bar"}',
        'foo{name=~"bar"}',
    ]
    for q in valid:
        parse_expr(q)  # must not raise
    invalid = [
        '{}', '{foo=""}', '{foo=~".*"}', '{foo!~".+"}', '{foo!="bar"}',
        'foo{__name__="foo"}', 'foo{__name__="bar"}',
    ]
    for q in invalid:
        with pytest.raises(ParseError):
            parse_expr(q)
    # but the mirrored non-empty forms are fine
    parse_expr('{foo="bar"}')
    parse_expr('{foo=~".+"}')
    parse_expr('{foo!~".*"}')

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
    with pytest.raises(ParseError):  # unknown decoder (csv/logfmt/redis/...
        parse_program('kafka | map {.0}')  # are now registered extensions)


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


def test_reference_expression_vectors():
    """Every input from the reference's parser unit tests parses
    (src/query/parser/expr.rs:560-797, src/program.rs:435-458)."""
    from pq_ray.query.ast import Binary, Parentheses, Unary
    from pq_ray.query.parser import parse_program

    valid_exprs = [
        "foo{}", "-foo{}", "- foo{}", "+foo{}", "+  foo{}",
        "foo and bar", "foo unless bar", "foo or bar",
        "sum(foo)", "sum(foo) by(job)", "bar{} + sum(foo) by(job)",
        "avg(foo) without(job,instanse)", "sum by(job) (foo)",
        "avg without(job,instanse) (foo)",
        "124 % avg without(job,instanse) (foo)",
        "quantile(0.95, foo)", "topk(3, foo)", "bottomk(1.0, foo)",
        "(foo)", "(1 + 2) * 3",
        'vector(3) + count_over_time(clamp(foo{qux!~"42"}, -100, 100500))',
        "1 >  bool 1", "1 == bool 1", "1 < bool 2 - 1 * 2",
        "foo != bool 1", "foo != bool bar",
        "foo * on() bar", "foo % ignoring() bar", "foo + on(abc) bar",
        "foo != on(abc,def) bar", "foo > on(abc,def,) bar",
        "foo - on(abc) bar / on(qux, lol) baz",
        "foo * on(test) group_left bar",
        "foo * on(test,blub) group_left() bar",
        "foo + ignoring(abc) group_right (qux) bar",
        "foo + ignoring(abc) group_right(def,qux,) bar",
    ]
    for q in valid_exprs:
        parse_expr(q)

    def ops(e):
        if isinstance(e, Binary):
            return ops(e.lhs) + ops(e.rhs) + [e.op]
        if isinstance(e, (Unary, Parentheses)):
            return ops(e.expr)
        return []

    precedence = [
        ("42 + bar", ["+"]),
        ("42.42 + bar % 9000", ["%", "+"]),
        ("-42.42 + -bar % 9000", ["%", "+"]),
        ("foo + bar - baz", ["+", "-"]),
        ("foo + bar * baz", ["*", "+"]),
        ("foo * bar + baz", ["*", "+"]),
        ("foo * bar ^ baz", ["^", "*"]),
        ("foo * bar ^ baz - qux / abc", ["^", "*", "/", "-"]),
    ]
    for q, expected in precedence:
        assert ops(parse_expr(q)) == expected, q

    valid_programs = [
        r"//", r"/foo/", r"/foo\/bar/", r"/.*(\\d+)foo\\s(\\w+).+/",
        "json", "json | to_json", "json| to_json", "json |to_json",
        "json|to_json", "json | to_promapi",
        r"/.*(\\d+)foo\\s(\\w+).+/ | to_json",
        r'/.*(\\d+)foo\\s(\\w+).+/ | map {foo: "bar"} | to_json',
        r'/.*(\\d+)foo\\s(\\w+).+/ | map {.0:str, .1:num as qux, .2:ts "%Y-%m-%d", foo: "bar"} | to_json',
        r'/.*(\\d+)foo\\s(\\w+).+/ | map {.foo:str as bar, .qux:num, .ts:ts "%Y-%m-%d", abc: "42"} | to_json',
        r'/.*(\\d+)foo\\s(\\w+).+/ | map {.foo:str as bar, .qux:num, .ts:ts "%Y-%m-%d", abc: "42"} | select {__name__=~"abc|foo"} / 9001 | to_json',
    ]
    for p in valid_programs:
        parse_program(p)

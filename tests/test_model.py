import math

import pytest

from pq_ray.model import (
    parse_duration_ms,
    parse_number,
    parse_time_ms,
    rust_f64_str,
    signature,
    try_parse_time_ms,
)


def test_signature_matches_reference_layout():
    # reference src/model/labels.rs:51-57: sorted pairs, name \xFF value, no
    # separator between pairs
    assert signature({"b": "2", "a": "1"}) == b"a\xff1b\xff2"
    assert signature({}) == b""
    # __name__ sorts first (underscores < letters in byte order)
    s = signature({"__name__": "age", "name": "bob"})
    assert s == b"__name__\xffagename\xffbob"


def test_signature_ordering_is_bytewise():
    # BTreeMap iteration order == sorted-bytes order of the signature
    sigs = [signature({"name": n}) for n in ["sarah", "bob", "al"]]
    assert sorted(sigs) == [
        signature({"name": "al"}),
        signature({"name": "bob"}),
        signature({"name": "sarah"}),
    ]


@pytest.mark.parametrize(
    "v,s",
    [
        (67.0, "67"),
        (-159.0, "-159"),
        (0.0, "0"),
        (1.0, "1"),
        (-0.0, "-0"),
        (0.5, "0.5"),
        (0.1, "0.1"),
        (1e21, "1000000000000000000000"),
        (1e-7, "0.0000001"),
        (1234.5678, "1234.5678"),
        (float("inf"), "inf"),
        (float("-inf"), "-inf"),
        (float("nan"), "NaN"),
        (2.0**53, "9007199254740992"),
        (1 / 3, "0.3333333333333333"),
    ],
)
def test_rust_f64_str(v, s):
    assert rust_f64_str(v) == s


def test_parse_duration():
    assert parse_duration_ms("1s") == 1000
    assert parse_duration_ms("3s") == 3000
    assert parse_duration_ms("1h30m15s5ms") == 3600_000 + 30 * 60_000 + 15_000 + 5
    assert parse_duration_ms("1y1w1d") == 31_536_000_000 + 604_800_000 + 86_400_000
    for bad in ["", "1", "s", "1s1h", "1s1s", "0s", "1.5s"]:
        with pytest.raises(Exception):
            parse_duration_ms(bad)


def test_try_parse_time_reference_vectors():
    # the reference's own test table (src/utils/time.rs:96-109)
    vectors = [
        ("2021-01-01 00:00:00", 1609459200000),
        ("2021-01-01 00:00:00.00", 1609459200000),
        ("2021-01-01 00:00:00.00000", 1609459200000),
        ("2021-01-01T00:00:00.00000", 1609459200000),
        ("2021-01-01 01:00:00.00000 +0100", 1609459200000),
        ("2020-12-31 14:30:00.00000 -0930", 1609459200000),
        ("2021-01-01T00:00:00+00:00", 1609459200000),
        ("Fri, 1 Jan 2021 00:00:00 +0000", 1609459200000),
        ("01/Jan/2021:00:00:00 -0000", 1609459200000),
        ("1609459200", 1609459200000),
        ("1609459200100", 1609459200100),
    ]
    for text, expected in vectors:
        assert try_parse_time_ms(text) == expected, text


def test_parse_time_explicit_format():
    assert parse_time_ms("2021-01-01T23:59:58", "%Y-%m-%dT%H:%M:%S") == 1609545598000
    assert (
        parse_time_ms("07/Jun/2021:03:39:03", "%d/%b/%Y:%H:%M:%S") == 1623037143000
    )


def test_parse_number():
    assert parse_number("42") == 42.0
    assert parse_number("-1.5e3") == -1500.0
    assert parse_number("inf") == math.inf
    assert math.isnan(parse_number("NaN"))
    assert parse_number("bob") is None
    assert parse_number("") is None
    assert parse_number("12abc") is None
    assert parse_number(" 42") is None  # Rust parse rejects surrounding space


def test_reference_number_duration_vectors():
    """The reference's number/duration unit-test vectors verbatim
    (src/utils/parse/number.rs:16-37, duration.rs:146-188)."""
    import math

    from pq_ray.query.parser import parse_expr

    def numval(e):
        if hasattr(e, "value"):
            return e.value
        return -e.expr.value if e.op == "-" else e.expr.value

    for s, exp in [("1", 1.0), ("1.", 1.0), (".1", 0.1), ("2e-5", 2e-5),
                   ("Inf", math.inf), ("+Inf", math.inf), ("-Inf", -math.inf)]:
        assert numval(parse_expr(s)) == exp, s

    YEAR, WEEK, DAY = 365 * 86_400_000, 7 * 86_400_000, 86_400_000
    for s, exp in [("1ms", 1), ("10s", 10_000), ("0s500ms", 500),
                   ("5s999ms", 5999),
                   ("1y2w3d4h5m6s7ms",
                    YEAR + 2 * WEEK + 3 * DAY + 4 * 3_600_000 + 5 * 60_000 + 6_000 + 7)]:
        assert parse_duration_ms(s) == exp, s

    for s in ["foo", "0", "0ms", "1ns", "0s0ms", "10m2h"]:
        with pytest.raises(Exception):
            parse_duration_ms(s)
